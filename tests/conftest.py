"""Test harness: force CPU backend with 8 virtual devices.

The distributed tests exercise the real sharded code path on a virtual
8-device CPU mesh (SURVEY.md section 4: the "multi-node without a cluster"
strategy); everything numerical runs in f64 on CPU where it is exact.

Must run before any JAX backend is initialized: XLA_FLAGS is read at CPU
client creation, and the axon TPU plugin (registered by sitecustomize) is
overridden by re-pinning jax_platforms to cpu.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import meshlessmultigridpoisson_tpu  # noqa: E402,F401  (enables x64)
