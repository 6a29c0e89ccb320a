from meshlessmultigridpoisson_tpu.utils.jaxutils import (
    cpu_device,
    on_cpu,
    to_device_tree,
)

__all__ = ["cpu_device", "on_cpu", "to_device_tree"]
