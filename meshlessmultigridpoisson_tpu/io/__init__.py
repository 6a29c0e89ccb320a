from meshlessmultigridpoisson_tpu.io.bundle import (
    save_bundle,
    load_bundle,
    save_state,
    load_state,
)

__all__ = ["save_bundle", "load_bundle", "save_state", "load_state"]
