from demfi_tpu.models.demfi import (
    DeMFINet,
    DeMFIOutputs,
    make_model,
)

__all__ = ["DeMFINet", "DeMFIOutputs", "make_model"]
