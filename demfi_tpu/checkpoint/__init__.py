from demfi_tpu.checkpoint.convert import (
    convert_torch_state_dict,
    flax_to_torch_state_dict,
    load_pt_checkpoint,
)
from demfi_tpu.checkpoint.manager import ExperimentManager

__all__ = [
    "convert_torch_state_dict",
    "flax_to_torch_state_dict",
    "load_pt_checkpoint",
    "ExperimentManager",
]
