from demfi_tpu.data.datasets import (
    get_test_data,
    AdobeTrainDataset,
    EvalDataset,
    CustomDataset,
    build_train_index,
    build_eval_index,
    build_custom_index,
)
from demfi_tpu.data.pipeline import TrainLoader, iter_eval

__all__ = [
    "AdobeTrainDataset",
    "EvalDataset",
    "CustomDataset",
    "build_train_index",
    "build_eval_index",
    "build_custom_index",
    "get_test_data",
    "TrainLoader",
    "iter_eval",
]
