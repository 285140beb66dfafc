from demfi_tpu.train.loop import (
    TrainState,
    create_train_state,
    demfi_loss,
    make_train_step,
    train_batch_specs,
)

__all__ = ["TrainState", "create_train_state", "demfi_loss",
           "make_train_step", "train_batch_specs"]
