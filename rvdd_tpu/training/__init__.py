"""Training: optimizer/schedule, checkpoints, sharded train step, loops."""

from rvdd_tpu.training.train_state import (
    TrainState,
    create_train_state,
    lr_for_epoch,
    make_train_step,
)
from rvdd_tpu.training.checkpoints import (
    save_checkpoint,
    load_checkpoint,
    save_status,
    load_status,
)
