"""Training: config, train state + checkpointing, jitted steps, metrics."""
from ndtpu.train.config import TrainConfig  # noqa: F401
from ndtpu.train.state import TrainState, create_train_state, save_checkpoint, restore_checkpoint  # noqa: F401
from ndtpu.train.loop import (  # noqa: F401
    cross_entropy_loss,
    make_lr_schedule,
    make_ndt_seg_step,
    make_pointnet_seg_step,
    make_classification_step,
)
