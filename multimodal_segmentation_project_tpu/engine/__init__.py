from multimodal_segmentation_project_tpu.engine.state import (
    TrainState,
    create_train_state,
    make_optimizer,
    freeze_mask,
)
from multimodal_segmentation_project_tpu.engine.schedule import ReduceLROnPlateau
from multimodal_segmentation_project_tpu.engine.steps import (
    make_train_step,
    make_eval_step,
    make_sharded_eval_step,
    make_distill_step,
    make_dann_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "freeze_mask",
    "ReduceLROnPlateau",
    "make_train_step",
    "make_eval_step",
    "make_sharded_eval_step",
    "make_distill_step",
    "make_dann_step",
]
