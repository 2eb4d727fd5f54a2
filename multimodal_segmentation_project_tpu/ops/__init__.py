from multimodal_segmentation_project_tpu.ops.losses import (
    cross_entropy_loss,
    soft_dice_loss,
    combined_loss,
    tversky_loss,
    combined_ce_tversky_loss,
    distillation_loss,
    get_loss_fn,
)
from multimodal_segmentation_project_tpu.ops.metrics import (
    calculate_dice,
    calculate_iou,
    calculate_accuracy,
    per_class_dice_iou,
    segmentation_metrics,
)
from multimodal_segmentation_project_tpu.ops.grl import grad_reverse

__all__ = [
    "cross_entropy_loss",
    "soft_dice_loss",
    "combined_loss",
    "tversky_loss",
    "combined_ce_tversky_loss",
    "distillation_loss",
    "get_loss_fn",
    "calculate_dice",
    "calculate_iou",
    "calculate_accuracy",
    "per_class_dice_iou",
    "segmentation_metrics",
    "grad_reverse",
]
