from ess_tpu.train.losses import (
    cross_entropy_loss,
    dice_loss,
    l1_loss,
    symmetric_js_divergence,
    task_loss,
)
from ess_tpu.train.metrics import (
    MetricsSemseg,
    confusion_matrix,
    confusion_to_accuracy,
    confusion_to_iou,
)

__all__ = [
    "cross_entropy_loss",
    "dice_loss",
    "l1_loss",
    "symmetric_js_divergence",
    "task_loss",
    "MetricsSemseg",
    "confusion_matrix",
    "confusion_to_accuracy",
    "confusion_to_iou",
]
