from .metrics import calc_f1, calc_accuracy, roc_auc_ovr, binary_auc
from .loop import Trainer
from .checkpoint import save_checkpoint, load_checkpoint, TopKCheckpoints

__all__ = [
    "calc_f1",
    "calc_accuracy",
    "roc_auc_ovr",
    "binary_auc",
    "Trainer",
    "save_checkpoint",
    "load_checkpoint",
    "TopKCheckpoints",
]
