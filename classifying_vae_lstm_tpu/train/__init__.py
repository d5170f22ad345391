from .callbacks import AnnealSchedule, EarlyStoppingAfterEpoch
from .checkpoint import load_checkpoint, save_checkpoint, save_model_in_pieces
from .loop import Trainer, fit

__all__ = [
    "AnnealSchedule",
    "EarlyStoppingAfterEpoch",
    "Trainer",
    "fit",
    "load_checkpoint",
    "save_checkpoint",
    "save_model_in_pieces",
]
