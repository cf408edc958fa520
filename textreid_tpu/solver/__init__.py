from .build import bias_mask, freeze_mask, make_lr_schedule, make_optimizer

__all__ = ["make_optimizer", "make_lr_schedule", "bias_mask", "freeze_mask"]
