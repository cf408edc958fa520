from .inference import compute_embeddings, inference
from .state import TrainState, create_train_state
from .steps import encode_step, make_train_step
from .trainer import do_train

__all__ = [
    "TrainState",
    "create_train_state",
    "encode_step",
    "make_train_step",
    "do_train",
    "inference",
    "compute_embeddings",
]
