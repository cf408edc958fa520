from .checkpoint import Checkpointer
from .logger import makedir, setup_logger
from .meters import MetricLogger, SmoothedValue, TensorboardLogger
from .vocab import load_vocab_dict

__all__ = [
    "Checkpointer",
    "setup_logger",
    "makedir",
    "MetricLogger",
    "SmoothedValue",
    "TensorboardLogger",
    "load_vocab_dict",
]
