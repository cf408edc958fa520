from .datasets import (
    ConcatDataset,
    CUHKPEDESDataset,
    ICFGPEDESDataset,
    make_synthetic_dataset,
)
from .loader import DataLoader, build_dataset, make_data_loader
from .sampler import TripletSampler
from .transforms import Transform, build_transforms

__all__ = [
    "CUHKPEDESDataset",
    "ICFGPEDESDataset",
    "ConcatDataset",
    "make_synthetic_dataset",
    "DataLoader",
    "build_dataset",
    "make_data_loader",
    "TripletSampler",
    "Transform",
    "build_transforms",
]
