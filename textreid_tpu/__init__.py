"""textreid_tpu — a TPU-native text-based person re-identification framework.

Built from scratch in JAX/Flax/optax/orbax with Pallas kernels for the hot
paths, providing the full capabilities of BrandonHanx/TextReID (BMVC 2021):
CLIP RN50/RN101 + bi-GRU two-tower retrieval with simple and cross-modal
MoCo embedding heads on CUHK-PEDES.
"""

__version__ = "0.1.0"

from .config import DatasetCatalog, get_default_cfg  # noqa: F401

__all__ = ["DatasetCatalog", "get_default_cfg"]
