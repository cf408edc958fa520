"""Image transform pipeline.

Replicates the reference's torchvision chain
(`/root/reference/lib/data/transforms.py:4-43`) with PIL + numpy, producing
HWC float32 (the TPU-native layout — the models consume NHWC directly, no
CHW transpose):

* train+aug:  Resize -> HFlip(0.5) -> Pad(10) -> RandomCrop -> scale to [0,1]
  -> Normalize -> RandomErasing(p=0.5, scale=(0.02,0.4), value=pixel_mean)
* train no-aug: Resize -> HFlip(0.5) -> scale -> Normalize
* eval:       Resize -> scale -> Normalize

RandomErasing keeps torchvision's quirk of filling the *normalized* image
with the raw pixel-mean values (transforms.py:24).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from PIL import Image


class Transform:
    def __init__(
        self,
        height: int,
        width: int,
        pixel_mean,
        pixel_std,
        is_train: bool,
        use_aug: bool,
        padding: int = 10,
        erase_prob: float = 0.5,
        erase_scale: Tuple[float, float] = (0.02, 0.4),
        erase_ratio: Tuple[float, float] = (0.3, 10 / 3),
        rng: Optional[np.random.RandomState] = None,
    ):
        self.height = height
        self.width = width
        self.mean = np.asarray(pixel_mean, dtype=np.float32)
        self.std = np.asarray(pixel_std, dtype=np.float32)
        self.is_train = is_train
        self.use_aug = use_aug
        self.padding = padding
        self.erase_prob = erase_prob
        self.erase_scale = erase_scale
        self.erase_ratio = erase_ratio
        self.rng = rng or np.random.RandomState(0)

    def seed(self, seed: int) -> None:
        self.rng = np.random.RandomState(seed)

    def __call__(self, img: Image.Image) -> np.ndarray:
        img = img.resize((self.width, self.height), Image.BILINEAR)

        if self.is_train:
            if self.rng.rand() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
            if self.use_aug:
                img = self._pad_and_crop(img)

        arr = np.asarray(img, dtype=np.float32) / 255.0
        arr = (arr - self.mean) / self.std

        if self.is_train and self.use_aug:
            arr = self._random_erase(arr)
        return arr

    def _pad_and_crop(self, img: Image.Image) -> Image.Image:
        p = self.padding
        padded = Image.new("RGB", (img.width + 2 * p, img.height + 2 * p), (0, 0, 0))
        padded.paste(img, (p, p))
        left = int(self.rng.randint(0, 2 * p + 1))
        top = int(self.rng.randint(0, 2 * p + 1))
        return padded.crop((left, top, left + self.width, top + self.height))

    def _random_erase(self, arr: np.ndarray) -> np.ndarray:
        if self.rng.rand() >= self.erase_prob:
            return arr
        h, w = arr.shape[:2]
        area = h * w
        log_ratio = (math.log(self.erase_ratio[0]), math.log(self.erase_ratio[1]))
        for _ in range(10):
            erase_area = area * self.rng.uniform(*self.erase_scale)
            aspect = math.exp(self.rng.uniform(*log_ratio))
            eh = int(round(math.sqrt(erase_area * aspect)))
            ew = int(round(math.sqrt(erase_area / aspect)))
            if eh < h and ew < w and eh > 0 and ew > 0:
                top = int(self.rng.randint(0, h - eh + 1))
                left = int(self.rng.randint(0, w - ew + 1))
                arr[top : top + eh, left : left + ew] = self.mean
                return arr
        return arr


def build_transforms(cfg, is_train: bool = True, rng=None) -> Transform:
    """Mirrors reference transforms.py:4-43."""
    return Transform(
        height=cfg.INPUT.HEIGHT,
        width=cfg.INPUT.WIDTH,
        pixel_mean=cfg.INPUT.PIXEL_MEAN,
        pixel_std=cfg.INPUT.PIXEL_STD,
        is_train=is_train,
        use_aug=cfg.INPUT.USE_AUG,
        padding=cfg.INPUT.PADDING,
        rng=rng,
    )
