"""Harness for running the ACTUAL reference torch code as a parity oracle.

Real CUHK-PEDES data and the released checkpoints are not available in this
environment (zero egress), so — per the round-1 verdict's fallback — the
strongest possible parity evidence is to run `/root/reference`'s own torch
code on a synthetic dataset and diff full pipelines against ours.

The reference imports two packages absent from this image, plus assumes CUDA:

* ``yacs``       -> shimmed with our yacs-compatible ``ConfigNode``
                    (textreid_tpu/config/node.py), which doubles as a
                    compatibility test of our config system;
* ``torchvision``-> shimmed with PIL+torch re-implementations of exactly the
                    transforms `lib/data/transforms.py` uses;
* ``.cuda()``    -> monkeypatched to a no-op so the modules run on CPU
                    (gru.py:34, losses.py:36,215, moco_head/head.py:154).

Nothing from the reference is copied; it is *imported* (read-only) and
executed as a test oracle.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# torchvision shim: the subset lib/data/transforms.py constructs
# ---------------------------------------------------------------------------

def _build_torchvision_shim():
    import numpy as np
    import torch
    from PIL import Image

    tv = types.ModuleType("torchvision")
    T = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, img):
            for t in self.transforms:
                img = t(img)
            return img

    class Resize:
        def __init__(self, size):
            self.size = size  # (h, w)

        def __call__(self, img):
            h, w = self.size
            return img.resize((w, h), Image.BILINEAR)

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, dtype=np.float32) / 255.0
            return torch.from_numpy(arr).permute(2, 0, 1).contiguous()

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean, dtype=torch.float32).view(-1, 1, 1)
            self.std = torch.tensor(std, dtype=torch.float32).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class RandomHorizontalFlip:
        def __init__(self, p=0.5):
            self.p = p

        def __call__(self, img):
            if torch.rand(1).item() < self.p:
                return img.transpose(Image.FLIP_LEFT_RIGHT)
            return img

    class Pad:
        def __init__(self, padding, fill=0):
            self.padding = padding
            self.fill = fill

        def __call__(self, img):
            p = self.padding
            out = Image.new("RGB", (img.width + 2 * p, img.height + 2 * p),
                            (self.fill,) * 3)
            out.paste(img, (p, p))
            return out

    class RandomCrop:
        def __init__(self, size):
            self.size = size  # (h, w)

        def __call__(self, img):
            h, w = self.size
            top = int(torch.randint(0, img.height - h + 1, (1,)).item())
            left = int(torch.randint(0, img.width - w + 1, (1,)).item())
            return img.crop((left, top, left + w, top + h))

    class RandomErasing:
        def __init__(self, p=0.5, scale=(0.02, 0.33), ratio=(0.3, 3.3),
                     value=0):
            self.p, self.scale, self.ratio, self.value = p, scale, ratio, value

        def __call__(self, t):
            import math

            if torch.rand(1).item() >= self.p:
                return t
            _, h, w = t.shape
            area = h * w
            log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
            for _ in range(10):
                erase_area = area * float(
                    torch.empty(1).uniform_(*self.scale).item())
                aspect = math.exp(
                    float(torch.empty(1).uniform_(*log_ratio).item()))
                eh = int(round(math.sqrt(erase_area * aspect)))
                ew = int(round(math.sqrt(erase_area / aspect)))
                if 0 < eh < h and 0 < ew < w:
                    top = int(torch.randint(0, h - eh + 1, (1,)).item())
                    left = int(torch.randint(0, w - ew + 1, (1,)).item())
                    val = torch.tensor(self.value, dtype=t.dtype).view(-1, 1, 1)
                    t[:, top:top + eh, left:left + ew] = val
                    return t
            return t

    for cls in (Compose, Resize, ToTensor, Normalize, RandomHorizontalFlip,
                Pad, RandomCrop, RandomErasing):
        setattr(T, cls.__name__, cls)
    tv.transforms = T
    return tv, T


def install_reference_shims():
    """Make `/root/reference/lib` importable on this image. Idempotent."""
    sys.dont_write_bytecode = True  # /root/reference is read-only

    if "yacs" not in sys.modules:
        from textreid_tpu.config.node import ConfigNode

        yacs = types.ModuleType("yacs")
        yacs_config = types.ModuleType("yacs.config")
        yacs_config.CfgNode = ConfigNode
        yacs.config = yacs_config
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_config

    if "torchvision" not in sys.modules:
        tv, T = _build_torchvision_shim()
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = T

    import torch

    if not getattr(torch.Tensor.cuda, "_oracle_noop", False):
        def _cuda_noop(self, *args, **kwargs):
            return self

        _cuda_noop._oracle_noop = True
        torch.Tensor.cuda = _cuda_noop

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def make_fake_clip_rn50(path, seed: int = 0):
    """Write a CLIP-jit-archive lookalike: a traced torch module whose
    state_dict carries ``visual.*`` ModifiedResNet keys with a square 7x7
    attnpool grid, loadable by both the reference's ``torch.jit.load`` path
    (m_resnet.py:252-266) and our ``load_clip_visual`` converter."""
    import os

    import torch

    install_reference_shims()
    from lib.models.backbones.m_resnet import ModifiedResNet

    torch.manual_seed(seed)
    visual = ModifiedResNet(
        layers=[3, 4, 6, 3], output_dim=1024, heads=32, last_stride=2,
        input_resolution=(224, 224),
    ).eval()

    class Clip(torch.nn.Module):
        def __init__(self, visual):
            super().__init__()
            self.visual = visual

        def forward(self, x):
            return self.visual(x)

    wrapper = Clip(visual).eval()
    example = torch.zeros(1, 3, 224, 224)
    with torch.no_grad():
        traced = torch.jit.trace(wrapper, example)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    traced.save(path)
    return path


def build_reference_model(cfg_ours):
    """Build the reference ``Model`` from our ConfigNode (schema-compatible
    by construction). Returns the torch module in train mode on CPU."""
    install_reference_shims()
    import torch

    from lib.models.model import build_model as ref_build_model

    torch.manual_seed(0)
    return ref_build_model(cfg_ours)


def reference_caption_batch(token_rows, max_length):
    """token id lists -> list[Caption], the reference model's text input
    (cuhkpedes.py:42-45 construction)."""
    install_reference_shims()
    import torch

    from lib.utils.caption import Caption

    captions = []
    for row in token_rows:
        t = torch.tensor(list(row), dtype=torch.int64)
        captions.append(Caption([t], max_length=max_length, padded=False))
    return captions
