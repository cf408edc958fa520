"""Standard (torchvision-style) ResNet visual encoder in Flax/NHWC.

Counterpart of the reference torchvision backbone
(`/root/reference/lib/models/backbones/resnet.py`): BasicBlock/Bottleneck
residual stages (resnet.py:22-98,101-167), configurable res5 stride and
dilation (resnet.py:121-123), global average-pool output
(resnet.py:130,165), and the resnet18..resnet152 registry
(resnet.py:186-212).  ImageNet weight loading is handled by the weight
converter rather than the model.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

ARCH_LAYERS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


def _norm(train, dtype, name):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=dtype, name=name,
    )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        inplanes = x.shape[-1]
        d = self.dilation
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride,) * 2,
            padding=[(d, d)] * 2, kernel_dilation=(d, d), use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        out = nn.relu(_norm(train, self.dtype, "bn1")(out))
        out = nn.Conv(
            self.planes, (3, 3), padding=[(d, d)] * 2, kernel_dilation=(d, d),
            use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = _norm(train, self.dtype, "bn2")(out)

        identity = x
        if self.stride != 1 or inplanes != self.planes * self.expansion:
            identity = nn.Conv(
                self.planes * self.expansion, (1, 1), strides=(self.stride,) * 2,
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = _norm(train, self.dtype, "downsample_bn")(identity)
        return nn.relu(out + identity)


class TorchBottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        inplanes = x.shape[-1]
        d = self.dilation
        out = nn.Conv(
            self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        out = nn.relu(_norm(train, self.dtype, "bn1")(out))
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride,) * 2,
            padding=[(d, d)] * 2, kernel_dilation=(d, d), use_bias=False,
            dtype=self.dtype, name="conv2",
        )(out)
        out = nn.relu(_norm(train, self.dtype, "bn2")(out))
        out = nn.Conv(
            self.planes * self.expansion, (1, 1), use_bias=False,
            dtype=self.dtype, name="conv3",
        )(out)
        out = _norm(train, self.dtype, "bn3")(out)

        identity = x
        if self.stride != 1 or inplanes != self.planes * self.expansion:
            identity = nn.Conv(
                self.planes * self.expansion, (1, 1), strides=(self.stride,) * 2,
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = _norm(train, self.dtype, "downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Torchvision-style ResNet trunk with global average pooling."""

    block: str  # "basic" | "bottleneck"
    layers: Sequence[int]
    res5_stride: int = 2
    res5_dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @property
    def expansion(self) -> int:
        return 1 if self.block == "basic" else 4

    @property
    def out_channels(self) -> int:
        return 512 * self.expansion

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, H, W, 3] -> [B, 512 * expansion]."""
        block_cls = BasicBlock if self.block == "basic" else TorchBottleneck
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        x = nn.relu(_norm(train, self.dtype, "bn1")(x))
        # torch max_pool2d(kernel=3, stride=2, padding=1); -inf padding keeps
        # the max semantics exact at the borders.
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])

        stage_specs = [
            (64, self.layers[0], 1, 1),
            (128, self.layers[1], 2, 1),
            (256, self.layers[2], 2, 1),
            (512, self.layers[3], self.res5_stride, self.res5_dilation),
        ]
        for stage, (planes, blocks, stride, dilation) in enumerate(stage_specs, 1):
            for block in range(blocks):
                x = block_cls(
                    planes=planes,
                    stride=stride if block == 0 else 1,
                    dilation=dilation,
                    dtype=self.dtype,
                    name=f"layer{stage}_{block}",
                )(x, train=train)

        return jnp.mean(x, axis=(1, 2))


def build_resnet(cfg, dtype=jnp.float32) -> ResNet:
    """Builder mirroring reference resnet.py:215-235."""
    arch = cfg.MODEL.VISUAL_MODEL
    if arch not in ARCH_LAYERS:
        raise NotImplementedError(arch)
    block, layers = ARCH_LAYERS[arch]
    return ResNet(
        block=block,
        layers=layers,
        res5_stride=cfg.MODEL.RESNET.RES5_STRIDE,
        res5_dilation=cfg.MODEL.RESNET.RES5_DILATION,
        dtype=dtype,
    )
