"""CLIP Modified ResNet visual encoder (RN50 / RN101), TPU-native.

Re-design of the reference CLIP backbone
(`/root/reference/lib/models/backbones/m_resnet.py`):

* 3-conv stem with an average-pool instead of max-pool (m_resnet.py:160-172),
* anti-aliased bottlenecks — an avgpool precedes every strided projection
  (m_resnet.py:11-67),
* a QKV attention pool instead of global average pooling (m_resnet.py:70-135),
* configurable res5 stride (m_resnet.py:179) and bilinear position-embedding
  resize for non-224 inputs (m_resnet.py:220-232, handled in the weight
  converter `textreid_tpu/utils/weight_convert.py`).

TPU-first choices: NHWC layout throughout (XLA's native conv layout), and the
attention pool computes **only the CLS query** — the reference runs full
self-attention over all HW+1 tokens and discards every output but the first
(m_resnet.py:111-135); attending from the single CLS token is mathematically
identical and ~(HW+1)x cheaper.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class Bottleneck(nn.Module):
    """Anti-aliased CLIP bottleneck (reference m_resnet.py:11-67)."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    expansion: int = 4

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        inplanes = x.shape[-1]
        out_planes = self.planes * self.expansion
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        conv = lambda feats, k, name: nn.Conv(  # noqa: E731
            feats, (k, k), padding=[(k // 2, k // 2)] * 2, use_bias=False,
            dtype=self.dtype, name=name,
        )

        out = nn.relu(norm("bn1")(conv(self.planes, 1, "conv1")(x)))
        out = nn.relu(norm("bn2")(conv(self.planes, 3, "conv2")(out)))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride,) * 2, (self.stride,) * 2)
        out = norm("bn3")(conv(out_planes, 1, "conv3")(out))

        identity = x
        if self.stride > 1 or inplanes != out_planes:
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride,) * 2, (self.stride,) * 2)
            identity = conv(out_planes, 1, "downsample_conv")(identity)
            identity = norm("downsample_bn")(identity)

        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """CLS-query attention pooling (reference m_resnet.py:70-135).

    Tokens are the flattened spatial features with a prepended mean token;
    a learned position embedding is added, then one round of multi-head
    attention is evaluated for the CLS query only.
    """

    spacial_dim: Tuple[int, int]
    embed_dim: int
    num_heads: int
    output_dim: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        batch, h, w, c = x.shape
        assert (h, w) == tuple(self.spacial_dim), (
            f"attention pool built for grid {self.spacial_dim}, got {(h, w)}"
        )
        tokens = x.reshape(batch, h * w, c)
        cls = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([cls, tokens], axis=1)  # [B, N+1, C]

        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=c**-0.5),
            (h * w + 1, c),
            jnp.float32,  # f32 master copy; cast to compute dtype at use
        )
        tokens = tokens + pos[None].astype(tokens.dtype)

        head_dim = self.embed_dim // self.num_heads
        dense = lambda feats, name: nn.Dense(feats, dtype=self.dtype, name=name)  # noqa: E731

        q = dense(self.embed_dim, "q_proj")(tokens[:, 0])  # CLS only
        k = dense(self.embed_dim, "k_proj")(tokens)
        v = dense(self.embed_dim, "v_proj")(tokens)

        q = q.reshape(batch, self.num_heads, head_dim) * head_dim**-0.5
        k = k.reshape(batch, -1, self.num_heads, head_dim)
        v = v.reshape(batch, -1, self.num_heads, head_dim)

        scores = jnp.einsum("bhd,bnhd->bhn", q, k)
        attn = jax.nn.softmax(scores, axis=-1)
        pooled = jnp.einsum("bhn,bnhd->bhd", attn, v).reshape(batch, self.embed_dim)
        return dense(self.output_dim or self.embed_dim, "c_proj")(pooled)


class ModifiedResNet(nn.Module):
    """CLIP's modified ResNet trunk + attention pool (m_resnet.py:138-217)."""

    layers: Sequence[int]
    output_dim: int
    heads: int
    last_stride: int = 1
    input_resolution: Tuple[int, int] = (224, 224)
    width: int = 64
    dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.output_dim

    @property
    def final_grid(self) -> Tuple[int, int]:
        down = 16 if self.last_stride == 1 else 32
        return (self.input_resolution[0] // down, self.input_resolution[1] // down)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        """x: [B, H, W, 3] NHWC normalized pixels -> [B, output_dim]."""
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        # 3-layer stem (m_resnet.py:160-172).
        x = nn.Conv(
            self.width // 2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.relu(norm("bn1")(x))
        x = nn.Conv(
            self.width // 2, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv2",
        )(x)
        x = nn.relu(norm("bn2")(x))
        x = nn.Conv(
            self.width, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv3",
        )(x)
        x = nn.relu(norm("bn3")(x))
        x = nn.avg_pool(x, (2, 2), (2, 2))

        stage_specs = [
            (self.width, self.layers[0], 1),
            (self.width * 2, self.layers[1], 2),
            (self.width * 4, self.layers[2], 2),
            (self.width * 8, self.layers[3], self.last_stride),
        ]
        for stage, (planes, blocks, stride) in enumerate(stage_specs, start=1):
            for block in range(blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if block == 0 else 1,
                    dtype=self.dtype,
                    name=f"layer{stage}_{block}",
                )(x, train=train)

        embed_dim = self.width * 32
        return AttentionPool2d(
            spacial_dim=self.final_grid,
            embed_dim=embed_dim,
            num_heads=self.heads,
            output_dim=self.output_dim,
            dtype=self.dtype,
            name="attnpool",
        )(x)


def modified_resnet50(input_resolution, last_stride, dtype=jnp.float32):
    """RN50 spec (reference m_resnet.py:246-266): 1024-d output, 32 heads."""
    return ModifiedResNet(
        layers=(3, 4, 6, 3), output_dim=1024, heads=32,
        last_stride=last_stride, input_resolution=tuple(input_resolution),
        dtype=dtype,
    )


def modified_resnet101(input_resolution, last_stride, dtype=jnp.float32):
    """RN101 spec (reference m_resnet.py:269-291): 512-d output, 32 heads."""
    return ModifiedResNet(
        layers=(3, 4, 23, 3), output_dim=512, heads=32,
        last_stride=last_stride, input_resolution=tuple(input_resolution),
        dtype=dtype,
    )


def build_m_resnet(cfg, dtype=jnp.float32) -> ModifiedResNet:
    """Builder mirroring reference m_resnet.py:294-307 (checkpoint loading is
    handled separately by the weight converter)."""
    resolution = (cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH)
    stride = cfg.MODEL.RESNET.RES5_STRIDE
    if cfg.MODEL.VISUAL_MODEL in ("m_resnet50", "m_resnet"):
        return modified_resnet50(resolution, stride, dtype)
    if cfg.MODEL.VISUAL_MODEL == "m_resnet101":
        return modified_resnet101(resolution, stride, dtype)
    raise NotImplementedError(cfg.MODEL.VISUAL_MODEL)
