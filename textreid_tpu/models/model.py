"""Model composition: visual encoder + textual encoder + embedding head.

Counterpart of the reference composition layer
(`/root/reference/lib/models/model.py`, `lib/models/backbones/build.py`,
`lib/models/embeddings/{simple_head,moco_head}/head.py`) — re-designed for
JAX's functional training model:

* The reference's ``SimpleHead``/``MoCoHead`` are stateful ``nn.Module``s
  owning loss evaluators, momentum copies and ring-buffer queues.  Here the
  module holds only *parameters* (encoders, embed projections, optional MoCo
  MLP projectors, and the classifier projection used by the losses); all
  mutable training state — key-encoder params (EMA), the MoCo queues and
  pointer — lives in the functional ``TrainState`` (see
  ``textreid_tpu/engine/state.py``), which is the idiomatic JAX equivalent of
  the reference's registered buffers (moco_head/head.py:53-62).
* Method-based ``apply`` exposes the pieces the training/eval steps need:
  ``encode_image`` / ``encode_text`` (backbone features),
  ``embed_image`` / ``embed_text`` (retrieval embeddings,
  moco_head/head.py:50-51,178-183), and ``project_image`` / ``project_text``
  (the optional 2-layer MoCo projectors, moco_head/head.py:32-48).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .gru import BiGRUEncoder, build_bigru
from .m_resnet import build_m_resnet
from .resnet import ResNet, build_resnet

Array = Any


def kaiming_out_init(key, shape, dtype=jnp.float32):
    """torch kaiming_normal_(mode="fan_out") for a flax [in, out] kernel
    (reference head init, moco_head/head.py:64-71)."""
    import jax

    fan_out = shape[-1]
    return jax.random.normal(key, shape, dtype) * jnp.sqrt(2.0 / fan_out)


def xavier_uniform_init(key, shape, dtype=jnp.float32):
    import jax

    bound = jnp.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def preprocess_pixels(images, erase, pixel_mean, pixel_std,
                      dtype=jnp.float32):
    """uint8 HWC -> normalized float on device, with the torchvision
    RandomErasing rectangle fill applied.

    The host pipeline samples the rectangle ([apply, top, left, h, w] per
    sample, ``data/transforms.py``); the fill value is the *raw* pixel mean
    written into the normalized image — torchvision's
    ``RandomErasing(value=pixel_mean)`` quirk the reference inherits
    (reference transforms.py:24)."""
    mean = jnp.asarray(pixel_mean, dtype)
    std = jnp.asarray(pixel_std, dtype)
    x = images.astype(dtype) / 255.0
    x = (x - mean) / std
    if erase is not None:
        h, w = x.shape[1], x.shape[2]
        rows = jnp.arange(h)[None, :, None]  # [1, H, 1]
        cols = jnp.arange(w)[None, None, :]  # [1, 1, W]
        apply = erase[:, 0][:, None, None].astype(bool)
        top = erase[:, 1][:, None, None]
        left = erase[:, 2][:, None, None]
        eh = erase[:, 3][:, None, None]
        ew = erase[:, 4][:, None, None]
        in_rect = (
            (rows >= top) & (rows < top + eh)
            & (cols >= left) & (cols < left + ew)
            & apply
        )
        x = jnp.where(in_rect[..., None], mean, x)
    return x


class MLPProjector(nn.Module):
    """2-layer projection head used by MoCo when FC=True (head.py:32-48)."""

    feature_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(
            self.feature_size, kernel_init=kaiming_out_init, dtype=self.dtype,
            name="fc1",
        )(x)
        x = nn.relu(x)
        return nn.Dense(
            self.feature_size, kernel_init=kaiming_out_init, dtype=self.dtype,
            name="fc2",
        )(x)


class TextReIDModel(nn.Module):
    """Two-tower text/image retrieval model.

    ``__call__`` is the eval path (reference model.py:29-41 and
    moco_head/head.py:178-183): backbone features through the plain embed
    layers, returning ``(visual_embed, textual_embed)``.
    """

    visual: nn.Module
    textual: nn.Module  # BiGRUEncoder or TextTransformer
    feature_size: int
    num_classes: int
    embed_head: str = "simple"  # "simple" | "moco"
    moco_fc: bool = True
    dtype: jnp.dtype = jnp.float32
    # Pixel statistics for on-device preprocessing of uint8 inputs
    # (reference INPUT.PIXEL_MEAN/STD, applied host-side there).
    pixel_mean: tuple = (0.485, 0.456, 0.406)
    pixel_std: tuple = (0.229, 0.224, 0.225)

    def setup(self):
        self.v_embed_layer = nn.Dense(
            self.feature_size, kernel_init=kaiming_out_init, dtype=self.dtype,
        )
        self.t_embed_layer = nn.Dense(
            self.feature_size, kernel_init=kaiming_out_init, dtype=self.dtype,
        )
        if self.embed_head == "moco" and self.moco_fc:
            self.v_fc = MLPProjector(self.feature_size, self.dtype)
            self.t_fc = MLPProjector(self.feature_size, self.dtype)
        # Shared classifier projection consumed by instance_loss
        # (simple_head/loss.py:12-16, moco_head/loss.py:12-19).
        self.projection = self.param(
            "projection",
            xavier_uniform_init,
            (self.feature_size, self.num_classes),
            jnp.float32,  # master weights stay f32; losses run in f32
        )

    # -- backbone features ---------------------------------------------------
    def encode_image(self, images: Array, train: bool = False,
                     erase: Array = None) -> Array:
        if images.dtype == jnp.uint8:
            images = preprocess_pixels(
                images, erase, self.pixel_mean, self.pixel_std, self.dtype
            )
        return self.visual(images, train=train)

    def encode_text(self, token_ids: Array, lengths: Array) -> Array:
        return self.textual(token_ids, lengths)

    # -- retrieval embeddings ------------------------------------------------
    def embed_image(self, feat: Array) -> Array:
        return self.v_embed_layer(feat)

    def embed_text(self, feat: Array) -> Array:
        return self.t_embed_layer(feat)

    # -- MoCo contrastive projections ---------------------------------------
    def project_image(self, feat: Array) -> Array:
        return self.v_fc(feat) if self.moco_fc else self.v_embed_layer(feat)

    def project_text(self, feat: Array) -> Array:
        return self.t_fc(feat) if self.moco_fc else self.t_embed_layer(feat)

    def get_projection(self) -> Array:
        return self.projection

    def __call__(
        self,
        images: Array,
        token_ids: Array,
        lengths: Array,
        train: bool = False,
    ):
        v_embed = self.embed_image(self.encode_image(images, train=train))
        t_embed = self.embed_text(self.encode_text(token_ids, lengths))
        return v_embed, t_embed

    def init_all(self, images: Array, token_ids: Array, lengths: Array):
        """Initialization entry point touching every parameterized path
        (the eval path skips the MoCo FC projectors, which would otherwise
        never get params under lazy setup)."""
        v_feat = self.encode_image(images)
        t_feat = self.encode_text(token_ids, lengths)
        v_embed = self.embed_image(v_feat)
        t_embed = self.embed_text(t_feat)
        if self.embed_head == "moco" and self.moco_fc:
            self.project_image(v_feat)
            self.project_text(t_feat)
        return v_embed, t_embed


def build_visual_model(cfg, dtype=jnp.float32):
    """Mirrors reference backbones/build.py:6-11, extended with the CLIP
    ViT family (BASELINE.json stretch config)."""
    name = cfg.MODEL.VISUAL_MODEL
    if name in ("resnet18", "resnet34", "resnet50", "resnet101", "resnet152"):
        return build_resnet(cfg, dtype)
    if name in ("m_resnet", "m_resnet50", "m_resnet101"):
        return build_m_resnet(cfg, dtype)
    if name.startswith("clip_vit") or name == "vit":
        from .vit import build_vit

        return build_vit(cfg, dtype)
    raise NotImplementedError(name)


def build_textual_model(cfg, frozen_table_init=None, use_pallas=False,
                        dtype=jnp.float32):
    """Mirrors reference backbones/build.py:14-17, extended with the CLIP
    text transformer (full-CLIP model family, models/text_transformer.py)."""
    if cfg.MODEL.TEXTUAL_MODEL == "bigru":
        return build_bigru(cfg, frozen_table_init, use_pallas)
    if cfg.MODEL.TEXTUAL_MODEL in ("transformer", "clip_transformer"):
        from .text_transformer import build_text_transformer

        return build_text_transformer(cfg, dtype)
    raise NotImplementedError(cfg.MODEL.TEXTUAL_MODEL)


def build_model(cfg, frozen_table_init=None, dtype=jnp.float32,
                use_pallas=False) -> TextReIDModel:
    """Mirrors reference model.py:44-45 / build_model(cfg).

    ``use_pallas`` swaps the text tower's recurrence onto the fused Pallas
    scan kernel (TPU only; differentiable via its custom VJP)."""
    return TextReIDModel(
        visual=build_visual_model(cfg, dtype),
        textual=build_textual_model(cfg, frozen_table_init, use_pallas, dtype),
        feature_size=cfg.MODEL.EMBEDDING.FEATURE_SIZE,
        num_classes=cfg.MODEL.NUM_CLASSES,
        embed_head=cfg.MODEL.EMBEDDING.EMBED_HEAD,
        moco_fc=cfg.MODEL.MOCO.FC,
        dtype=dtype,
        pixel_mean=tuple(cfg.INPUT.PIXEL_MEAN),
        pixel_std=tuple(cfg.INPUT.PIXEL_STD),
    )
