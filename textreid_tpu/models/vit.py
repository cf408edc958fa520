"""CLIP Vision Transformer visual encoder (ViT-B/32, B/16, L/14).

The reference only ships the modified-ResNet CLIP backbones; a ViT option
is the stretch configuration named in BASELINE.json ("CLIP ViT-B/16
backbone + sharded large-gallery retrieval").  Architecture follows the
published CLIP ViT: patchify conv -> prepended class token -> learned
position embedding -> pre-LN transformer -> ``ln_post`` on the CLS token ->
linear projection to the joint embedding space.

TPU-first notes: attention is computed with a single fused QKV projection
feeding ``jax.nn.dot_product_attention`` (XLA emits a fused kernel);
non-square inputs (384x128 person crops) get a bilinearly-resized position
embedding at weight-conversion time, same as the RN path
(`utils/weight_convert.py:resize_pos_embed`).
"""

from __future__ import annotations

from typing import Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# Valid fused-attention modes (see TransformerBlock.fused_attention).
ATTENTION_MODES = ("off", "on", "bwd")


def attention_mode(value) -> str:
    """Normalize a fused-attention mode: bools map to "off"/"on" (the
    pre-mode API, kept so existing call sites and tests stay valid),
    strings are validated against ``ATTENTION_MODES``."""
    if isinstance(value, bool):
        return "on" if value else "off"
    if value not in ATTENTION_MODES:
        raise ValueError(
            f"unknown fused-attention mode {value!r}; expected a bool or "
            f"one of {ATTENTION_MODES}")
    return value


class TransformerBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    # Causal (autoregressive) attention mask — used by the CLIP text
    # encoder (models/text_transformer.py); the visual towers attend
    # bidirectionally.
    causal: bool = False
    # Fused Pallas attention (ops/attention_pallas.py): the [S, S] score
    # tile stays in VMEM instead of streaming [B, H, S, S] logits through
    # HBM, and the QKV split/head-reshape passes vanish into BlockSpec
    # index maps.  Mode (normalized by ``attention_mode``):
    #   False / "off"  — XLA formulation, fwd and bwd (the default);
    #   True  / "on"   — Pallas kernel, fwd and bwd — the step-level
    #                    winner for ViT-B/16 training on v5e (bench.py
    #                    --train A/B with the pair layout: 196.5 ms split
    #                    -> 150.1 ms pair vs 205 ms XLA);
    #   "bwd"          — XLA fwd + Pallas bwd.  Mattered when the split
    #                    layout's forward lost to XLA (probe 1.72 vs
    #                    1.87 ms); the pair forward wins outright
    #                    (0.676 ms) — kept as a measured escape hatch.
    # Param tree is identical in every mode.
    fused_attention: Union[bool, str] = False
    # Block layout for the Pallas kernels (see ops/attention_pallas
    # _resolve_layout): "auto" = zero-copy pair layout when eligible.
    attn_layout: str = "auto"
    # Run the Pallas kernel in interpreter mode (CPU tests only).
    attn_interpret: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        width = h.shape[-1]
        qkv = nn.Dense(3 * width, dtype=self.dtype, name="qkv")(h)
        mode = attention_mode(self.fused_attention)
        if mode != "off":
            from ..ops.attention_pallas import hybrid_attention

            attn = hybrid_attention(qkv, self.heads, self.causal, None,
                                    8, self.attn_interpret,
                                    layout=self.attn_layout,
                                    pallas_fwd=(mode == "on"))
        else:
            # same contract as the kernel's agreement oracle — one
            # definition of the math, two lowerings
            from ..ops.attention_pallas import xla_attention

            attn = xla_attention(qkv, heads=self.heads, causal=self.causal)
        x = x + nn.Dense(width, dtype=self.dtype, name="out_proj")(attn)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * width, dtype=self.dtype, name="c_fc")(h)
        # CLIP uses QuickGELU: x * sigmoid(1.702 x)
        h = h * jax.nn.sigmoid(1.702 * h)
        return x + nn.Dense(width, dtype=self.dtype, name="c_proj")(h)


class VisionTransformer(nn.Module):
    input_resolution: Tuple[int, int] = (224, 224)
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    dtype: jnp.dtype = jnp.float32
    fused_attention: Union[bool, str] = False
    attn_layout: str = "auto"
    attn_interpret: bool = False

    @property
    def out_channels(self) -> int:
        return self.output_dim

    @property
    def grid(self) -> Tuple[int, int]:
        grid = (
            self.input_resolution[0] // self.patch_size,
            self.input_resolution[1] // self.patch_size,
        )
        if min(grid) < 1:
            raise ValueError(
                f"input_resolution {tuple(self.input_resolution)} smaller "
                f"than patch_size {self.patch_size}: the {grid} patch grid "
                f"is empty, so the tower would silently attend over the "
                f"CLS token alone and ignore the image entirely."
            )
        return grid

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        """x: [B, H, W, 3] -> [B, output_dim].  ``train`` kept for API
        parity with the ResNet towers (no BN here)."""
        del train
        batch = x.shape[0]
        x = nn.Conv(
            self.width, (self.patch_size,) * 2, strides=(self.patch_size,) * 2,
            use_bias=False, dtype=self.dtype, name="patch_embed",
        )(x)  # [B, gh, gw, width]
        x = x.reshape(batch, -1, self.width)

        cls = self.param(
            "class_embedding",
            nn.initializers.normal(stddev=self.width**-0.5),
            (self.width,), jnp.float32,
        ).astype(self.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (batch, 1, self.width)), x], axis=1
        )
        n_tokens = self.grid[0] * self.grid[1] + 1
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=self.width**-0.5),
            (n_tokens, self.width), jnp.float32,
        )
        x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)

        for i in range(self.layers):
            x = TransformerBlock(
                self.width, self.heads, self.dtype,
                fused_attention=self.fused_attention,
                attn_layout=self.attn_layout,
                attn_interpret=self.attn_interpret, name=f"block_{i}"
            )(x)

        cls_out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(
            x[:, 0]
        )
        proj = self.param(
            "proj",
            nn.initializers.normal(stddev=self.width**-0.5),
            (self.width, self.output_dim), jnp.float32,
        )
        return cls_out @ proj.astype(cls_out.dtype)


VIT_SPECS = {
    "clip_vit_b32": dict(patch_size=32, width=768, layers=12, heads=12,
                         output_dim=512),
    "clip_vit_b16": dict(patch_size=16, width=768, layers=12, heads=12,
                         output_dim=512),
    "clip_vit_l14": dict(patch_size=14, width=1024, layers=24, heads=16,
                         output_dim=768),
}


def fused_attention_from_cfg(cfg, tower: str = "visual") -> str:
    """Resolve the fused-attention mode for one tower.

    ``TPU.FUSED_ATTENTION`` is the on/off gate; when on, the lowering is
    picked per tower — ``TPU.FUSED_ATTENTION_MODE`` for the visual
    transformer, ``TPU.FUSED_ATTENTION_TEXT_MODE`` for the text
    transformer — because the on-chip step-level A/B (``bench.py --train``
    variants, BENCH_TRAIN_BS128_*.json) shows the kernels WIN at the ViT
    shape (S=193: step 205.1 -> 196.7 ms all-Pallas; the XLA-fwd "bwd"
    hybrid measures 205.2, no better than XLA) and LOSE at the CLIP text
    shape (S=77: fullclip step 235 -> 242 ms with both towers fused), so
    one global lowering cannot be right for both.
    Only applies on the TPU backend (no compiled CPU lowering — CPU tests
    use the modules' ``attn_interpret`` escape hatch directly)."""
    if tower not in ("visual", "text"):
        raise ValueError(f"unknown tower {tower!r}")
    if not (bool(getattr(cfg.TPU, "FUSED_ATTENTION", False))
            and jax.default_backend() == "tpu"):
        return "off"
    key = ("FUSED_ATTENTION_MODE" if tower == "visual"
           else "FUSED_ATTENTION_TEXT_MODE")
    return attention_mode(getattr(cfg.TPU, key, "on"))


def build_vit(cfg, dtype=jnp.float32) -> VisionTransformer:
    name = cfg.MODEL.VISUAL_MODEL
    if name in VIT_SPECS:
        spec = dict(VIT_SPECS[name])
    else:  # fully custom via the MODEL.VIT section
        spec = dict(
            patch_size=cfg.MODEL.VIT.PATCH_SIZE,
            width=cfg.MODEL.VIT.WIDTH,
            layers=cfg.MODEL.VIT.LAYERS,
            heads=cfg.MODEL.VIT.HEADS,
            output_dim=cfg.MODEL.VIT.OUTPUT_DIM,
        )
    return VisionTransformer(
        input_resolution=(cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH),
        dtype=dtype, fused_attention=fused_attention_from_cfg(cfg),
        attn_layout=str(getattr(cfg.TPU, "FUSED_ATTENTION_LAYOUT", "auto")),
        **spec,
    )
