"""CLIP text-transformer encoder (textual-tower alternative to the bi-GRU).

The reference pairs every visual backbone with a bi-GRU text branch
(`/root/reference/lib/models/backbones/gru.py`); its CLIP configurations
reuse CLIP's *token embedding table* but discard CLIP's actual text
encoder.  This module completes the full-CLIP model family (the same
"beyond the reference" tier as the ViT visual tower, BASELINE.json
stretch): the published CLIP text transformer — token embedding ->
learned positional embedding -> causally-masked pre-LN transformer ->
``ln_final`` at the end-of-text token -> linear projection — usable as a
drop-in textual tower (``MODEL.TEXTUAL_MODEL: "transformer"``), with
warm-start from the text half of the same CLIP jit archives the visual
towers already load (`utils/weight_convert.py:convert_clip_text`).

TPU-first notes:

* Attention runs through the same fused-QKV ``jax.nn.dot_product_attention``
  block as the ViT tower (`models/vit.py:TransformerBlock`) with
  ``is_causal=True`` — XLA emits one fused attention kernel; no
  materialized ``[T, T]`` mask constant rides in the program.
* Pooling is padding-invariant by construction: the causal mask means the
  feature at position ``lengths-1`` (CLIP's EOT slot) attends only to the
  sample's own valid prefix, so tokens past ``lengths`` can never leak in
  — unlike the GRU's torch pad-packed max-pool quirk there is no
  batch-composition dependence to reproduce (see
  ``models/gru.py:masked_max_pool``).
* EOT selection uses the pipeline's explicit ``lengths`` (the fixed-shape
  caption container pads with 0s), not CLIP's ``argmax(token_ids)`` trick
  — identical when captions are CLIP-BPE tokenized (EOT is the last valid
  token) and well-defined for any vocabulary.
* The gather of one row per sample is a tiny ``[B]``-indexed take;
  everything upstream is dense ``[B*T, W]`` matmuls on the MXU.
"""

from __future__ import annotations

from typing import Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from .vit import TransformerBlock

Array = jax.Array


class TextTransformer(nn.Module):
    """CLIP text encoder.

    ``__call__(token_ids [B, T], lengths [B]) -> [B, output_dim]`` — the
    same contract as ``BiGRUEncoder`` so the composition layer
    (`models/model.py:TextReIDModel.encode_text`) is tower-agnostic.
    """

    vocab_size: int = 49408          # CLIP BPE vocabulary
    context_length: int = 77         # CLIP positional-embedding rows
    width: int = 512
    layers: int = 12
    heads: int = 8
    output_dim: int = 512
    dtype: jnp.dtype = jnp.float32
    # Fused Pallas attention mode (see models/vit.py:TransformerBlock).
    fused_attention: Union[bool, str] = False
    attn_layout: str = "auto"
    attn_interpret: bool = False

    @property
    def out_channels(self) -> int:
        return self.output_dim

    @nn.compact
    def __call__(self, token_ids: Array, lengths: Array,
                 deterministic: bool = True) -> Array:
        """token_ids: [B, T] int32, lengths: [B] int32 -> [B, output_dim].

        ``deterministic`` kept for API parity with the GRU tower (CLIP's
        text encoder has no dropout)."""
        del deterministic
        batch, seq = token_ids.shape
        if seq > self.context_length:
            raise ValueError(
                f"sequence length {seq} exceeds context_length "
                f"{self.context_length}: positions past the learned "
                f"positional embedding would silently share its last row. "
                f"Lower INPUT.MAX_TEXT_LENGTH or raise "
                f"MODEL.TRANSFORMER.CONTEXT_LENGTH (warm-start resizes the "
                f"CLIP table by linear interpolation)."
            )

        # CLIP init scales (model.py in the CLIP release): tokens N(0, 0.02),
        # positions N(0, 0.01), projection N(0, width^-0.5).
        table = self.param(
            "token_embedding",
            nn.initializers.normal(stddev=0.02),
            (self.vocab_size, self.width), jnp.float32,
        ).astype(self.dtype)
        x = jnp.take(table, token_ids, axis=0)  # [B, T, W]

        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (self.context_length, self.width), jnp.float32,
        )
        x = x + pos[None, :seq].astype(x.dtype)

        for i in range(self.layers):
            x = TransformerBlock(
                self.width, self.heads, self.dtype, causal=True,
                fused_attention=self.fused_attention,
                attn_layout=self.attn_layout,
                attn_interpret=self.attn_interpret,
                name=f"block_{i}",
            )(x)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)

        # Feature at the end-of-text slot: index lengths-1, clipped to the
        # valid range (the loader guarantees lengths >= 1; clip keeps the
        # compiled program total for adversarial inputs).
        eot = jnp.clip(lengths - 1, 0, seq - 1)
        x = x[jnp.arange(batch), eot]  # [B, W]

        proj = self.param(
            "text_projection",
            nn.initializers.normal(stddev=self.width**-0.5),
            (self.width, self.output_dim), jnp.float32,
        )
        return x @ proj.astype(x.dtype)


TEXT_TRANSFORMER_SPECS = {
    # The text halves of the published CLIP archives.
    "clip_text_rn50": dict(width=512, layers=12, heads=8, output_dim=1024),
    "clip_text_rn101": dict(width=512, layers=12, heads=8, output_dim=512),
    "clip_text_b32": dict(width=512, layers=12, heads=8, output_dim=512),
    "clip_text_b16": dict(width=512, layers=12, heads=8, output_dim=512),
    "clip_text_l14": dict(width=768, layers=12, heads=12, output_dim=768),
}


def build_text_transformer(cfg, dtype=jnp.float32) -> TextTransformer:
    """Constructor from the ``MODEL.TRANSFORMER`` config section; named
    presets (``MODEL.TRANSFORMER.ARCH``) cover the published CLIP text
    towers, with explicit fields as the fully-custom escape hatch."""
    t = cfg.MODEL.TRANSFORMER
    if t.ARCH:
        if t.ARCH not in TEXT_TRANSFORMER_SPECS:
            raise KeyError(
                f"unknown MODEL.TRANSFORMER.ARCH {t.ARCH!r}; known: "
                f"{sorted(TEXT_TRANSFORMER_SPECS)} (or leave empty and set "
                f"WIDTH/LAYERS/HEADS/OUTPUT_DIM explicitly)"
            )
        spec = dict(TEXT_TRANSFORMER_SPECS[t.ARCH])
    else:
        spec = dict(width=t.WIDTH, layers=t.LAYERS, heads=t.HEADS,
                    output_dim=t.OUTPUT_DIM)
    from .vit import fused_attention_from_cfg

    return TextTransformer(
        vocab_size=t.VOCAB_SIZE,
        context_length=t.CONTEXT_LENGTH,
        dtype=dtype,
        fused_attention=fused_attention_from_cfg(cfg, tower="text"),
        attn_layout=str(getattr(cfg.TPU, "FUSED_ATTENTION_LAYOUT", "auto")),
        **spec,
    )
