"""Int8 gallery quantization for large-scale retrieval.

A million-person gallery at 256-d float32 is 1 GB of HBM per chip before
sharding; int8 with per-row scales is 4x smaller and scores at the TPU's
int8 matmul rate (2x bf16 peak on v5e).  Cosine ranking is scale-invariant
per query, so per-row symmetric quantization preserves ordering up to
rounding: ``score = (q @ int8_g.T) * g_scale`` with q kept in bf16/f32.

Used by ``serving.RetrievalIndex(quantize=True)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizedGallery(NamedTuple):
    values: jax.Array  # [G, D] int8
    scales: jax.Array  # [G] float32  (per-row max-abs / 127)


def quantize_rows(embeddings: jax.Array) -> QuantizedGallery:
    """Per-row symmetric int8 quantization of (normalized) embeddings."""
    abs_max = jnp.max(jnp.abs(embeddings), axis=1, keepdims=True)
    scale = jnp.maximum(abs_max, 1e-8) / 127.0
    q = jnp.clip(jnp.round(embeddings / scale), -127, 127).astype(jnp.int8)
    return QuantizedGallery(values=q, scales=scale[:, 0].astype(jnp.float32))


def dequantize_rows(gallery: QuantizedGallery) -> jax.Array:
    return gallery.values.astype(jnp.float32) * gallery.scales[:, None]


@jax.jit
def quantized_scores(queries: jax.Array, gallery: QuantizedGallery) -> jax.Array:
    """[Q, D] x int8 [G, D] -> [Q, G] float32 similarity.

    The contraction runs with int8 RHS (MXU int8 path); the per-row scale
    folds in afterwards as a cheap column-wise multiply.
    """
    raw = jax.lax.dot_general(
        queries.astype(jnp.bfloat16),
        gallery.values,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return raw * gallery.scales[None, :]


def quantized_topk(queries: jax.Array, gallery: QuantizedGallery, k: int):
    scores = quantized_scores(queries, gallery)
    return jax.lax.top_k(scores, k)
