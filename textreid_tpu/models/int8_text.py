"""True int8-dataflow CLIP text-transformer encoder.

The textual-tower sibling of ``models/int8_vit.py`` (which carries the
shared block machinery: LN-affine folding, two-level requantization,
int8 x int8 -> int32 block matmuls).  This closes the int8 story across
every tower family: conv trunk (``int8_tower.py``), ViT (``int8_vit.py``),
and now the CLIP text transformer — the tower that sits on the SERVING
hot path, where each query pays one text-transformer forward
(`textreid_tpu/serving.py:search`; the reference's only text encode is
the offline eval loop, `/root/reference/lib/engine/inference.py:14-26`).

What is text-specific (everything else is the shared block graph):

* the input is an embedding-table gather, not a patchify conv — the
  gather stays at the tower dtype (bf16 in production: it is
  bandwidth-bound, and the float tower reads the same bf16-cast table,
  so this adds no error relative to it);
* attention is CAUSAL (the shared ``int8_block_apply`` takes the flag);
* the head is ``ln_final`` at the end-of-text slot -> projection, the
  direct analogue of the ViT's ``ln_post``-at-CLS -> proj (both stay
  float: sub-1% of the FLOPs);
* padding tokens need no special casing: the dynamic requant scale is
  per-token (a pad row's garbage range never touches a valid token's
  quantization), and causal masking already keeps pad positions out of
  every valid token's attention — the same invariance argument as the
  float tower (`models/text_transformer.py:20-26`).

Calibration batches are (token_ids [B, T], lengths [B]) with the serving
query distribution — e.g. the dataset's captions, which is what
``tools/serve.py --int8-text`` feeds it.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .int8_vit import (
    _norm_no_affine,
    folded_block_float,
    int8_block_apply,
    quantize_block,
)
from .text_transformer import TextTransformer


class Int8Text(NamedTuple):
    """Prepared int8 text transformer: quantized folded weights + static
    activation scales.  Same layout contract as ``int8_vit.Int8ViT``:
    ``units``: site -> {"w_q" int8 [ci, co], "s_w" f32 [co], "b" f32
    [co]}; ``scales``: site -> f32 [ci]; ``consts``: the float remainder
    (token/positional tables, ln_final affine, text projection).  A
    pytree — pass it as a jit argument, never close over it (the axon
    compile relay rejects large constants; the token table alone is
    ~50 MB)."""

    units: Dict[str, dict]
    scales: Dict[str, jax.Array]
    consts: Dict[str, jax.Array]


def _folded_text_float(tt: TextTransformer, params, token_ids, lengths,
                       record: Optional[dict] = None):
    """Eval forward of the text transformer with every LN-affine folded
    into its consumer matmul — mathematically the module's forward (same
    fp ops reassociated; `models/text_transformer.py:73-129`), recording
    per-channel abs-max at every quantization site when ``record`` is
    given."""
    batch, seq = token_ids.shape
    table = jnp.asarray(params["token_embedding"], jnp.float32)
    x = jnp.take(table, token_ids, axis=0)
    pos = jnp.asarray(params["positional_embedding"], jnp.float32)
    x = x + pos[None, :seq]

    for i in range(tt.layers):
        x = folded_block_float(x, params[f"block_{i}"], f"block_{i}.",
                               tt.heads, causal=True, record=record)

    fin = params["ln_final"]
    x = (_norm_no_affine(x) * jnp.asarray(fin["scale"], jnp.float32)
         + jnp.asarray(fin["bias"], jnp.float32))
    eot = jnp.clip(lengths - 1, 0, seq - 1)
    x = x[jnp.arange(batch), eot]
    return x @ jnp.asarray(params["text_projection"], jnp.float32)


def calibrate_text_amax(tt: TextTransformer, params, batches):
    """Per-channel abs-max at every quantized-matmul input over
    calibration batches of ``(token_ids [B, T] int32, lengths [B]
    int32)``; elementwise max across batches on the host."""

    @jax.jit
    def one_batch(params, token_ids, lengths):
        record = {}
        _folded_text_float(tt, params, token_ids, lengths, record)
        return record

    acc: Dict[str, np.ndarray] = {}
    for token_ids, lengths in batches:
        rec = jax.device_get(one_batch(params, jnp.asarray(token_ids),
                                       jnp.asarray(lengths)))
        for site, amax in rec.items():
            prev = acc.get(site)
            acc[site] = amax if prev is None else np.maximum(prev, amax)
    if not acc:
        raise ValueError("calibration needs at least one batch")
    return acc


def prepare_int8_text(tt: TextTransformer, params,
                      amax: Dict[str, np.ndarray]) -> Int8Text:
    """Fold LN affines + per-input-channel activation scales into the
    kernels and quantize per-output-channel (the ``int8_vit`` recipe;
    the per-block work is the shared ``quantize_block``)."""
    units: Dict[str, dict] = {}
    scales = {s: jnp.maximum(jnp.asarray(a, jnp.float32), 1e-8) / 127.0
              for s, a in amax.items()}

    def quantize(name, w_eff, bias):
        s_w = jnp.maximum(jnp.max(jnp.abs(w_eff), axis=0), 1e-12) / 127.0
        w_q = jnp.clip(jnp.round(w_eff / s_w), -127, 127).astype(jnp.int8)
        units[name] = {"w_q": w_q, "s_w": s_w,
                       "b": bias.astype(jnp.float32)}

    for i in range(tt.layers):
        quantize_block(params[f"block_{i}"], f"block_{i}.", scales,
                       quantize)

    fdt = tt.dtype
    consts = {
        # the gather is bandwidth-bound: store the table at the tower
        # dtype (the float tower reads the same cast — no added error)
        "token": jnp.asarray(params["token_embedding"], fdt),
        "pos": jnp.asarray(params["positional_embedding"], jnp.float32),
        "ln_final_scale": jnp.asarray(params["ln_final"]["scale"],
                                      jnp.float32),
        "ln_final_bias": jnp.asarray(params["ln_final"]["bias"],
                                     jnp.float32),
        "proj": jnp.asarray(params["text_projection"], jnp.bfloat16),
    }
    return Int8Text(units=units, scales=scales, consts=consts)


def int8_text_apply(tt: TextTransformer, tower: Int8Text, token_ids,
                    lengths, fused_ffn=None) -> jax.Array:
    """token_ids [B, T] int32, lengths [B] int32 -> [B, output_dim].
    Every block matmul consumes int8; the residual stream and the causal
    attention stay at the module's float dtype."""
    batch, seq = token_ids.shape
    fdt = tt.dtype
    x = jnp.take(tower.consts["token"], token_ids, axis=0).astype(fdt)
    x = x + tower.consts["pos"][None, :seq].astype(fdt)

    for i in range(tt.layers):
        # fused_ffn_default=True: the fused int8-FFN kernel is the
        # measured winner on this tower (see _fused_ffn_wanted's A/B
        # numbers); the ViT tower keeps the XLA path.
        x = int8_block_apply(x, tower, f"block_{i}.", tt.heads, fdt,
                             causal=True, fused_ffn=fused_ffn,
                             fused_ffn_default=True)

    x = (_norm_no_affine(x) * tower.consts["ln_final_scale"]
         + tower.consts["ln_final_bias"])
    eot = jnp.clip(lengths - 1, 0, seq - 1)
    x = x[jnp.arange(batch), eot].astype(fdt)
    return x @ tower.consts["proj"].astype(fdt)


# ---------------------------------------------------------------------------
# Serving integration
# ---------------------------------------------------------------------------

def build_int8_text_encoder(model, state, calib_batches):
    """Calibrate + prepare, returning ``(encode, tower)``: ``encode`` is a
    jitted ``(state, tower, token_ids, lengths) -> normalized embeddings``
    drop-in for serving.RetrievalIndex's text encoder (mirror of
    ``int8_vit.build_int8_vit_encoder`` for the textual tower)."""
    textual = model.textual
    if not isinstance(textual, TextTransformer):
        raise NotImplementedError(
            f"int8 text encoder needs a TextTransformer tower; got "
            f"{type(textual).__name__} (the bi-GRU has no block-matmul "
            f"graph to quantize — its FLOPs live in the scan)")
    tparams = state.params["textual"]
    amax = calibrate_text_amax(textual, tparams, calib_batches)
    tower = prepare_int8_text(textual, tparams, amax)

    from .losses import l2_normalize

    @jax.jit
    def encode(state, tower, token_ids, lengths):
        feat = int8_text_apply(textual, tower, token_ids, lengths)
        emb = model.apply({"params": state.params}, feat,
                          method="embed_text")
        return l2_normalize(emb.astype(jnp.float32), axis=1)

    return encode, tower
