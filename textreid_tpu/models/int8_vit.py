"""True int8-dataflow ViT encoder: int8 activations into every block matmul.

The transformer analogue of ``models/int8_tower.py`` (the conv-trunk int8
graph): a post-training-quantized inference path for the serving / gallery
index-build encode, the hot loop the reference spends its eval time in
(`/root/reference/lib/engine/inference.py:14-26` — the upstream repo ships
no transformer tower at all; this serves the beyond-reference ViT family).

Why the transformer is the better int8 target than the conv trunk: the
conv tower's measured ceiling was the VPU requant-epilogue tax on
big-spatial / narrow-channel layers (~4-5 ps/element, exceeding the conv
itself at layer1 — see int8_tower.py's header).  A ViT block's matmuls
are all WIDE (contraction >= width=768 at B/16) and its activation
tensors are small relative to the MACs they feed, so the same epilogue is
proportionally tiny and the int8 MXU rate (probed 240-307 TF/s on wide
layers, ~1.8x bf16) dominates.

The graph, per transformer block (eval semantics of
``models/vit.py:TransformerBlock``):

* LayerNorm affine folding: ``Dense(ln(x)) == norm(x) @ (gamma[:,None]*W)
  + (beta @ W + b)`` where ``norm`` is the UNSCALED normalization — so
  the quantized tensor is ``norm(x)`` (per-token zero mean / unit
  variance: a well-conditioned, outlier-tamed distribution) and the
  gamma affine rides the weight fold for free;
* every block matmul (qkv, out_proj, c_fc, c_proj) runs int8 x int8 ->
  int32 with TWO-LEVEL input quantization: static per-channel scales
  from a calibration pass folded into the kernels
  (``(q*s) @ W == q @ (s[:,None]*W)``) set the relative channel
  weighting, and a dynamic per-token scale (one VPU row-max, riding the
  epilogue) stretches each token across the full int8 range — see
  ``_requant_rowdyn``; weights quantized per-output-channel;
* each epilogue is one fused elementwise chain on the matmul output
  (``int32 -> *s_w[co] [*r_row]`` decoded in f32, then ``+b``, GELU,
  residual adds and the requant reads at the tower dtype — on the
  production bf16 tower the wide [B, S, 4W] FFN tensors cross HBM at
  half the bytes);
* attention itself (softmax(QK^T)V) stays bf16: at S<=257 it is ~4% of
  the block's FLOPs and softmax wants float anyway;
* the patchify conv quantizes like the trunk convs (3 input channels,
  normalized-pixel scales); ``ln_pre``/``ln_post``/the final projection
  stay bf16 (sub-1% of the FLOPs).

Calibration needs no labels: batches with the serving input distribution
run through the *folded float* graph — mathematically the float tower's
eval forward — recording per-channel abs-max at every matmul input.
"""

from __future__ import annotations

import os
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .model import preprocess_pixels
from .vit import VisionTransformer

# Quantized-matmul sites inside one block, in forward order.
_BLOCK_SITES = ("qkv", "out_proj", "c_fc", "c_proj")


def _norm_no_affine(x, eps: float = 1e-5):
    """LayerNorm WITHOUT the affine (gamma/beta ride the consumer weight
    fold); statistics in f32 like flax's LayerNorm."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (xf - mean) * lax.rsqrt(var + eps)


def _record_amax(record: Optional[dict], site: str, x) -> None:
    if record is not None:
        record[site] = jnp.max(jnp.abs(x.astype(jnp.float32)),
                               axis=tuple(range(x.ndim - 1)))


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _attention(qkv, heads: int, causal: bool = False):
    """bf16 attention on the fused-QKV layout.  On TPU this is the Pallas
    kernel in its zero-copy layout when eligible (the on-chip probe has
    the pair forward at 0.676 ms vs XLA's 1.670 at the ViT-B/16 shape);
    elsewhere (CPU tests) the XLA formulation — same math."""
    from ..ops.attention_pallas import fused_attention, xla_attention

    if jax.default_backend() == "tpu":
        return fused_attention(qkv, heads=heads, causal=causal,
                               layout="auto")
    return xla_attention(qkv, heads=heads, causal=causal)


# ---------------------------------------------------------------------------
# Folded float graph (calibration / agreement reference)
# ---------------------------------------------------------------------------

def folded_block_float(h, bp, site_prefix: str, heads: int,
                       causal: bool = False,
                       record: Optional[dict] = None):
    """One TransformerBlock (models/vit.py:44) in eval float form with the
    LN affines folded into the consumer matmuls — shared by the ViT and
    text-transformer calibration graphs (their blocks are the same flax
    module, so the param layout is identical)."""
    n1 = _norm_no_affine(h)
    _record_amax(record, f"{site_prefix}qkv", n1)
    g1 = jnp.asarray(bp["ln_1"]["scale"], jnp.float32)
    b1 = jnp.asarray(bp["ln_1"]["bias"], jnp.float32)
    wq = jnp.asarray(bp["qkv"]["kernel"], jnp.float32)
    qkv = n1 @ (g1[:, None] * wq) + (
        b1 @ wq + jnp.asarray(bp["qkv"]["bias"], jnp.float32))
    attn = _attention(qkv.astype(jnp.float32), heads, causal)
    _record_amax(record, f"{site_prefix}out_proj", attn)
    h = h + attn @ jnp.asarray(bp["out_proj"]["kernel"], jnp.float32) \
        + jnp.asarray(bp["out_proj"]["bias"], jnp.float32)

    n2 = _norm_no_affine(h)
    _record_amax(record, f"{site_prefix}c_fc", n2)
    g2 = jnp.asarray(bp["ln_2"]["scale"], jnp.float32)
    b2 = jnp.asarray(bp["ln_2"]["bias"], jnp.float32)
    wf = jnp.asarray(bp["c_fc"]["kernel"], jnp.float32)
    ff = n2 @ (g2[:, None] * wf) + (
        b2 @ wf + jnp.asarray(bp["c_fc"]["bias"], jnp.float32))
    ff = _quick_gelu(ff)
    _record_amax(record, f"{site_prefix}c_proj", ff)
    return h + ff @ jnp.asarray(bp["c_proj"]["kernel"], jnp.float32) \
        + jnp.asarray(bp["c_proj"]["bias"], jnp.float32)


def _folded_vit_float(vit: VisionTransformer, params, x,
                      record: Optional[dict] = None):
    """Eval forward of the ViT with every LN-affine algebraically folded
    into its consumer matmul — mathematically the module's forward (same
    fp ops reassociated), recording per-channel abs-max at every
    quantization site when ``record`` is given."""
    batch = x.shape[0]
    w = vit.width
    xf = x.astype(jnp.float32)
    _record_amax(record, "patch", xf)
    kernel = jnp.asarray(params["patch_embed"]["kernel"], jnp.float32)
    dn = lax.conv_dimension_numbers(xf.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    h = lax.conv_general_dilated(xf, kernel, (vit.patch_size,) * 2,
                                 "VALID", dimension_numbers=dn)
    h = h.reshape(batch, -1, w)

    cls = jnp.asarray(params["class_embedding"], jnp.float32)
    h = jnp.concatenate([jnp.broadcast_to(cls, (batch, 1, w)), h], axis=1)
    h = h + jnp.asarray(params["positional_embedding"], jnp.float32)[None]
    pre = params["ln_pre"]
    h = (_norm_no_affine(h) * jnp.asarray(pre["scale"], jnp.float32)
         + jnp.asarray(pre["bias"], jnp.float32))

    for i in range(vit.layers):
        h = folded_block_float(h, params[f"block_{i}"], f"block_{i}.",
                               vit.heads, causal=False, record=record)

    post = params["ln_post"]
    cls_out = (_norm_no_affine(h[:, 0])
               * jnp.asarray(post["scale"], jnp.float32)
               + jnp.asarray(post["bias"], jnp.float32))
    return cls_out @ jnp.asarray(params["proj"], jnp.float32)


# ---------------------------------------------------------------------------
# Preparation: calibration + weight quantization
# ---------------------------------------------------------------------------

class Int8ViT(NamedTuple):
    """Prepared int8 ViT: quantized folded weights + static act scales.

    ``units``: site -> {"w_q" int8 [..., ci, co] (patch) or [ci, co]
    (block matmuls), "s_w" f32 [co], "b" f32 [co]}; ``scales``: site ->
    f32 [ci]; ``consts``: the bf16 remainder (cls/pos tables, ln_pre/
    ln_post affines, final proj).  A pytree — pass it as a jit argument,
    never close over it (the axon compile relay rejects large
    constants)."""

    units: Dict[str, dict]
    scales: Dict[str, jax.Array]
    consts: Dict[str, jax.Array]


def calibrate_vit_amax(vit, params, batches, pixel_mean, pixel_std):
    """Per-channel abs-max at every quantized-matmul input over
    calibration batches ([B,H,W,3] uint8 or pre-normalized float),
    elementwise max across batches on the host."""

    @jax.jit
    def one_batch(params, pixels):
        if pixels.dtype == jnp.uint8:
            pixels = preprocess_pixels(pixels, None, pixel_mean, pixel_std,
                                       jnp.float32)
        record = {}
        _folded_vit_float(vit, params, pixels, record)
        return record

    acc: Dict[str, np.ndarray] = {}
    for pixels in batches:
        rec = jax.device_get(one_batch(params, jnp.asarray(pixels)))
        for site, amax in rec.items():
            prev = acc.get(site)
            acc[site] = amax if prev is None else np.maximum(prev, amax)
    if not acc:
        raise ValueError("calibration needs at least one batch")
    return acc


def quantize_block(bp, site_prefix: str, scales, quantize) -> None:
    """Quantize one TransformerBlock's four matmuls (LN affines folded
    where a LayerNorm feeds the site) — shared by the ViT and text
    towers."""
    for site, dense, ln in ((f"{site_prefix}qkv", "qkv", "ln_1"),
                            (f"{site_prefix}out_proj", "out_proj", None),
                            (f"{site_prefix}c_fc", "c_fc", "ln_2"),
                            (f"{site_prefix}c_proj", "c_proj", None)):
        w = jnp.asarray(bp[dense]["kernel"], jnp.float32)
        b = jnp.asarray(bp[dense]["bias"], jnp.float32)
        s_in = scales[site]
        if ln is not None:
            g = jnp.asarray(bp[ln]["scale"], jnp.float32)
            beta = jnp.asarray(bp[ln]["bias"], jnp.float32)
            quantize(site, (g * s_in)[:, None] * w, beta @ w + b)
        else:
            quantize(site, s_in[:, None] * w, b)


def prepare_int8_vit(vit, params, amax: Dict[str, np.ndarray]) -> Int8ViT:
    """Fold LN affines + per-input-channel activation scales into the
    kernels and quantize per-output-channel (same recipe as
    ``int8_tower.prepare_int8_tower``; symmetric everywhere — the
    transformer has no ReLU edges to exploit asymmetrically)."""
    units: Dict[str, dict] = {}
    scales = {s: jnp.maximum(jnp.asarray(a, jnp.float32), 1e-8) / 127.0
              for s, a in amax.items()}

    def quantize(name, w_eff, bias):
        s_w = jnp.maximum(jnp.max(jnp.abs(w_eff),
                                  axis=tuple(range(w_eff.ndim - 1))),
                          1e-12) / 127.0
        w_q = jnp.clip(jnp.round(w_eff / s_w), -127, 127).astype(jnp.int8)
        units[name] = {"w_q": w_q, "s_w": s_w,
                      "b": bias.astype(jnp.float32)}

    kernel = jnp.asarray(params["patch_embed"]["kernel"], jnp.float32)
    quantize("patch", kernel * scales["patch"][None, None, :, None],
             jnp.zeros((kernel.shape[-1],), jnp.float32))

    for i in range(vit.layers):
        quantize_block(params[f"block_{i}"], f"block_{i}.", scales,
                       quantize)

    consts = {
        "cls": jnp.asarray(params["class_embedding"], jnp.float32),
        "pos": jnp.asarray(params["positional_embedding"], jnp.float32),
        "ln_pre_scale": jnp.asarray(params["ln_pre"]["scale"], jnp.float32),
        "ln_pre_bias": jnp.asarray(params["ln_pre"]["bias"], jnp.float32),
        "ln_post_scale": jnp.asarray(params["ln_post"]["scale"],
                                     jnp.float32),
        "ln_post_bias": jnp.asarray(params["ln_post"]["bias"], jnp.float32),
        "proj": jnp.asarray(params["proj"], jnp.bfloat16),
    }
    return Int8ViT(units=units, scales=scales, consts=consts)


# ---------------------------------------------------------------------------
# int8 inference graph
# ---------------------------------------------------------------------------

def _requant_rowdyn(x, s_ci):
    """f32 [..., ci] -> (int8, row scale f32 [..., 1]).

    Two-level quantization: the static calibrated per-channel scale
    ``s_ci`` (folded into the weights like int8_tower) sets the RELATIVE
    channel weighting, and a dynamic per-token scale stretches each
    token's normalized values across the full int8 range.  The dynamic
    scale is what the conv tower couldn't afford (its epilogue tax was
    the ceiling) but a ViT gets almost free: one VPU row-max over an
    activation that is tiny next to the >=768-deep matmul it feeds, and
    the scale multiplies into the existing f32 epilogue.  It matters
    because the transformer's unnormalized tensors (attention outputs,
    GELU outputs) have per-token ranges far below the calibration
    abs-max — static-only quantization wastes most of the 8 bits on
    them."""
    xn = x * jax.lax.reciprocal(s_ci)
    r = jnp.maximum(jnp.max(jnp.abs(xn), axis=-1, keepdims=True),
                    1e-6) * (1.0 / 127.0)
    v = xn * jax.lax.reciprocal(r)
    # round-half-away via +-0.5-and-truncate (see int8_tower._requant)
    v = v + jnp.where(v >= 0, 0.5, -0.5)
    q = jnp.clip(v, -127.0, 127.0).astype(jnp.int8)
    return q, r


def _int8_matmul(tower: Int8ViT, site: str, xq, row_scale=None,
                 out_dtype=jnp.float32):
    """int8 x int8 -> int32 -> epilogue (``*s_w [*r_row] + b``).

    The int32 -> scale decode runs in f32 (an int32 accumulator cast
    straight to bf16 would lose 0.4% relative — the size of the int8
    error itself); the result is emitted at ``out_dtype`` BEFORE the bias
    add and the downstream GELU/requant chain, so on the production bf16
    tower the wide [B, S, 4W] FFN tensors cross HBM at half the bytes.
    Tests run the whole graph in f32 (vit.dtype), where this is a
    no-op."""
    u = tower.units[site]
    y = lax.dot_general(xq, u["w_q"], (((xq.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * u["s_w"]
    if row_scale is not None:
        y = y * row_scale
    return y.astype(out_dtype) + u["b"].astype(out_dtype)


def _prequant(x, s_ci, op: str):
    """(LN | GELU | identity) + two-level requant.

    Default is the plain XLA composition — a MEASURED negative result
    for the Pallas one-pass kernel (`ops/quant_pallas.py`).  The kernel
    wins the isolated-op probe at LN sites (0.112 vs 0.312 ms at the
    ViT-B/16 qkv shape) but LOSES at encode level: ViT-B/16 bs128
    32.4 ms with the kernel at the LN sites only, 56.8 ms with it at
    every site, vs 29.0 ms pure-XLA (BENCH_STAGES methodology,
    same chip, same run family).  XLA recomputes the cheap
    normalize into both the row-max reduction and the quantize
    fusions, so the composed form pays one extra HBM *read* of the
    activation — not the full extra pass the probe's standalone
    composition paid — and the custom-call boundary (layout pins,
    lost epilogue fusion with the surrounding int8 matmuls) costs
    more than that read saves.  ``TEXTREID_FUSED_REQUANT=1``
    re-enables the kernel at LN sites for re-probing."""
    if op == "ln":
        if (os.environ.get("TEXTREID_FUSED_REQUANT") == "1"
                and jax.default_backend() == "tpu"):
            from ..ops.quant_pallas import fused_requant, requant_eligible

            if requant_eligible(x):
                return fused_requant(x, s_ci, op="ln")
        x = _norm_no_affine(x)
    elif op == "gelu":
        x = _quick_gelu(x)  # at the tower dtype, like XLA's epilogue fuse
    return _requant_rowdyn(x.astype(jnp.float32), s_ci)


def _fused_ffn_wanted(tower, site_prefix: str, override=None,
                      default: bool = False) -> bool:
    """Gate for the fused int8-FFN Pallas kernel
    (`ops/int8_mm_pallas.py`): TPU backend, eligible shapes (lane-aligned
    dims, weights resident in VMEM), and the mode.  ``override``: None
    resolves ``TEXTREID_FUSED_INT8_FFN`` ("on"/"off", forcing both
    towers) and falls back to the caller's measured per-tower
    ``default``; a bool forces the caller's choice (the A/B driver).

    Measured defaults (tools/int8_ffn_ab.py, two on-chip runs each, v5e):
    text tower ON — bs128xT105 encode 8.61->8.08 / 8.66->8.28 ms (~4-6%;
    at S=105 the [B*S, 2048] GELU slab's requant round-trip is a larger
    step fraction); ViT tower OFF — bs128 384x128 encode 27.30->27.10 /
    27.24->27.27 ms, a wash (its wider [25216, 3072] slab already
    amortizes the XLA epilogue better, and the custom-call boundary
    gives the win back)."""
    if override is None:
        env = os.environ.get("TEXTREID_FUSED_INT8_FFN", "")
        override = default if env not in ("on", "off") else env == "on"
    if not override or jax.default_backend() != "tpu":
        return False
    from ..ops.int8_mm_pallas import ffn_eligible

    w1 = tower.units[f"{site_prefix}c_fc"]["w_q"]
    w2 = tower.units[f"{site_prefix}c_proj"]["w_q"]
    return ffn_eligible(w1.shape[0], w1.shape[1], w2.shape[1])


def int8_block_apply(h, tower, site_prefix: str, heads: int, fdt,
                     causal: bool = False, fused_ffn=None,
                     fused_ffn_default: bool = False):
    """One TransformerBlock in int8-dataflow form (shared by the ViT and
    text towers; the residual stream ``h`` stays at the tower dtype)."""
    q8, rq = _prequant(h, tower.scales[f"{site_prefix}qkv"], "ln")
    qkv = _int8_matmul(tower, f"{site_prefix}qkv", q8, rq, fdt)
    attn = _attention(qkv, heads, causal)
    a8, ra = _prequant(attn, tower.scales[f"{site_prefix}out_proj"],
                       "none")
    h = h + _int8_matmul(tower, f"{site_prefix}out_proj", a8, ra, fdt)

    f8, rf = _prequant(h, tower.scales[f"{site_prefix}c_fc"], "ln")
    if _fused_ffn_wanted(tower, site_prefix, fused_ffn, fused_ffn_default):
        from ..ops.int8_mm_pallas import fused_int8_ffn

        u1 = tower.units[f"{site_prefix}c_fc"]
        u2 = tower.units[f"{site_prefix}c_proj"]
        return h + fused_int8_ffn(
            f8, u1["w_q"], u1["s_w"], u1["b"], rf,
            tower.scales[f"{site_prefix}c_proj"],
            u2["w_q"], u2["s_w"], u2["b"], out_dtype=fdt)
    # the [B, S, 4W] GELU tensor lives at the tower dtype: its
    # materialization + the requant row-max/round passes over it are
    # the widest VPU traffic in the graph
    ff = _int8_matmul(tower, f"{site_prefix}c_fc", f8, rf, fdt)
    g8, rg = _prequant(ff, tower.scales[f"{site_prefix}c_proj"], "gelu")
    return h + _int8_matmul(tower, f"{site_prefix}c_proj", g8, rg, fdt)


def int8_vit_apply(vit: VisionTransformer, tower: Int8ViT, x,
                   fused_ffn=None) -> jax.Array:
    """Normalized float pixels [B,H,W,3] -> [B, output_dim] embeddings.
    Every block matmul consumes int8; the residual stream and attention
    stay in the module's float dtype (bf16 in production — the same
    carrier the float tower uses, so it adds no error relative to it)."""
    batch = x.shape[0]
    w = vit.width
    fdt = vit.dtype

    # The patchify conv contracts over the whole receptive field, so its
    # dynamic scale must be uniform over everything contracted: one scale
    # per image (max over H, W, C of the channel-normalized pixels).
    xn = x.astype(jnp.float32) * jax.lax.reciprocal(tower.scales["patch"])
    r_img = jnp.maximum(jnp.max(jnp.abs(xn), axis=(1, 2, 3), keepdims=True),
                        1e-6) * (1.0 / 127.0)
    v = xn * jax.lax.reciprocal(r_img)
    v = v + jnp.where(v >= 0, 0.5, -0.5)
    xq = jnp.clip(v, -127.0, 127.0).astype(jnp.int8)
    u = tower.units["patch"]
    dn = lax.conv_dimension_numbers(xq.shape, u["w_q"].shape,
                                    ("NHWC", "HWIO", "NHWC"))
    h = lax.conv_general_dilated(xq, u["w_q"], (vit.patch_size,) * 2,
                                 "VALID", dimension_numbers=dn,
                                 preferred_element_type=jnp.int32)
    h = (h.astype(jnp.float32) * u["s_w"] * r_img).reshape(batch, -1, w)

    h = jnp.concatenate(
        [jnp.broadcast_to(tower.consts["cls"], (batch, 1, w)), h], axis=1)
    h = h + tower.consts["pos"][None]
    h = (_norm_no_affine(h) * tower.consts["ln_pre_scale"]
         + tower.consts["ln_pre_bias"]).astype(fdt)

    for i in range(vit.layers):
        h = int8_block_apply(h, tower, f"block_{i}.", vit.heads, fdt,
                             fused_ffn=fused_ffn)

    cls_out = (_norm_no_affine(h[:, 0]) * tower.consts["ln_post_scale"]
               + tower.consts["ln_post_bias"])
    return cls_out.astype(fdt) @ tower.consts["proj"].astype(fdt)


# ---------------------------------------------------------------------------
# Serving integration
# ---------------------------------------------------------------------------

def build_int8_vit_encoder(model, state, calib_batches):
    """Calibrate + prepare, returning ``(encode, tower)``: ``encode`` is a
    jitted ``(state, tower, pixels, erase) -> normalized embeddings``
    drop-in for serving.RetrievalIndex's image encoder (mirror of
    ``int8_tower.build_int8_encoder`` for the ViT family)."""
    visual = model.visual
    if not isinstance(visual, VisionTransformer):
        raise NotImplementedError(
            f"int8 ViT encoder needs a VisionTransformer tower; got "
            f"{type(visual).__name__}")
    vparams = state.params["visual"]
    amax = calibrate_vit_amax(visual, vparams, calib_batches,
                              model.pixel_mean, model.pixel_std)
    tower = prepare_int8_vit(visual, vparams, amax)

    from .losses import l2_normalize

    @jax.jit
    def encode(state, tower, pixels, erase):
        # uint8 = raw pixels needing on-device normalization; float =
        # already normalized (same contract as CompositeModel.encode_image
        # — double-normalizing would land far outside the calibrated
        # ranges, a silently garbage index).
        if pixels.dtype == jnp.uint8:
            x = preprocess_pixels(pixels, erase, model.pixel_mean,
                                  model.pixel_std, jnp.float32)
        else:
            x = pixels.astype(jnp.float32)
        feat = int8_vit_apply(visual, tower, x)
        emb = model.apply({"params": state.params}, feat,
                          method="embed_image")
        return l2_normalize(emb.astype(jnp.float32), axis=1)

    return encode, tower
