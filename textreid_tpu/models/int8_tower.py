"""True int8-dataflow visual tower: int8 activations BETWEEN convs.

The interceptor quantizer (``models/quant_tower.py``) re-quantizes around
every conv — a dynamic amax reduction, a quantize pass and a dequantize
pass per layer — which eats two-thirds of the confirmed 1.8x int8 MXU
headroom on this chip (it measures 1.16x).  This module is the full
dataflow design: a post-training-quantized inference graph (see the
bullet list below).

**Measured outcome (v5e, bs128 384x128 RN50): 1.31x vs the bf16 tower
(13.7 -> 10.5 ms) at min embedding cosine 0.9998.**  The gap to the
MAC-level 1.8x is a measured hardware property, not a design gap: the
VPU processes s8 elementwise work one-element-per-32-bit-lane, so each
fused requant epilogue costs ~3 ps/element — on big-spatial
narrow-channel layers (stem/layer1) that epilogue exceeds the conv
itself (probed: L1 1x1 int8 conv+requant 0.48 ms vs 0.17 ms for the
plain bf16 conv; the same int8 conv with a bf16-out epilogue is FASTER
than the bf16 conv, 0.21 vs 0.28 ms — the s8 pack is the tax).  Late
wide layers run at 240-307 TF/s, near the int8 MXU peak.  Probed
alternatives that did NOT beat the shipped epilogue: bf16 epilogue
arithmetic, a wrapping s32->s8 + s8-add zero-point shift, and a bf16
mixed front (supported via ``float_blocks``, measures equal after the
epilogue fixes).

The graph:

* every conv+BN pair is folded to one int8 conv (inference-mode BN is the
  affine ``y = g*conv(x) + b`` with ``g = gamma/sqrt(var+eps)``; ``g``
  folds into the kernel, ``b`` into the epilogue bias);
* activations are quantized ONCE per edge with static per-channel scales
  from a calibration pass, and per-INPUT-channel activation scales fold
  into the consumer's kernel for free (``conv(x_q * s[ci], w) ==
  conv(x_q, w * s[ci])``), so the tensors that live in HBM between convs
  are int8 — 4x less traffic than f32, 2x less than bf16 — exactly where
  the bandwidth-bound 1x1 convs gained nothing from the interceptor;
* each conv's epilogue (``int32 -> *s_w[co] -> +b -> relu -> /s_next ->
  round -> int8``, plus the residual add for the block-closing conv) is a
  single fused elementwise chain XLA folds into the conv output — no
  float feature map ever round-trips HBM;
* the anti-alias average pools run on the int8 tensors in integer
  arithmetic (sum of 4 int8 / 4, re-rounded: at most half a quant step of
  extra error);
* the attention pool and embed head stay in the model dtype (bf16): they
  are a rounding error of the tower's cost after the CLS-query collapse.

Only the *serving/offline encode* path uses this graph (gallery index
builds, ``bench.py`` encode legs) — training and the parity eval path
are untouched, mirroring where the reference spends its inference time
(`/root/reference/lib/engine/inference.py:14-26`).

Calibration needs no labeled data: any batches with the serving input
distribution (e.g. the first gallery batches) run through the *folded
float* graph — mathematically the inference-mode float tower — recording
per-channel abs-max at every conv input.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .m_resnet import AttentionPool2d, ModifiedResNet
from .model import preprocess_pixels


class _UnitSpec(NamedTuple):
    """Static description of one folded conv+BN unit."""

    name: str            # also keys the unit's prepared params
    conv: str            # conv param collection name
    bn: str              # bn param/stat collection name
    strides: Tuple[int, int]


class _BlockSpec(NamedTuple):
    name: str
    stride: int
    has_downsample: bool


def _trunk_specs(visual: ModifiedResNet) -> List[_BlockSpec]:
    specs = []
    stage_specs = [
        (visual.width, visual.layers[0], 1),
        (visual.width * 2, visual.layers[1], 2),
        (visual.width * 4, visual.layers[2], 2),
        (visual.width * 8, visual.layers[3], visual.last_stride),
    ]
    in_ch = visual.width
    for stage, (planes, blocks, stride) in enumerate(stage_specs, start=1):
        for block in range(blocks):
            s = stride if block == 0 else 1
            out_ch = planes * 4
            specs.append(_BlockSpec(
                name=f"layer{stage}_{block}",
                stride=s,
                has_downsample=(s > 1 or in_ch != out_ch),
            ))
            in_ch = out_ch
    return specs


def _fold_bn(conv_params, bn_params, bn_stats, eps=1e-5):
    """Inference-mode conv+BN -> (folded f32 kernel, f32 bias)."""
    kernel = jnp.asarray(conv_params["kernel"], jnp.float32)
    g = jnp.asarray(bn_params["scale"], jnp.float32) / jnp.sqrt(
        jnp.asarray(bn_stats["var"], jnp.float32) + eps)
    b = jnp.asarray(bn_params["bias"], jnp.float32) - jnp.asarray(
        bn_stats["mean"], jnp.float32) * g
    return kernel * g, b


def _conv_pad(kernel) -> list:
    kh, kw = kernel.shape[0], kernel.shape[1]
    return [(kh // 2, kh // 2), (kw // 2, kw // 2)]


def _conv(x, kernel, strides, preferred=None):
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, kernel, strides, _conv_pad(kernel), dimension_numbers=dn,
        preferred_element_type=preferred,
    )


def _record_amax(record: dict, site: str, x) -> None:
    record[site] = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(0, 1, 2))


def _avg_pool_f32(x):
    """2x2 average pool in the operand's float dtype."""
    summed = lax.reduce_window(x, jnp.asarray(0, x.dtype), lax.add,
                               (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return summed / 4.0


def _avg_pool_int8(xq):
    """2x2 average pool on int8 values, scale-preserving: the integer sum
    of four int8 lanes / 4, re-rounded (<= half a quant step of error).
    Pure integer arithmetic: ``(sum + 2) >> 2`` is floor((sum+2)/4) =
    round-half-up of sum/4, for negatives too (arithmetic shift)."""
    summed = lax.reduce_window(xq.astype(jnp.int32), 0, lax.add,
                               (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    avg = jax.lax.shift_right_arithmetic(summed + 2, 2)
    # [-128, 127]: zero-point-128 tensors legitimately reach -128 (true 0)
    return jnp.clip(avg, -128, 127).astype(jnp.int8)


def _is_asym_site(site: str) -> bool:
    """Sites whose ONLY consumers are unpadded 1x1 convs carry ReLU
    outputs as zero-point-128 uint8-in-int8: ``x ~ (q + 128) * s`` with
    ``s = amax/254`` — twice the resolution of symmetric int8 on a
    non-negative tensor, and EXACT for 1x1 convs (no padding cells, so the
    +128 shift folds into a per-channel bias computed from the quantized
    kernel at prepare time).  Block-internal ``.conv1``/``.conv3`` inputs
    qualify — including every wide block-boundary tensor; 3x3 consumers
    (stem, ``.conv2``) stay symmetric (zero padding must decode to 0)."""
    return "." in site and site.rsplit(".", 1)[1] in ("conv1", "conv3")


def _requant(y_f, scale, asym: bool = False):
    """f32 activation -> int8 at per-channel ``scale``.

    Symmetric: ``q = round(y/s)`` in [-127, 127] (s = amax/127).
    Asymmetric (ReLU outputs): ``q = round(y/s) - 128`` in [-128, 126]
    (s = amax/254), decoding as ``(q + 128) * s``."""
    inv = jax.lax.reciprocal(scale).astype(y_f.dtype)
    v = y_f * inv
    # round via +-0.5-and-truncate: jnp.round (round-half-even) costs ~30%
    # of the whole fused conv+epilogue on-chip (probed: 0.51 -> 0.35 ms on
    # a layer1-sized output); float->int conversion truncates toward zero,
    # so +-0.5 makes it round-half-away — identical except at exact .5
    # boundaries, immaterial against the quantization step itself.
    if asym:
        # non-negative (ReLU) values: clamp first so the +0.5 never
        # overflows the conversion, truncate, then shift the zero point
        v = jnp.clip(v, 0.0, 254.0) + jnp.asarray(0.5, v.dtype)
        return (v.astype(jnp.int32) - 128).astype(jnp.int8)
    half = jnp.asarray(0.5, v.dtype)
    v = v + jnp.where(v >= 0, half, -half)
    v = jnp.clip(v, -127.0, 127.0)
    return v.astype(jnp.int32).astype(jnp.int8)


# ---------------------------------------------------------------------------
# Folded float graph (calibration / agreement reference)
# ---------------------------------------------------------------------------

def _stem_units() -> List[_UnitSpec]:
    return [
        _UnitSpec("conv1", "conv1", "bn1", (2, 2)),
        _UnitSpec("conv2", "conv2", "bn2", (1, 1)),
        _UnitSpec("conv3", "conv3", "bn3", (1, 1)),
    ]


def _folded_trunk_float(visual, params, stats, x, record: Optional[dict]):
    """Inference-mode float trunk with conv+BN folded — mathematically the
    float tower's eval forward; optionally records per-channel abs-max at
    every conv input (the calibration sites of the int8 graph)."""
    rec = (lambda s, v: _record_amax(record, s, v)) if record is not None \
        else (lambda s, v: None)
    x = x.astype(jnp.float32)
    specs = _trunk_specs(visual)
    for unit in _stem_units():
        w, b = _fold_bn(params[unit.conv], params[unit.bn],
                        stats[unit.bn])
        rec(unit.name, x)
        x = jax.nn.relu(_conv(x, w, unit.strides) + b)
    # the first block's input site is recorded PRE-pool: the int8 graph
    # quantizes the stem output before the (scale-preserving) integer
    # pool, and pre-pool values exceed the post-pool max — recording
    # post-pool would systematically clip them
    rec(f"{specs[0].name}.conv1", x)
    x = _avg_pool_f32(x)

    for bi, spec in enumerate(specs):
        bp, bs = params[spec.name], stats[spec.name]
        w1, b1 = _fold_bn(bp["conv1"], bp["bn1"], bs["bn1"])
        w2, b2 = _fold_bn(bp["conv2"], bp["bn2"], bs["bn2"])
        w3, b3 = _fold_bn(bp["conv3"], bp["bn3"], bs["bn3"])
        if bi > 0:
            rec(f"{spec.name}.conv1", x)
        out = jax.nn.relu(_conv(x, w1, (1, 1)) + b1)
        rec(f"{spec.name}.conv2", out)
        out = jax.nn.relu(_conv(out, w2, (1, 1)) + b2)
        if spec.stride > 1:
            rec(f"{spec.name}.conv3", out)  # pre-pool site (see int8 pool)
            out = _avg_pool_f32(out)
        else:
            rec(f"{spec.name}.conv3", out)
        out = _conv(out, w3, (1, 1)) + b3
        identity = x
        if spec.has_downsample:
            if spec.stride > 1:
                identity = _avg_pool_f32(identity)
            wd, bd = _fold_bn(bp["downsample_conv"], bp["downsample_bn"],
                              bs["downsample_bn"])
            identity = _conv(identity, wd, (1, 1)) + bd
            # downsample OUTPUT site (symmetric — pre-ReLU, signed): the
            # int8 graph requantizes this branch so the residual add reads
            # an s8 tensor, not the conv's s32 accumulator.  Two convs
            # feed one add, and a fusion can own only one of them — the
            # other's s32 feature map would round-trip HBM at 4x the
            # bytes (observed on-chip: a 402 MB s32 write at layer1).
            rec(f"{spec.name}.downsample_out", identity)
        x = jax.nn.relu(out + identity)
    return x


# ---------------------------------------------------------------------------
# Preparation: calibration + weight quantization
# ---------------------------------------------------------------------------

class Int8Tower(NamedTuple):
    """Prepared int8 trunk: quantized folded weights + static act scales.

    ``units``: name -> {"w_q" int8 [kh,kw,ci,co], "s_w" f32 [co],
    "b" f32 [co]}; ``scales``: conv-input site -> f32 [ci] (amax/127).
    A pytree — pass it as a jit argument, never close over it (the axon
    compile relay rejects large constants)."""

    units: Dict[str, dict]
    scales: Dict[str, jax.Array]


def calibrate_amax(visual, params, stats, batches, pixel_mean, pixel_std):
    """Per-channel abs-max at every conv input over calibration batches.

    ``batches``: iterable of [B,H,W,3] uint8 or pre-normalized float
    arrays.  Returns {site: np.ndarray [ci]} (elementwise max across
    batches, accumulated on the host)."""

    @jax.jit
    def one_batch(params, stats, pixels):
        if pixels.dtype == jnp.uint8:
            pixels = preprocess_pixels(pixels, None, pixel_mean, pixel_std,
                                       jnp.float32)
        record = {}
        _folded_trunk_float(visual, params, stats, pixels, record)
        return record

    acc: Dict[str, np.ndarray] = {}
    for pixels in batches:
        rec = jax.device_get(one_batch(params, stats, jnp.asarray(pixels)))
        for site, amax in rec.items():
            prev = acc.get(site)
            acc[site] = amax if prev is None else np.maximum(prev, amax)
    if not acc:
        raise ValueError("calibration needs at least one batch")
    return acc


def prepare_int8_tower(visual, params, stats, amax: Dict[str, np.ndarray],
                       float_blocks: int = 0) -> Int8Tower:
    """Fold BN, fold per-input-channel activation scales into the kernels,
    and quantize weights per-output-channel.

    ``float_blocks`` keeps the stem and the first N bottleneck blocks in
    folded bf16 instead of int8 (``int8_trunk_apply`` must be called with
    the same value).  Measured motivation (v5e): on big-spatial /
    narrow-channel layers the fused requant epilogue's per-element VPU
    cost (s32->f32 convert + scale + round + s8 pack, ~4-5 ps/element)
    exceeds the conv itself — an L1 1x1 int8 conv+epilogue probed 0.48 ms
    vs 0.17 ms for the plain bf16 conv — while wide late-stage convs run
    near the int8 MXU peak.  Mixed precision keeps int8 where the MXU
    wins and bf16 where the epilogue would eat it."""
    units = {}
    site_scale = {
        s: jnp.maximum(jnp.asarray(a, jnp.float32), 1e-8)
        / (254.0 if _is_asym_site(s) else 127.0)
        for s, a in amax.items()
    }

    def make_unit(name, conv_p, bn_p, bn_s, in_site):
        w, b = _fold_bn(conv_p, bn_p, bn_s)
        # fold the input activation scale: conv(x, w*s[ci]) == conv(x*s, w)
        w_eff = w * site_scale[in_site][None, None, :, None]
        s_w = jnp.maximum(jnp.max(jnp.abs(w_eff), axis=(0, 1, 2)),
                          1e-12) / 127.0
        w_q = jnp.clip(jnp.round(w_eff / s_w), -127, 127).astype(jnp.int8)
        if _is_asym_site(in_site):
            # zero-point correction: the consumer sees q = x/s - 128, so
            # conv(x/s, w) = conv(q, w) + 128 * sum_{kh,kw,ci} w.  Using
            # the QUANTIZED kernel makes the correction exact for what the
            # int8 conv actually computes.  Only valid because these convs
            # are unpadded 1x1s (a padding cell would decode to 128*s).
            b = b + 128.0 * s_w * jnp.sum(
                w_q.astype(jnp.float32), axis=(0, 1, 2))
        units[name] = {"w_q": w_q, "s_w": s_w, "b": b}

    def make_float_unit(name, conv_p, bn_p, bn_s):
        w, b = _fold_bn(conv_p, bn_p, bn_s)
        units[name] = {"w": w.astype(jnp.bfloat16), "b": b}

    stem_float = float_blocks > 0
    for unit in _stem_units():
        if stem_float:
            make_float_unit(unit.name, params[unit.conv], params[unit.bn],
                            stats[unit.bn])
        else:
            make_unit(unit.name, params[unit.conv], params[unit.bn],
                      stats[unit.bn], unit.name)
    for bi, spec in enumerate(_trunk_specs(visual)):
        bp, bs = params[spec.name], stats[spec.name]
        if bi < float_blocks:
            make_float_unit(f"{spec.name}.conv1", bp["conv1"], bp["bn1"],
                            bs["bn1"])
            make_float_unit(f"{spec.name}.conv2", bp["conv2"], bp["bn2"],
                            bs["bn2"])
            make_float_unit(f"{spec.name}.conv3", bp["conv3"], bp["bn3"],
                            bs["bn3"])
            if spec.has_downsample:
                make_float_unit(f"{spec.name}.downsample",
                                bp["downsample_conv"], bp["downsample_bn"],
                                bs["downsample_bn"])
            continue
        make_unit(f"{spec.name}.conv1", bp["conv1"], bp["bn1"], bs["bn1"],
                  f"{spec.name}.conv1")
        make_unit(f"{spec.name}.conv2", bp["conv2"], bp["bn2"], bs["bn2"],
                  f"{spec.name}.conv2")
        make_unit(f"{spec.name}.conv3", bp["conv3"], bp["bn3"], bs["bn3"],
                  f"{spec.name}.conv3")
        if spec.has_downsample:
            # the downsample conv consumes the block input (same site as
            # conv1; the anti-alias pool between them is scale-preserving)
            make_unit(f"{spec.name}.downsample", bp["downsample_conv"],
                      bp["downsample_bn"], bs["downsample_bn"],
                      f"{spec.name}.conv1")
    return Int8Tower(units=units, scales=site_scale)


# ---------------------------------------------------------------------------
# int8 inference graph
# ---------------------------------------------------------------------------

def _int8_unit(tower: Int8Tower, name: str, xq, strides,
               ep_dtype=jnp.float32):
    """int8 conv -> ``ep_dtype`` epilogue value (``*s_w + b`` applied)."""
    u = tower.units[name]
    y = _conv(xq, u["w_q"], strides, preferred=jnp.int32)
    return (y.astype(ep_dtype) * u["s_w"].astype(ep_dtype)
            + u["b"].astype(ep_dtype))


def _float_unit(tower: Int8Tower, name: str, xf, strides):
    """Folded bf16 conv+BN unit (mixed-precision front of the tower).

    Output stays bf16 — an f32 accumulator output would double every
    activation's HBM traffic (measured: a float front carried in f32 made
    the mixed tower SLOWER than the all-bf16 tower)."""
    u = tower.units[name]
    y = _conv(xf.astype(jnp.bfloat16), u["w"], strides)
    return y + u["b"].astype(jnp.bfloat16)


def int8_trunk_apply(visual, tower: Int8Tower, x,
                     epilogue_dtype=jnp.float32,
                     float_blocks: int = 0) -> jax.Array:
    """Normalized float pixels [B,H,W,3] -> float trunk features
    [B,h,w,C].  Inter-conv tensors are int8 in the quantized region; each
    epilogue is one fused elementwise chain on the conv output.

    ``float_blocks`` (must match ``prepare_int8_tower``) keeps the stem
    and the first N bottleneck blocks in folded bf16 — see the prepare
    docstring for the measured motivation.  ``epilogue_dtype`` selects
    the arithmetic dtype of the fused requant chains."""
    ep = epilogue_dtype
    specs = _trunk_specs(visual)

    def requant_to(y, site):
        return _requant(y.astype(ep), tower.scales[site].astype(ep),
                        _is_asym_site(site))

    xq = xf = None
    if float_blocks > 0:
        xf = x.astype(jnp.bfloat16)
        for unit in _stem_units():
            xf = jax.nn.relu(_float_unit(tower, unit.name, xf,
                                         unit.strides))
        xf = _avg_pool_f32(xf)
    else:
        xq = requant_to(x, "conv1")
        first_site = specs[0].name + ".conv1"
        for unit, nxt in zip(_stem_units(), ["conv2", "conv3", first_site]):
            y = jax.nn.relu(_int8_unit(tower, unit.name, xq, unit.strides,
                                       ep))
            xq = requant_to(y, nxt)
        xq = _avg_pool_int8(xq)

    for i, spec in enumerate(specs):
        n = spec.name
        next_site = (specs[i + 1].name + ".conv1"
                     if i + 1 < len(specs) else None)
        if i < float_blocks:
            f1 = jax.nn.relu(_float_unit(tower, f"{n}.conv1", xf, (1, 1)))
            f2 = jax.nn.relu(_float_unit(tower, f"{n}.conv2", f1, (1, 1)))
            if spec.stride > 1:
                f2 = _avg_pool_f32(f2)
            f3 = _float_unit(tower, f"{n}.conv3", f2, (1, 1))
            identity = xf
            if spec.has_downsample:
                if spec.stride > 1:
                    identity = _avg_pool_f32(identity)
                identity = _float_unit(tower, f"{n}.downsample", identity,
                                       (1, 1))
            xf = jax.nn.relu(f3 + identity)
            if i + 1 == float_blocks and next_site is not None:
                xq = requant_to(xf, next_site)  # float -> int8 boundary
            if next_site is None:
                return xf
            continue
        y1 = jax.nn.relu(_int8_unit(tower, f"{n}.conv1", xq, (1, 1), ep))
        q2 = requant_to(y1, f"{n}.conv2")
        y2 = jax.nn.relu(_int8_unit(tower, f"{n}.conv2", q2, (1, 1), ep))
        q3 = requant_to(y2, f"{n}.conv3")
        if spec.stride > 1:
            q3 = _avg_pool_int8(q3)
        y3 = _int8_unit(tower, f"{n}.conv3", q3, (1, 1), ep)
        if spec.has_downsample:
            idq = _avg_pool_int8(xq) if spec.stride > 1 else xq
            ds_f = _int8_unit(tower, f"{n}.downsample", idq, (1, 1), ep)
            # requantize the branch so the residual add reads s8, not the
            # conv's s32 accumulator: two convs feed one add and a fusion
            # can own only one — the other's s32 map would round-trip HBM
            # at 4x the bytes (observed: 402 MB at layer1)
            s_ds = tower.scales[f"{n}.downsample_out"]
            ds_q = _requant(ds_f, s_ds.astype(ep))
            id_f = ds_q.astype(ep) * s_ds.astype(ep)
        else:
            # dequantize the residual inline (per-channel scale multiply
            # + the zero-point shift, fused into the add/relu/requant
            # chain); the block-input site is always asymmetric
            id_f = (xq.astype(ep) + jnp.asarray(128.0, ep)) * \
                tower.scales[f"{n}.conv1"].astype(ep)
        out = jax.nn.relu(y3 + id_f)
        if next_site is None:
            return out  # float: feeds the bf16 attention pool
        xq = requant_to(out, next_site)
    raise AssertionError("unreachable")


# ---------------------------------------------------------------------------
# Serving integration
# ---------------------------------------------------------------------------

def build_int8_encoder(model, state, calib_batches,
                       epilogue_dtype=jnp.float32,
                       float_blocks: int = 0):
    """Calibrate + prepare, returning ``(encode, tower)`` where ``encode``
    is a jitted ``(state, tower, pixels, erase) -> normalized embeddings``
    drop-in for the float/interceptor encoders (serving.RetrievalIndex).

    ``calib_batches``: iterable of [B,H,W,3] uint8 batches with the
    serving input distribution (first gallery batches work).  The tower is
    returned separately so replicas can reuse it without recalibrating.

    Reference hot path being accelerated:
    `/root/reference/lib/engine/inference.py:14-26`.
    """
    visual = model.visual
    if not isinstance(visual, ModifiedResNet):
        raise NotImplementedError(
            f"int8 dataflow tower supports ModifiedResNet (m_resnet50/101); "
            f"got {type(visual).__name__} — use models.quant_tower's "
            f"interceptors for other towers")
    vparams = state.params["visual"]
    vstats = state.batch_stats["visual"]
    amax = calibrate_amax(visual, vparams, vstats, calib_batches,
                          model.pixel_mean, model.pixel_std)
    tower = prepare_int8_tower(visual, vparams, vstats, amax,
                               float_blocks=float_blocks)

    pool = AttentionPool2d(
        spacial_dim=visual.final_grid,
        embed_dim=visual.width * 32,
        num_heads=visual.heads,
        output_dim=visual.output_dim,
        dtype=visual.dtype,
    )

    from .losses import l2_normalize

    @jax.jit
    def encode(state, tower, pixels, erase):
        # Same input convention as CompositeModel.encode_image
        # (model.py:146): uint8 means raw pixels that need on-device
        # normalization; float means already normalized.  Normalizing
        # unconditionally would double-normalize f32 gallery batches into
        # values far outside the calibrated activation ranges — a silently
        # garbage index.
        if pixels.dtype == jnp.uint8:
            x = preprocess_pixels(pixels, erase, model.pixel_mean,
                                  model.pixel_std, jnp.float32)
        else:
            x = pixels.astype(jnp.float32)
        feat = int8_trunk_apply(visual, tower, x,
                                epilogue_dtype=epilogue_dtype,
                                float_blocks=float_blocks)
        feat = pool.apply({"params": vparams_attnpool(state)},
                          feat.astype(visual.dtype))
        emb = model.apply({"params": state.params}, feat,
                          method="embed_image")
        return l2_normalize(emb.astype(jnp.float32), axis=1)

    def vparams_attnpool(state):
        return state.params["visual"]["attnpool"]

    return encode, tower
