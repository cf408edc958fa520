"""Pallas TPU kernel: fused multi-head attention for the transformer towers.

The ViT visual tower and the CLIP text tower compute attention with
``jax.nn.dot_product_attention`` (models/vit.py:TransformerBlock), which XLA
lowers to two dots plus a softmax over a materialized ``[B, H, S, S]``
logits tensor.  At the flagship shapes (ViT-B/16 on 384x128 crops:
B=128, H=12, S=193) that tensor is ~57M elements **per layer**, and XLA's
lowering streams it through HBM several times (logits write, max/sum
reduce, normalize, PV read) — measured ~45% of the tower's non-matmul
time while the attention matmuls themselves are only ~4% of its FLOPs.

This kernel keeps the whole score tile on-chip.  Person-ReID transformer
sequences are short (S <= 256), so no online-softmax/flash rescaling is
needed: one program computes softmax(QK^T * scale) V for a block of
``block_batch`` samples x one head entirely in VMEM, and the ``[S, S]``
scores never touch HBM.

Zero-copy head slicing: the kernel consumes the fused QKV projection
output ``[B, S, 3W]`` DIRECTLY.  In the shipped ``pair`` layout, q/k/v
arrive as 128-lane blocks of the slab holding ``128/head_dim`` whole
heads at lane-aligned offsets (legal for Mosaic, unlike the per-head
64-lane-offset ``fused`` layout, which fails to lower on hardware) and
the kernel slices heads out of the block in VMEM — the ``jnp.split``,
the ``[B, S, H, D]`` reshape, and the head transpose all vanish from the
XLA graph (each was an HBM round-trip of the full activation).  The
``split`` layout is the always-legal fallback: tile-conservative
[B*H, S, D] operands at the price of one physical transpose pass per
tensor on each side of the call.

Numerics follow ``jax.nn.dot_product_attention``'s published semantics:
logits and softmax in f32 regardless of input dtype, probabilities cast
back to the input dtype for the PV matmul with f32 accumulation.

Training: ``hybrid_attention`` wraps the kernel in a custom VJP.  The
backward is the Pallas backward kernel by default (scores recomputed in
VMEM, dqkv emitted through the same head slabs — probabilities are never
stored as residuals nor re-streamed); ``pallas_bwd=False`` falls back to
differentiating the bit-equivalent XLA formulation, the conservative
pattern ``ops/gru_pallas.make_hybrid_scan`` uses.  ``pallas_fwd=False``
pairs the XLA forward with the Pallas backward — it mattered when the
split layout's forward lost to XLA's fused formulation; with the pair
layout the kernel wins both directions outright (ViT-B/16 probe: fwd
0.676 ms vs XLA 1.670, bwd 1.206 vs 4.165).

Both kernels are mesh-native: a ``custom_partitioning`` rule shares only
the batch factor, so a batch-sharded jit runs one kernel per device on
its local shard (GSPMD's default for opaque custom calls is to replicate
them behind all-gathers — measured 15 in the 8-way sharded HLO).

Reference being re-designed: the torch towers in the upstream repo use
``nn.MultiheadAttention``-style composition inside CLIP's ResNet attnpool
(`/root/reference/lib/models/backbones/m_resnet.py:20-64`); the upstream
repo ships no transformer tower at all — this kernel serves the
beyond-reference ViT/full-CLIP family.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block_batch(batch: int, requested: int, seq: int = 0,
                      score_tiles: int = 2,
                      vmem_budget: int = 8 * 1024 * 1024) -> int:
    """Largest divisor of ``batch`` not exceeding ``requested`` (so grid
    blocks tile the batch exactly and no out-of-bounds rows are read),
    additionally clamped so ``score_tiles`` live f32 [bt, seq, seq] tiles
    fit the VMEM budget — the kernel is a short-sequence design and the
    clamp keeps long-ish sequences (ViT-L/14 at 224x224: S=257) working
    instead of spilling.  Sequences whose single-row tile cannot fit are
    rejected outright: that regime needs an online-softmax (flash)
    kernel, not this one."""
    if seq:
        per_sample = score_tiles * seq * seq * 4
        if per_sample > vmem_budget:
            raise ValueError(
                f"sequence length {seq} needs {per_sample/2**20:.0f} MiB of "
                f"VMEM score tile per sample — beyond this short-sequence "
                f"kernel's regime (S <~ 1000). Use the XLA path "
                f"(TPU.FUSED_ATTENTION False) or an online-softmax kernel.")
        requested = min(requested, max(1, vmem_budget // per_sample))
    bt = max(1, min(requested, batch))
    while batch % bt:
        bt -= 1
    return bt


def _attention_kernel(qkv_q_ref, qkv_k_ref, qkv_v_ref, out_ref,
                      *, scale: float, causal: bool):
    """One program: softmax(q k^T * scale) v for [Bt, S, D] head slabs.

    All three inputs are slices of the SAME [B, S, 3W] qkv array (the
    BlockSpec index maps do the head/tensor selection); the [Bt, S, S]
    score tile lives entirely in registers/VMEM.
    """
    q = qkv_q_ref[:]                      # [Bt, S, D], input dtype
    k = qkv_k_ref[:]
    v = qkv_v_ref[:]
    seq = q.shape[1]

    # logits in f32 (MXU accumulates f32 from bf16 inputs natively)
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                             # [Bt, Sq, Sk]

    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 1)
        s = jnp.where((col <= row)[None], s, -jnp.inf)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                     # [Bt, Sq, D]
    out_ref[:] = (o / denom).astype(out_ref.dtype)


def _validate_qkv(qkv, heads):
    three_w = qkv.shape[-1]
    if three_w % (3 * heads):
        raise ValueError(
            f"qkv last dim {three_w} is not divisible by 3*heads="
            f"{3 * heads}; the [q|k|v] head slicing would misalign.")


def _fused_attention_local(qkv, *, heads: int, causal: bool = False,
                           scale: float | None = None, block_batch: int = 8,
                           interpret: bool = False):
    """The pallas_call itself, on device-local shapes (see
    ``fused_attention`` for the public, mesh-aware entry point)."""
    batch, seq, three_w = qkv.shape
    _validate_qkv(qkv, heads)
    width = three_w // 3
    head_dim = width // heads
    if scale is None:
        scale = float(head_dim) ** -0.5

    bt = _pick_block_batch(batch, block_batch, seq=seq, score_tiles=2)
    grid = (batch // bt, heads)

    # Index maps are in units of BLOCKS of the spec's block_shape: with a
    # last-dim block of head_dim, block index j addresses elements
    # [j*head_dim, (j+1)*head_dim).  q head h -> block h, k -> heads + h,
    # v -> 2*heads + h.
    def q_map(b, h):
        return (b, 0, h)

    def k_map(b, h):
        return (b, 0, heads + h)

    def v_map(b, h):
        return (b, 0, 2 * heads + h)

    head_block = (bt, seq, head_dim)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale, causal=causal),
        grid=grid,
        in_specs=[
            pl.BlockSpec(head_block, q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(head_block, k_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(head_block, v_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(head_block, q_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, seq, width), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return out


def _heads_per_lane_block(width: int, heads: int) -> int:
    """Heads per 128-lane block for the zero-copy ``pair`` layout, or 0
    when the shape is ineligible.

    Mosaic requires last-dim blocks to be multiples of 128 lanes (or the
    whole dim), so per-head ``head_dim``-wide blocks at ``h*head_dim``
    offsets are illegal for head_dim=64 — the reason the original
    ``fused`` layout fails to lower on hardware.  But a 128-lane block IS
    legal, and at head_dim<=128 it holds exactly ``128//head_dim`` whole
    heads; with ``width % 128 == 0`` the q/k/v base offsets inside the
    [B, S, 3W] slab are lane-block-aligned too.  The kernel then slices
    heads out of the loaded block in VMEM (a vector relayout, not an HBM
    pass) — zero copies on either side of the custom call."""
    if width % 128:
        return 0
    head_dim = width // heads
    if head_dim > 128 or 128 % head_dim:
        return 0
    hpb = 128 // head_dim
    if heads % hpb:
        return 0
    return hpb


def _attention_pair_kernel(q_ref, k_ref, v_ref, out_ref,
                           *, scale: float, causal: bool, head_dim: int):
    """Forward for one [Bt, S, 128] lane block = ``128//head_dim`` whole
    heads, sliced out of the block in VMEM.  Same math per head as
    ``_attention_kernel``; the sub-head loop is a static Python loop, so
    each head's [Bt, S, S] score tile is live one at a time."""
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    seq = q.shape[1]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 1)
        keep = (col <= row)[None]
    outs = []
    for i in range(q.shape[2] // head_dim):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, :, sl], k[:, :, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if causal:
            s = jnp.where(keep, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v[:, :, sl],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append((o / denom).astype(out_ref.dtype))
    out_ref[:] = outs[0] if len(outs) == 1 else jnp.concatenate(outs, -1)


def _fused_attention_local_pair(qkv, *, heads: int, causal: bool = False,
                                scale: float | None = None,
                                block_batch: int = 8,
                                interpret: bool = False):
    """Zero-copy layout: 128-lane head-pair blocks over the [B, S, 3W]
    slab (see ``_heads_per_lane_block``).  No ``_split_heads`` transpose
    on the way in and the output is written directly in [B, S, W] layout
    — the slab-sized HBM copies the ``split`` layout pays per layer
    (measured 0.707 ms x 12 layers per tower pass in the ViT-B/16 train
    step breakdown) never exist."""
    batch, seq, three_w = qkv.shape
    _validate_qkv(qkv, heads)
    width = three_w // 3
    head_dim = width // heads
    hpb = _heads_per_lane_block(width, heads)
    if not hpb:
        raise ValueError(
            f"pair layout needs width % 128 == 0 and head_dim | 128 "
            f"(got width={width}, heads={heads}); use layout='split'.")
    if scale is None:
        scale = float(head_dim) ** -0.5

    bt = _pick_block_batch(batch, block_batch, seq=seq, score_tiles=2)
    grid = (batch // bt, heads // hpb)
    lanes_w = width // 128   # lane-block count of one tensor inside the slab

    blk = (bt, seq, 128)
    out = pl.pallas_call(
        functools.partial(_attention_pair_kernel, scale=scale, causal=causal,
                          head_dim=head_dim),
        grid=grid,
        in_specs=[
            pl.BlockSpec(blk, lambda b, p: (b, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda b, p: (b, 0, lanes_w + p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda b, p: (b, 0, 2 * lanes_w + p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(blk, lambda b, p: (b, 0, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, seq, width), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return out


def _split_heads(qkv, heads):
    """[B, S, 3W] -> (q, k, v) each [B*H, S, D] — the tile-conservative
    layout (last block dim == array dim, always legal for Mosaic) behind
    ``layout='split'``.  Costs one physical transpose pass per tensor."""
    batch, seq, three_w = qkv.shape
    width = three_w // 3
    head_dim = width // heads
    q3 = qkv.reshape(batch, seq, 3, heads, head_dim)
    q3 = q3.transpose(2, 0, 3, 1, 4).reshape(3, batch * heads, seq, head_dim)
    return q3[0], q3[1], q3[2]


def _merge_heads(out_bh, batch, heads):
    """[B*H, S, D] -> [B, S, W] (inverse of ``_split_heads`` per tensor)."""
    bh, seq, head_dim = out_bh.shape
    return (out_bh.reshape(batch, heads, seq, head_dim)
            .transpose(0, 2, 1, 3).reshape(batch, seq, heads * head_dim))


def _fused_attention_local_split(qkv, *, heads: int, causal: bool = False,
                                 scale: float | None = None,
                                 block_batch: int = 8,
                                 interpret: bool = False):
    """Same kernel body on the [B*H, S, D] layout.  Fallback for the
    zero-copy head-slab BlockSpecs of ``_fused_attention_local``, whose
    ``head_dim``-wide last-dim blocks sit outside Mosaic's documented
    (sublane, 128) block-alignment rule; here the last block dim equals
    the array dim, which is always legal.  Trades one transpose pass per
    operand for that guarantee — the probe (tools/attn_probe.py) measures
    both and the faster compiling variant wins the default."""
    batch, seq, three_w = qkv.shape
    _validate_qkv(qkv, heads)
    width = three_w // 3
    head_dim = width // heads
    if scale is None:
        scale = float(head_dim) ** -0.5
    q, k, v = _split_heads(qkv, heads)
    bh = batch * heads
    bt = _pick_block_batch(bh, block_batch, seq=seq, score_tiles=2)
    blk = (bt, seq, head_dim)
    spec = pl.BlockSpec(blk, lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale, causal=causal),
        grid=(bh // bt,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, seq, head_dim), qkv.dtype),
        interpret=interpret,
    )(q, k, v)
    return _merge_heads(out, batch, heads)


def _batch_only(mesh, arg_shapes):
    """NamedSharding keeping only the batch-dim component of the first
    operand's sharding (attention is per-sample: the kernel is correct on
    any batch shard, never on a seq/width shard)."""
    from jax.sharding import NamedSharding, PartitionSpec

    spec = getattr(arg_shapes[0].sharding, "spec", None)
    batch_axis = spec[0] if spec is not None and len(spec) else None
    return NamedSharding(mesh, PartitionSpec(batch_axis, None, None))


# Block layout used when callers don't override: "fused" = zero-copy
# per-head BlockSpecs (64-lane offsets — CONFIRMED NOT to lower on
# hardware, kept for interpret-mode reference); "split" =
# tile-conservative [B*H, S, D] (always legal, one transpose pass per
# operand); "pair" = zero-copy 128-lane head-pair blocks (legal whenever
# width % 128 == 0 and head_dim | 128); "auto" = pair when eligible,
# split otherwise.
#
# Default "auto", from the on-chip probe (tools/attn_probe.py, v5e,
# 2026-08-19, iters=50): at the ViT-B/16 shape [128,193,12,64] the pair
# kernels are ~3x the split kernels and ~2.5-3.5x the XLA formulation —
# fwd 0.676 ms (split 2.088, XLA 1.670), bwd 1.206 ms (split 3.317, XLA
# vjp 4.165) — because the slab-sized HBM transposes on both sides of
# the split custom-call (the ViT step breakdown's 0.707 ms x 12-layer
# "data formatting" copies) simply never exist.  Agreement on-chip:
# pair == split to the shared bf16 tolerance at both production shapes.
DEFAULT_LAYOUT = "auto"

_LOCAL_FWD = {"fused": _fused_attention_local,
              "split": _fused_attention_local_split,
              "pair": _fused_attention_local_pair}


def _resolve_layout(layout: str | None, width: int, heads: int) -> str:
    """Resolve ``None``/``"auto"`` to a concrete layout for this shape:
    ``pair`` when the zero-copy lane-block layout is eligible (see
    ``_heads_per_lane_block``), else ``split``.  Explicit layouts pass
    through untouched."""
    if layout is None:
        layout = DEFAULT_LAYOUT
    if layout != "auto":
        return layout
    return "pair" if _heads_per_lane_block(width, heads) else "split"


def _make_partitioned(impl, n_args, sharding_rule):
    """Wrap ``impl`` (a kernel call on local shapes, ``n_args`` array
    operands) in ``custom_partitioning``: under a sharded jit, GSPMD/
    shardy runs the kernel on each device's local batch shard instead of
    all-gathering the activations around an opaque custom call (measured:
    15 all-gathers in the 8-way sharded HLO before this wrapper, zero
    after).  ``sharding_rule`` must share ONLY the batch factor between
    operands and result, so only batch shardings propagate."""
    from jax.experimental.custom_partitioning import custom_partitioning

    cp = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        ns = _batch_only(mesh, arg_shapes)
        return mesh, impl, ns, (ns,) * n_args

    def infer_sharding(mesh, arg_shapes, result_shape):
        return _batch_only(mesh, arg_shapes)

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule=sharding_rule,
    )
    return cp


@functools.lru_cache(maxsize=None)
def _partitioned_fwd(heads, causal, scale, block_batch, interpret, layout):
    def impl(qkv):
        return _LOCAL_FWD[layout](
            qkv, heads=heads, causal=causal, scale=scale,
            block_batch=block_batch, interpret=interpret)

    return _make_partitioned(impl, 1, "b s w -> b t u")


@functools.partial(
    jax.jit,
    static_argnames=("heads", "causal", "scale", "block_batch", "interpret",
                     "layout"),
)
def fused_attention(qkv, *, heads: int, causal: bool = False,
                    scale: float | None = None, block_batch: int = 8,
                    interpret: bool = False, layout: str | None = None):
    """Multi-head attention over a fused QKV projection.

    qkv: [B, S, 3*W] — the output of the QKV Dense layer, laid out as
    CLIP's ``[q | k | v]`` concatenation.  Returns the attention output
    merged back to [B, S, W] (head order preserved), ready for out_proj.

    Mesh-aware: under a batch-sharded jit the kernel partitions along the
    batch axis (each device runs its own shard); seq/width shardings are
    reshard-ed to replicated by the partitioning rule.
    """
    width = qkv.shape[-1] // 3
    if scale is None:
        # resolve before the lru_cache key so scale=None and the explicit
        # default hit the same partitioned instance
        scale = float(width // heads) ** -0.5
    return _partitioned_fwd(heads, causal, scale, block_batch, interpret,
                            _resolve_layout(layout, width, heads))(qkv)


def _attention_bwd_kernel(qkv_q_ref, qkv_k_ref, qkv_v_ref, g_ref,
                          dq_ref, dk_ref, dv_ref,
                          *, scale: float, causal: bool):
    """Backward for one [Bt, S, D] head slab, entirely in VMEM.

    Recomputes the (cheap, S<=256) forward scores instead of saving the
    [B, H, S, S] probabilities to HBM — the same memory argument as the
    forward kernel, applied to the residuals.  Standard softmax VJP:

        dv = p^T g
        dp = g v^T
        ds = p * (dp - rowsum(dp * p)) * scale
        dq = ds k,   dk = ds^T q
    """
    q = qkv_q_ref[:]
    k = qkv_k_ref[:]
    v = qkv_v_ref[:]
    g = g_ref[:]
    seq = q.shape[1]

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 1)
        s = jnp.where((col <= row)[None], s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)      # [Bt, Sq, Sk] f32

    pc = p.astype(v.dtype)
    dv_ref[:] = jax.lax.dot_general(                 # contract Sq
        pc, g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)

    dp = jax.lax.dot_general(                        # contract D
        g, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [Bt, Sq, Sk]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    # masked columns have p=0 -> ds=0: no explicit causal re-mask needed
    dsc = ds.astype(q.dtype)
    dq_ref[:] = jax.lax.dot_general(                 # contract Sk
        dsc, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[:] = jax.lax.dot_general(                 # contract Sq
        dsc, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _fused_attention_bwd_local(qkv, g, *, heads: int, causal: bool = False,
                               scale: float | None = None,
                               block_batch: int = 4,
                               interpret: bool = False):
    batch, seq, three_w = qkv.shape
    width = three_w // 3
    head_dim = width // heads
    if scale is None:
        scale = float(head_dim) ** -0.5

    bt = _pick_block_batch(batch, block_batch, seq=seq, score_tiles=4)
    grid = (batch // bt, heads)

    def q_map(b, h):
        return (b, 0, h)

    def k_map(b, h):
        return (b, 0, heads + h)

    def v_map(b, h):
        return (b, 0, 2 * heads + h)

    head_block = (bt, seq, head_dim)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attention_bwd_kernel, scale=scale, causal=causal),
        grid=grid,
        in_specs=[
            pl.BlockSpec(head_block, q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(head_block, k_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(head_block, v_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(head_block, q_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(head_block, q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(head_block, q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(head_block, q_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((batch, seq, width), qkv.dtype)
                   for _ in range(3)],
        interpret=interpret,
    )(qkv, qkv, qkv, g)
    # one concat pass rebuilds the fused-QKV cotangent layout
    return jnp.concatenate([dq, dk, dv], axis=-1)


def _fused_attention_bwd_local_split(qkv, g, *, heads: int,
                                     causal: bool = False,
                                     scale: float | None = None,
                                     block_batch: int = 4,
                                     interpret: bool = False):
    """Backward on the tile-conservative [B*H, S, D] layout (see
    ``_fused_attention_local_split``)."""
    batch, seq, three_w = qkv.shape
    _validate_qkv(qkv, heads)
    width = three_w // 3
    head_dim = width // heads
    if scale is None:
        scale = float(head_dim) ** -0.5
    q, k, v = _split_heads(qkv, heads)
    g_bh = (g.reshape(batch, seq, heads, head_dim)
            .transpose(0, 2, 1, 3).reshape(batch * heads, seq, head_dim))
    bh = batch * heads
    bt = _pick_block_batch(bh, block_batch, seq=seq, score_tiles=4)
    blk = (bt, seq, head_dim)
    spec = pl.BlockSpec(blk, lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attention_bwd_kernel, scale=scale, causal=causal),
        grid=(bh // bt,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((bh, seq, head_dim), qkv.dtype)
                   for _ in range(3)],
        interpret=interpret,
    )(q, k, v, g_bh)
    return jnp.concatenate(
        [_merge_heads(t, batch, heads) for t in (dq, dk, dv)], axis=-1)


def _attention_pair_bwd_kernel(q_ref, k_ref, v_ref, g_ref,
                               dq_ref, dk_ref, dv_ref,
                               *, scale: float, causal: bool, head_dim: int):
    """Backward for one 128-lane head-pair block (see
    ``_attention_pair_kernel``); same per-head math as
    ``_attention_bwd_kernel``."""
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    g = g_ref[:]
    seq = q.shape[1]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 1)
        keep = (col <= row)[None]
    dqs, dks, dvs = [], [], []
    for i in range(q.shape[2] // head_dim):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        qi, ki, vi, gi = q[:, :, sl], k[:, :, sl], v[:, :, sl], g[:, :, sl]
        s = jax.lax.dot_general(
            qi, ki, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if causal:
            s = jnp.where(keep, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)

        pc = p.astype(vi.dtype)
        dvs.append(jax.lax.dot_general(
            pc, gi, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype))
        dp = jax.lax.dot_general(
            gi, vi, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
        dsc = ds.astype(qi.dtype)
        dqs.append(jax.lax.dot_general(
            dsc, ki, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype))
        dks.append(jax.lax.dot_general(
            dsc, qi, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype))
    for ref, parts in ((dq_ref, dqs), (dk_ref, dks), (dv_ref, dvs)):
        ref[:] = parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)


def _fused_attention_bwd_local_pair(qkv, g, *, heads: int,
                                    causal: bool = False,
                                    scale: float | None = None,
                                    block_batch: int = 4,
                                    interpret: bool = False):
    """Backward on the zero-copy pair layout: q/k/v/g read straight from
    their [B, S, 3W] / [B, S, W] arrays; dq/dk/dv emitted as three
    [B, S, W] arrays already in slab order, so the only remaining
    formatting pass is the final dqkv concatenate (which XLA typically
    folds into the QKV-projection backward dot)."""
    batch, seq, three_w = qkv.shape
    _validate_qkv(qkv, heads)
    width = three_w // 3
    head_dim = width // heads
    hpb = _heads_per_lane_block(width, heads)
    if not hpb:
        raise ValueError(
            f"pair layout needs width % 128 == 0 and head_dim | 128 "
            f"(got width={width}, heads={heads}); use layout='split'.")
    if scale is None:
        scale = float(head_dim) ** -0.5
    bt = _pick_block_batch(batch, block_batch, seq=seq, score_tiles=4)
    grid = (batch // bt, heads // hpb)
    lanes_w = width // 128

    blk = (bt, seq, 128)
    w_spec = pl.BlockSpec(blk, lambda b, p: (b, 0, p),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attention_pair_bwd_kernel, scale=scale,
                          causal=causal, head_dim=head_dim),
        grid=grid,
        in_specs=[
            w_spec,
            pl.BlockSpec(blk, lambda b, p: (b, 0, lanes_w + p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda b, p: (b, 0, 2 * lanes_w + p),
                         memory_space=pltpu.VMEM),
            w_spec,
        ],
        out_specs=[w_spec, w_spec, w_spec],
        out_shape=[jax.ShapeDtypeStruct((batch, seq, width), qkv.dtype)
                   for _ in range(3)],
        interpret=interpret,
    )(qkv, qkv, qkv, g)
    return jnp.concatenate([dq, dk, dv], axis=-1)


_LOCAL_BWD = {"fused": _fused_attention_bwd_local,
              "split": _fused_attention_bwd_local_split,
              "pair": _fused_attention_bwd_local_pair}


@functools.lru_cache(maxsize=None)
def _partitioned_bwd(heads, causal, scale, block_batch, interpret, layout):
    def impl(qkv, g):
        return _LOCAL_BWD[layout](
            qkv, g, heads=heads, causal=causal, scale=scale,
            block_batch=block_batch, interpret=interpret)

    return _make_partitioned(impl, 2, "b s w, b t u -> b p q")


@functools.partial(
    jax.jit,
    static_argnames=("heads", "causal", "scale", "block_batch", "interpret",
                     "layout"),
)
def fused_attention_bwd(qkv, g, *, heads: int, causal: bool = False,
                        scale: float | None = None, block_batch: int = 4,
                        interpret: bool = False, layout: str | None = None):
    """d(attention)/d(qkv) as a Pallas kernel: qkv [B, S, 3W], upstream
    cotangent g [B, S, W] -> dqkv [B, S, 3W].  Like the forward, the
    [S, S] score/probability/ds tiles never touch HBM; three f32 [S, S]
    intermediates live per program, so the default sample block is
    smaller than the forward's.  Mesh-aware like the forward."""
    width = qkv.shape[-1] // 3
    if scale is None:
        scale = float(width // heads) ** -0.5
    return _partitioned_bwd(heads, causal, scale, block_batch, interpret,
                            _resolve_layout(layout, width, heads))(qkv, g)


def xla_attention(qkv, *, heads: int, causal: bool = False,
                  scale: float | None = None):
    """Reference formulation (jax.nn.dot_product_attention) on the same
    [B, S, 3W] fused-QKV contract — the kernel's agreement oracle and the
    hybrid VJP's differentiable body."""
    batch, seq, three_w = qkv.shape
    width = three_w // 3
    head_dim = width // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split_heads(t):
        return t.reshape(batch, seq, heads, head_dim)

    out = jax.nn.dot_product_attention(
        split_heads(q), split_heads(k), split_heads(v),
        scale=scale, is_causal=causal,
    )
    return out.reshape(batch, seq, width)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9))
def hybrid_attention(qkv, heads: int, causal: bool = False,
                     scale: float | None = None, block_batch: int = 8,
                     interpret: bool = False, pallas_bwd: bool = True,
                     bwd_block_batch: int = 4, layout: str | None = None,
                     pallas_fwd: bool = True):
    """Differentiable fused attention, usable in train and eval alike.

    Forward is the Pallas kernel by default; ``pallas_fwd=False`` runs the
    XLA formulation instead while KEEPING the Pallas backward — the
    combination tools/attn_probe.py measures fastest at the ViT-B/16
    flagship shape on v5e (fwd: XLA 1.72 ms vs kernel 1.87; bwd: kernel
    3.54 ms vs XLA VJP 4.26 — the backward's [B, H, S, S] probability
    residual/re-stream is where XLA loses, not the forward).  Backward is
    the Pallas backward kernel by default (``fused_attention_bwd`` — score
    tiles recomputed in VMEM, no [B, H, S, S] HBM traffic in the grad
    either); ``pallas_bwd=False`` falls back to differentiating the XLA
    formulation (recompute), the conservative path the GRU hybrid uses.
    ``block_batch`` tunes the forward's sample block, ``bwd_block_batch``
    the backward's (its tiles are ~2x bigger, hence the smaller default);
    ``layout`` picks the block layout for both (None = ``DEFAULT_LAYOUT``).
    """
    if pallas_fwd:
        return fused_attention(qkv, heads=heads, causal=causal, scale=scale,
                               block_batch=block_batch, interpret=interpret,
                               layout=layout)
    return xla_attention(qkv, heads=heads, causal=causal, scale=scale)


def _hybrid_fwd(qkv, heads, causal, scale, block_batch, interpret,
                pallas_bwd, bwd_block_batch, layout, pallas_fwd):
    if pallas_fwd:
        out = fused_attention(qkv, heads=heads, causal=causal, scale=scale,
                              block_batch=block_batch, interpret=interpret,
                              layout=layout)
    else:
        out = xla_attention(qkv, heads=heads, causal=causal, scale=scale)
    return out, qkv


def _hybrid_bwd(heads, causal, scale, block_batch, interpret, pallas_bwd,
                bwd_block_batch, layout, pallas_fwd, qkv, g):
    if pallas_bwd:
        return (fused_attention_bwd(qkv, g, heads=heads, causal=causal,
                                    scale=scale,
                                    block_batch=bwd_block_batch,
                                    interpret=interpret, layout=layout),)
    del block_batch
    _, vjp = jax.vjp(
        lambda t: xla_attention(t, heads=heads, causal=causal, scale=scale),
        qkv)
    return vjp(g)


hybrid_attention.defvjp(_hybrid_fwd, _hybrid_bwd)
