"""Pallas TPU kernel: fused GRU time scan.

The recurrent scan is the one genuinely sequential op in the framework (the
reference leans on cuDNN's fused GRU, `/root/reference/lib/models/backbones/
gru.py:36-43`).  The XLA ``lax.scan`` version round-trips the hidden state
and per-step gate tensors through HBM every timestep; this kernel keeps the
hidden state and the recurrent weight resident in VMEM for the whole
sequence and double-buffers the per-step input-gate slabs from HBM, so the
only HBM traffic per step is one [B, 3H] read and one [B, H] write.

Layout/contract matches ``models.gru.gru_scan``:
  x_gates [T, B, 3H]  (time-major; gate order r, z, n)
  w_h     [H, 3H]
  h0      [B, H]
  -> out  [T, B, H]

The kernel implements the *forward* scan only, but is fully usable in
training: ``make_hybrid_scan`` wraps it in a custom VJP whose backward
differentiates the bit-identical XLA scan (one recompute — the GRU is a
small fraction of a train step).  ``models.gru.BiGRUEncoder`` with
``use_pallas=True`` therefore uses it for train and eval alike.

``bigru_pooled_scan`` below goes further for the common 1-layer
bidirectional case: both directions run interleaved in ONE kernel (two
independent recurrent chains hide each other's latency) and the masked
max-over-time pooling is fused in, so the [T, B, H] per-step outputs are
never written to HBM at all — the kernel emits just the pooled [B, 2H].

Measured decision (v5e, [T=105, B=128, H=512] bf16, bench.py --stages,
overhead-amortized timing): full-module latency is ~0.15 ms on EITHER
path — the scan is latency-bound and the text tower is a rounding error
next to the conv trunk, so the XLA scan stays the DEFAULT for simplicity
(``TPU.GRU_PALLAS`` opts into this kernel). The kernel's remaining edge
is traffic, not latency: no [T, B, H] per-step HBM writes.

Multi-chip: both entry points are mesh-native via ``custom_partitioning``
(the same pattern as `ops/attention_pallas.py`) — the recurrence is
independent per sample, so under a batch-sharded jit each device runs the
kernel on its own batch shard with the weights replicated; no all-gather
is inserted around the custom call (asserted on the 8-device CPU mesh in
tests/test_pallas_ops.py::TestGRUMeshPartitioning).  Non-batch shardings are
resharded to the rule's layout by the partitioner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_scan_kernel(x_gates_hbm, w_h_ref, h0_ref, out_hbm, h_scratch,
                     xg_scratch, hout_scratch, in_sem, out_sem):
    """One program: loop T steps; double-buffered input-slab reads from HBM
    and double-buffered hidden-state writes back to HBM."""
    seq_len = x_gates_hbm.shape[0]
    hidden = h0_ref.shape[-1]

    def in_dma(slot, t):
        return pltpu.make_async_copy(
            x_gates_hbm.at[t], xg_scratch.at[slot], in_sem.at[slot]
        )

    def out_dma(slot, t):
        return pltpu.make_async_copy(
            hout_scratch.at[slot], out_hbm.at[t], out_sem.at[slot]
        )

    h_scratch[:] = h0_ref[:]
    in_dma(0, 0).start()

    def step(t, _):
        slot = t % 2

        @pl.when(t + 1 < seq_len)
        def _():
            in_dma((t + 1) % 2, t + 1).start()

        in_dma(slot, t).wait()

        h_new = _gru_cell(xg_scratch[slot], h_scratch[:], w_h_ref, hidden)
        h_scratch[:] = h_new

        # Write h_new out through the slot's staging buffer; reclaim the
        # slot's previous in-flight write first.
        @pl.when(t >= 2)
        def _():
            out_dma(slot, t - 2).wait()

        hout_scratch[slot] = h_new
        out_dma(slot, t).start()
        return 0

    jax.lax.fori_loop(0, seq_len, step, 0)

    @pl.when(seq_len >= 2)
    def _():
        out_dma((seq_len - 2) % 2, seq_len - 2).wait()

    out_dma((seq_len - 1) % 2, seq_len - 1).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_scan_pallas(
    x_gates: jax.Array,  # [T, B, 3H] float32
    w_h: jax.Array,  # [H, 3H]
    h0: jax.Array,  # [B, H]
    interpret: bool = False,
) -> jax.Array:
    """Fused GRU scan; returns [T, B, H]."""
    seq, batch, three_h = x_gates.shape
    hidden = h0.shape[-1]
    assert three_h == 3 * hidden

    out = pl.pallas_call(
        _gru_scan_kernel,
        out_shape=jax.ShapeDtypeStruct((seq, batch, hidden), x_gates.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x_gates stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_h resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h0
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),  # stays in HBM
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), x_gates.dtype),  # h
            pltpu.VMEM((2, batch, three_h), x_gates.dtype),  # in dbl-buffer
            pltpu.VMEM((2, batch, hidden), x_gates.dtype),  # out dbl-buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_gates, w_h, h0)
    return out


def _xla_scan_forward(x_gates_tbg, w_h, h0):
    """Reference XLA scan with the same [T, B, 3H] layout (used as the
    mathematical definition for the custom VJP below)."""
    hidden = h0.shape[-1]

    def step(h, xg):
        hg = jnp.dot(h, w_h, preferred_element_type=jnp.float32).astype(h.dtype)
        r = jax.nn.sigmoid(xg[:, :hidden] + hg[:, :hidden])
        z = jax.nn.sigmoid(xg[:, hidden : 2 * hidden] + hg[:, hidden : 2 * hidden])
        n = jnp.tanh(xg[:, 2 * hidden :] + r * hg[:, 2 * hidden :])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    _, ys = jax.lax.scan(step, h0, x_gates_tbg)
    return ys


def _make_batch_partitioned(impl, batch_dims, result_batch_dim,
                            sharding_rule):
    """Wrap ``impl`` in ``custom_partitioning`` sharing ONLY the batch
    factor between operands and result (attention_pallas._make_partitioned
    generalized to mixed-rank operands): under a batch-sharded jit each
    device runs the kernel on its local shard instead of GSPMD replicating
    it behind all-gathers.

    ``batch_dims``: per-operand index of the batch dimension, or None for
    replicated operands (the recurrent weights).  ``result_batch_dim``:
    the batch dimension of the (single-array) result.  ``sharding_rule``
    is the shardy einsum-like rule with the batch factor as the only
    shared letter."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    cp = custom_partitioning(impl)

    def _shardings(mesh, arg_shapes, result_shape):
        # batch mesh axis = first batch-carrying operand's spec entry at
        # its batch dim (None -> replicated execution, still correct)
        batch_axis = None
        for a, bd in zip(arg_shapes, batch_dims):
            if bd is None:
                continue
            spec = getattr(a.sharding, "spec", None)
            if spec is not None and len(spec) > bd and spec[bd] is not None:
                batch_axis = spec[bd]
                break

        def ns(rank, bd):
            parts = [None] * rank
            if bd is not None:
                parts[bd] = batch_axis
            return NamedSharding(mesh, PartitionSpec(*parts))

        arg_sh = tuple(ns(len(a.shape), bd)
                       for a, bd in zip(arg_shapes, batch_dims))
        res_sh = ns(len(result_shape.shape), result_batch_dim)
        return arg_sh, res_sh

    def partition(mesh, arg_shapes, result_shape):
        arg_sh, res_sh = _shardings(mesh, arg_shapes, result_shape)
        return mesh, impl, res_sh, arg_sh

    def infer_sharding(mesh, arg_shapes, result_shape):
        return _shardings(mesh, arg_shapes, result_shape)[1]

    cp.def_partition(partition=partition,
                     infer_sharding_from_operands=infer_sharding,
                     sharding_rule=sharding_rule)
    return cp


@functools.lru_cache(maxsize=None)
def _partitioned_scan(interpret: bool):
    def impl(x_gates_tbg, w_h, h0):
        return gru_scan_pallas(x_gates_tbg, w_h, h0, interpret=interpret)

    # x [T,B,3H] (batch dim 1), w_h [H,3H] replicated, h0 [B,H] (dim 0)
    # -> out [T,B,H] (batch dim 1); only `b` is shared
    return _make_batch_partitioned(
        impl, batch_dims=(1, None, 0), result_batch_dim=1,
        sharding_rule="t b g, h i, b j -> u b v")


def make_hybrid_scan(interpret: bool = False):
    """Pallas forward; backward differentiates the (bit-identical) XLA scan.

    The recompute-in-backward trade keeps the kernel forward-only (no
    backward recurrence kernel needed) at the cost of one extra forward in
    the bwd pass — cheap, since the GRU is <5% of a training step.
    """

    @jax.custom_vjp
    def hybrid(x_gates_tbg, w_h, h0):
        return _partitioned_scan(interpret)(x_gates_tbg, w_h, h0)

    def fwd(x_gates_tbg, w_h, h0):
        out = _partitioned_scan(interpret)(x_gates_tbg, w_h, h0)
        return out, (x_gates_tbg, w_h, h0)

    def bwd(residuals, g):
        x_gates_tbg, w_h, h0 = residuals
        _, vjp = jax.vjp(_xla_scan_forward, x_gates_tbg, w_h, h0)
        return vjp(g)

    hybrid.defvjp(fwd, bwd)
    return hybrid


gru_scan_hybrid = make_hybrid_scan(interpret=False)


def gru_scan_auto(x_gates_btg: jax.Array, w_h: jax.Array, h0: jax.Array,
                  reverse: bool = False) -> jax.Array:
    """Drop-in for ``models.gru.gru_scan`` (batch-major [B, T, 3H] in/out)
    using the Pallas kernel on TPU, differentiable via the custom VJP."""
    xs = jnp.swapaxes(x_gates_btg, 0, 1)  # [T, B, 3H]
    if reverse:
        xs = xs[::-1]
    ys = gru_scan_hybrid(xs, w_h, h0)
    if reverse:
        ys = ys[::-1]
    return jnp.swapaxes(ys, 0, 1)


# ---------------------------------------------------------------------------
# Fused bidirectional scan + masked max-over-time pooling
# ---------------------------------------------------------------------------

def _sigmoid_same_dtype(x):
    """sigmoid without f32 literals: Mosaic mis-lowers jax.nn.sigmoid's
    internal f32 constants into bf16 vectors ('vector.broadcast' element
    type mismatch); keeping every constant in x.dtype avoids it."""
    one = jnp.asarray(1.0, x.dtype)
    return one / (one + jnp.exp(-x))


def _gru_cell(xg, h, w_ref, hidden):
    hg = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32).astype(h.dtype)
    one = jnp.asarray(1.0, h.dtype)
    r = _sigmoid_same_dtype(xg[:, :hidden] + hg[:, :hidden])
    z = _sigmoid_same_dtype(xg[:, hidden : 2 * hidden] + hg[:, hidden : 2 * hidden])
    n = jnp.tanh(xg[:, 2 * hidden :] + r * hg[:, 2 * hidden :])
    return (one - z) * n + z * h


def _bigru_pooled_kernel(x_hbm, w_f_ref, w_b_ref, len_ref,
                         pooled_ref, hf, hb, mf, mb, x_buf, in_sem):
    """Both directions per step (two independent recurrent chains hide each
    other's latency), running masked max over valid positions, no per-step
    HBM writes at all.  The two directions' input gates arrive concatenated
    ([T, B, 6H]) so each step costs exactly ONE double-buffered DMA."""
    seq_len = x_hbm.shape[0]
    hidden = hf.shape[-1]

    def in_dma(slot, t):
        return pltpu.make_async_copy(x_hbm.at[t], x_buf.at[slot], in_sem.at[slot])

    zero = jnp.zeros_like(hf)
    hf[:] = zero
    hb[:] = zero
    # GRU hidden states are tanh-bounded in (-1, 1) (h' is a convex mix of
    # tanh(n) and the previous h, h0 = 0), so -2 is a safe "-inf" for the
    # running max — and avoids a Mosaic bf16 lowering bug with inf consts.
    neg = jnp.full(mf.shape, -2.0, mf.dtype)
    mf[:] = neg
    mb[:] = neg
    in_dma(0, 0).start()

    def step(t, _):
        slot = t % 2

        @pl.when(t + 1 < seq_len)
        def _():
            in_dma((t + 1) % 2, t + 1).start()

        in_dma(slot, t).wait()

        xg = x_buf[slot]
        new_hf = _gru_cell(xg[:, : 3 * hidden], hf[:], w_f_ref, hidden)
        new_hb = _gru_cell(xg[:, 3 * hidden :], hb[:], w_b_ref, hidden)
        hf[:] = new_hf
        hb[:] = new_hb

        valid = t < len_ref[:]  # [B, 1] broadcast over H
        mf[:] = jnp.where(valid, jnp.maximum(mf[:], new_hf), mf[:])
        mb[:] = jnp.where(valid, jnp.maximum(mb[:], new_hb), mb[:])
        return 0

    jax.lax.fori_loop(0, seq_len, step, 0)
    pooled_ref[:, :hidden] = mf[:]
    pooled_ref[:, hidden:] = mb[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bigru_pooled_pallas(xf_tbg, xb_tbg, w_f, w_b, lengths,
                         interpret: bool = False):
    seq, batch, three_h = xf_tbg.shape
    hidden = three_h // 3
    dtype = xf_tbg.dtype
    len_2d = lengths.reshape(batch, 1).astype(jnp.int32)
    x_cat = jnp.concatenate([xf_tbg, xb_tbg], axis=-1)  # [T, B, 6H]
    return pl.pallas_call(
        _bigru_pooled_kernel,
        out_shape=jax.ShapeDtypeStruct((batch, 2 * hidden), dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # gates in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_f resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_b resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lengths [B, 1]
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), dtype),  # h fwd
            pltpu.VMEM((batch, hidden), dtype),  # h bwd
            pltpu.VMEM((batch, hidden), dtype),  # running max fwd
            pltpu.VMEM((batch, hidden), dtype),  # running max bwd
            pltpu.VMEM((2, batch, 2 * three_h), dtype),  # in dbl-buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_cat, w_f, w_b, len_2d)


def _xla_pooled_forward(xf_tbg, xb_tbg, w_f, w_b, lengths,
                        pool_mode: str = "batch"):
    """Mathematical definition (differentiable): two XLA scans + masked
    max-over-time with torch pad-packed semantics (gru.py:62-64 — zeros
    participate only for samples shorter than the batch max length; see
    models.gru.masked_max_pool)."""
    seq, batch, _ = xf_tbg.shape
    h0 = jnp.zeros((batch, w_f.shape[0]), xf_tbg.dtype)
    out_f = _xla_scan_forward(xf_tbg, w_f, h0)  # [T, B, H]
    out_b = _xla_scan_forward(xb_tbg, w_b, h0)
    cat = jnp.concatenate([out_f, out_b], axis=-1)  # [T, B, 2H]
    valid = (jnp.arange(seq)[:, None] < lengths[None, :])[..., None]
    m = jnp.max(jnp.where(valid, cat, -jnp.inf), axis=0)  # [B, 2H]
    if pool_mode == "batch":
        has_pad = (lengths < jnp.max(lengths))[:, None]
    else:  # "always"
        has_pad = (lengths < seq)[:, None]
    return jnp.where(has_pad, jnp.maximum(m, 0.0), m)


@functools.lru_cache(maxsize=None)
def _partitioned_pooled(interpret: bool):
    def impl(xf_btg, xb_btg, w_f, w_b, lengths):
        # batch-major at the partition boundary (batch = dim 0 of every
        # batch-carrying operand); the time-major swap runs per-shard
        return _bigru_pooled_pallas(
            jnp.swapaxes(xf_btg, 0, 1), jnp.swapaxes(xb_btg, 0, 1),
            w_f, w_b, lengths, interpret=interpret)

    return _make_batch_partitioned(
        impl, batch_dims=(0, 0, None, None, 0), result_batch_dim=0,
        sharding_rule="b t g, b s h, i j, k l, b -> b m")


def bigru_pooled_scan(xf_btg, xb_btg, w_f, w_b, lengths,
                      interpret: bool = False, pool_mode: str = "batch"):
    """Fused 1-layer bi-GRU: scan both directions and max-pool over valid
    time steps in one kernel.  ``xb_btg`` must be the per-sample reversed
    input gates (models.gru.reverse_padded of the embedded sequence).
    ``pool_mode`` follows models.gru.masked_max_pool.

    Differentiable: the backward pass differentiates the bit-identical XLA
    formulation (one recompute).  Returns [B, 2H]."""
    seq = xf_btg.shape[1]

    @jax.custom_vjp
    def run(xf, xb, w_f, w_b):
        pooled = _partitioned_pooled(interpret)(xf, xb, w_f, w_b, lengths)
        # kernel maxes over valid steps only; the zero-participation rule
        # is applied outside (models.gru.masked_max_pool semantics)
        if pool_mode == "batch":
            has_pad = (lengths < jnp.max(lengths))[:, None]
        else:  # "always"
            has_pad = (lengths < seq)[:, None]
        return jnp.where(has_pad, jnp.maximum(pooled, 0.0), pooled)

    def fwd(xf, xb, w_f, w_b):
        return run(xf, xb, w_f, w_b), (xf, xb, w_f, w_b)

    def bwd(residuals, g):
        xf, xb, w_f, w_b = residuals
        _, vjp = jax.vjp(
            lambda a, b, wf, wb: _xla_pooled_forward(
                jnp.swapaxes(a, 0, 1), jnp.swapaxes(b, 0, 1), wf, wb, lengths,
                pool_mode,
            ),
            xf, xb, w_f, w_b,
        )
        return vjp(g)

    run.defvjp(fwd, bwd)
    return run(xf_btg, xb_btg, w_f, w_b)
