"""Pallas TPU kernel: streaming similarity top-k for retrieval ranking.

The reference ranks a gallery by materializing the full query x gallery
similarity matrix and argsorting it (`/root/reference/lib/data/metrics/
evaluation.py:11-37,117-120`).  For production-scale galleries that matrix
is the memory bottleneck: a million-image gallery against 6k queries is
24 GB — more than an entire v5e's HBM.

This kernel never materializes it.  The grid tiles the query axis; each
program streams gallery tiles through VMEM, computes the score tile on the
MXU, and folds it into a running top-k with an expected-O(insertions)
threshold-gated insertion loop (``_fold_tile`` — pure VPU ops; no sorts or
gathers, which TPU lacks).  HBM traffic is O(Q*D + G*D + Q*k) instead of
O(Q*G).  Tile defaults (query 256 x gallery 2048) are from an on-chip
sweep (v5e, 98k x 256 gallery): large gallery tiles amortize the
per-tile mandatory max-reduction, while large QUERY tiles hurt — the
insertion loop trips scale with the max insertion count over the tile's
rows — and small ones re-stream the gallery per extra grid program.

``topk_similarity_quantized`` is the int8 composition (gallery rows from
``ops/quant.py``): the gallery streams as int8 + per-row scales — 4x less
HBM traffic again — and scores reproduce ``quant.quantized_scores``
bit-for-bit (int8 -> bf16 is exact, same f32 accumulation).

Tie-breaking: when two gallery items share a score, the larger index wins a
slot first (the reference's argsort breaks ties arbitrarily as well).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38


def _fold_tile(run_vals, run_idx, scores, tile_base, k):
    """Fold one score tile into the sorted-descending running top-k.

    Expected-O(insertions) merge: each trip extracts the tile's per-row
    max and inserts it into the sorted run at its exact position; the
    loop exits as soon as NO row's best remaining candidate can enter its
    run.  A tile at stream position t updates a row's top-k with
    probability ~k/t (harmonic), so late tiles — the vast majority of a
    large gallery — cost ~1 trip instead of the k fixed extraction
    passes of the round-2 merge (which made the kernel merge-bound at
    2.7 ms vs a ~0.15 ms DMA floor; see BENCH_SERVING.json).  Worst case
    (adversarially ascending gallery) degrades to the old k passes.

    Index bookkeeping is LAZY: the argmax is located against a
    loop-invariant COLUMN iota (hoisted by Mosaic) and the static/scalar
    ``tile_base`` is added to the extracted [Qt, 1] winner only — the
    round-3 kernel materialized a full [Qt, Gt] global-index tensor per
    tile (iota + broadcast add + full-width compares), pure VPU overhead
    on every tile including zero-insertion ones.

    Ordering is lexicographic (value desc, index desc): ties prefer the
    larger gallery index, exactly like the round-2 merge.  ``run_vals``
    must be sorted under that order on entry (it is produced sorted).
    """
    qt, gt = scores.shape
    slot = jax.lax.broadcasted_iota(jnp.int32, (qt, k), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (qt, gt), 1)  # loop-invariant

    # The qualification test needs only the per-row max, so the R1
    # reduction is hoisted to a prologue and recomputed at the END of each
    # body trip: a tile with zero insertions (the common late-stream case)
    # costs one reduction and a cheap cond — never the argmax extraction
    # or insertion machinery.
    m0 = jnp.max(scores, axis=1, keepdims=True)  # [Qt, 1]

    # ``scores`` is NEVER mutated: instead of retiring extracted lanes
    # with a full-width masked write + re-max (3 reads + 1 write per
    # trip), each trip tracks the last extracted (value, col) pair and
    # reduces over the lex-LESS live set directly — 2 reads, 0 writes.
    # Extraction proceeds in strict lexicographic descending (value, col)
    # order, so "already extracted" == "lex-greater-or-equal than the
    # last extraction".

    def cond(carry):
        run_vals, _, m, _, _, passes = carry
        tau = run_vals[:, k - 1:k]
        # m >= tau may admit a value tie that loses on index (pos == k
        # no-ops inside) — rare and harmless; m == NEG_INF rows are
        # exhausted or padding
        qual = jnp.logical_and(m >= tau, m > NEG_INF)
        return jnp.logical_and(passes < k, jnp.any(qual))

    def body(carry):
        run_vals, run_idx, m, m_prev, im_prev, passes = carry
        # current winner's column: the largest col among lanes AT value m
        # that are still live.  Only exact value ties need the col filter:
        # when m < m_prev every s == m lane is live (extracted lanes all
        # hold values >= m_prev > m), on a value tie (m == m_prev) the
        # lanes at col >= im_prev are the already-extracted ones.  The
        # test must be s == m, NOT s >= m — an older extraction at a
        # higher value but lower col would otherwise pass the tie filter
        # and corrupt the argmax.
        live_tie = jnp.logical_or(m < m_prev, col < im_prev)
        im_col = jnp.max(
            jnp.where(jnp.logical_and(scores == m, live_tie), col, -1),
            axis=1, keepdims=True)
        im = im_col + tile_base
        # insertion position under (val desc, idx desc)
        ranks_above = jnp.logical_or(
            run_vals > m, jnp.logical_and(run_vals == m, run_idx > im)
        )
        pos = jnp.sum(ranks_above.astype(jnp.int32), axis=1, keepdims=True)
        do = jnp.logical_and(pos < k, m > NEG_INF)  # [Qt, 1]
        if k == 1:  # nothing to shift: a [Qt, 0] slice is not lowerable
            new_vals, new_idx = m, im
        else:
            shift_vals = jnp.concatenate(
                [run_vals[:, :1], run_vals[:, :-1]], axis=1)
            shift_idx = jnp.concatenate(
                [run_idx[:, :1], run_idx[:, :-1]], axis=1)
            new_vals = jnp.where(
                slot == pos, m, jnp.where(slot > pos, shift_vals, run_vals))
            new_idx = jnp.where(
                slot == pos, im, jnp.where(slot > pos, shift_idx, run_idx))
        run_vals = jnp.where(do, new_vals, run_vals)
        run_idx = jnp.where(do, new_idx, run_idx)
        # next candidate: max over the live set strictly lex-below the
        # extraction we just made
        live = jnp.logical_or(
            scores < m, jnp.logical_and(scores == m, col < im_col))
        m_next = jnp.max(jnp.where(live, scores, NEG_INF), axis=1,
                         keepdims=True)
        return run_vals, run_idx, m_next, m, im_col, passes + 1

    big = jnp.full((qt, 1), jnp.inf, jnp.float32)
    big_col = jnp.full((qt, 1), gt, jnp.int32)
    run_vals, run_idx, _, _, _, _ = jax.lax.while_loop(
        cond, body,
        (run_vals, run_idx, m0, big, big_col, jnp.int32(0)),
    )
    return run_vals, run_idx


def _make_kernel(k: int, gallery_tile: int, valid_gallery: int,
                 compute_dtype):
    # The valid-row bound is STATIC, so the tiles needing a padding mask
    # are known at trace time: [0, num_clean) stream unmasked, at most one
    # tail tile gets the mask (round 3 paid an iota + compare + full-width
    # select on EVERY tile), and pure-padding tiles past the bound are
    # never streamed at all.
    num_clean = valid_gallery // gallery_tile
    tail_rows = valid_gallery % gallery_tile
    num_proc = num_clean + (1 if tail_rows else 0)

    def kernel(q_ref, g_hbm, vals_ref, idx_ref, g_scratch, sem):
        q = q_ref[:].astype(compute_dtype)  # [Qt, D]
        qt = q.shape[0]

        def g_dma(slot, tile):
            return pltpu.make_async_copy(
                g_hbm.at[pl.ds(tile * gallery_tile, gallery_tile), :],
                g_scratch.at[slot],
                sem.at[slot],
            )

        g_dma(0, 0).start()

        run_vals = jnp.full((qt, k), NEG_INF, jnp.float32)
        run_idx = jnp.full((qt, k), -1, jnp.int32)

        def tile_body(tile, carry, masked):
            run_vals, run_idx = carry
            slot = tile % 2

            @pl.when(tile + 1 < num_proc)
            def _():
                g_dma((tile + 1) % 2, tile + 1).start()

            g_dma(slot, tile).wait()

            scores = jax.lax.dot_general(
                q, g_scratch[slot].astype(compute_dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Qt, Gt] — f32 accumulation regardless of compute_dtype
            if masked:  # static: only the tail tile has padding rows
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (qt, gallery_tile), 1)
                scores = jnp.where(col < tail_rows, scores, NEG_INF)
            return _fold_tile(run_vals, run_idx, scores,
                              tile * gallery_tile, k)

        carry = (run_vals, run_idx)
        if num_clean:
            carry = jax.lax.fori_loop(
                0, num_clean, functools.partial(tile_body, masked=False),
                carry)
        if tail_rows:
            carry = tile_body(num_clean, carry, masked=True)
        vals_ref[:] = carry[0]
        idx_ref[:] = carry[1]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "query_tile", "gallery_tile", "valid_gallery",
                     "interpret", "compute_dtype"),
)
def topk_similarity(
    queries: jax.Array,  # [Q, D] (pre-normalized for cosine)
    gallery: jax.Array,  # [G, D]
    k: int = 10,
    query_tile: int = 256,
    gallery_tile: int = 2048,
    valid_gallery: int = 0,  # 0 = all rows valid; else rows >= this masked
    interpret: bool = False,
    compute_dtype=jnp.float32,
):
    """Streaming top-k of ``queries @ gallery.T`` without materializing it.

    Q must be a multiple of ``query_tile`` and G of ``gallery_tile`` (use
    ``topk_similarity_padded`` otherwise).  Returns ([Q, k] scores,
    [Q, k] int32 gallery indices), rows sorted descending.

    ``compute_dtype=jnp.bfloat16`` runs the MXU contraction in bf16 with
    f32 accumulation — ~4x the f32 matmul rate on v5e; scores then match
    an XLA bf16-inputs/f32-accumulate dot, not the f32 one.  f32 (default)
    matches ``jax.lax.top_k(q @ g.T)`` index-exactly.
    """
    q_count, dim = queries.shape
    g_count = gallery.shape[0]
    assert q_count % query_tile == 0, (q_count, query_tile)
    assert g_count % gallery_tile == 0, (g_count, gallery_tile)

    kernel = _make_kernel(k, gallery_tile, valid_gallery or g_count,
                          compute_dtype)
    vals, idx = pl.pallas_call(
        kernel,
        grid=(q_count // query_tile,),
        out_shape=(
            jax.ShapeDtypeStruct((q_count, k), jnp.float32),
            jax.ShapeDtypeStruct((q_count, k), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(
                (query_tile, dim), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # gallery streamed from HBM
        ],
        out_specs=(
            pl.BlockSpec((query_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, gallery_tile, dim), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(queries.astype(jnp.float32), gallery.astype(jnp.float32))
    return vals, idx


# Gallery tiles per scale DMA in the int8 kernel: per-tile scale slices
# are tiny ([1, Gt] = 8 KB), so fetching them one tile at a time costs a
# DMA issue+wait pair per tile — pure scalar-core overhead at ~500 tiles
# per 1M-row stream.  Chunking amortizes that 8x for 128 KB of VMEM.
SCALE_CHUNK = 8


def _make_quant_kernel(k: int, gallery_tile: int, valid_gallery: int):
    """Streaming top-k over an int8-quantized gallery (ops/quant.py rows).

    The gallery streams from HBM as int8 (4x less traffic than f32) with
    its per-row f32 scales; scores are computed exactly like
    ``quant.quantized_scores`` — bf16 query x bf16(int8) contraction with
    f32 accumulation, scales folded in per score column — so results match
    the materializing path bit for bit (int8 -> bf16 is exact).  Same
    static clean/tail tile split as the f32 kernel.  Scales arrive
    pre-tiled as [num_chunks * SCALE_CHUNK, gallery_tile] and stream one
    CHUNK (SCALE_CHUNK tiles) per DMA."""
    num_clean = valid_gallery // gallery_tile
    tail_rows = valid_gallery % gallery_tile
    num_proc = num_clean + (1 if tail_rows else 0)
    num_chunks = -(-num_proc // SCALE_CHUNK)

    def kernel(q_ref, g_hbm, s_hbm, vals_ref, idx_ref, g_scratch, s_scratch,
               sem, s_sem):
        q = q_ref[:].astype(jnp.bfloat16)  # [Qt, D]
        qt = q.shape[0]

        def g_dma(slot, tile):
            return pltpu.make_async_copy(
                g_hbm.at[pl.ds(tile * gallery_tile, gallery_tile), :],
                g_scratch.at[slot],
                sem.at[slot],
            )

        def s_dma(slot, chunk):
            # one [SCALE_CHUNK, Gt] row-block of the pre-tiled scales
            return pltpu.make_async_copy(
                s_hbm.at[pl.ds(chunk * SCALE_CHUNK, SCALE_CHUNK), :],
                s_scratch.at[slot],
                s_sem.at[slot],
            )

        g_dma(0, 0).start()
        s_dma(0, 0).start()

        run_vals = jnp.full((qt, k), NEG_INF, jnp.float32)
        run_idx = jnp.full((qt, k), -1, jnp.int32)

        def tile_body(tile, carry, masked):
            run_vals, run_idx = carry
            slot = tile % 2
            chunk = tile // SCALE_CHUNK
            pos = tile % SCALE_CHUNK

            @pl.when(tile + 1 < num_proc)
            def _():
                g_dma((tile + 1) % 2, tile + 1).start()

            @pl.when(pos == 0)
            def _():
                s_dma(chunk % 2, chunk).wait()

                @pl.when(chunk + 1 < num_chunks)
                def _():
                    s_dma((chunk + 1) % 2, chunk + 1).start()

            g_dma(slot, tile).wait()

            # int8 -> bf16 is exact for |v| <= 127; f32 accumulation
            raw = jax.lax.dot_general(
                q, g_scratch[slot].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Qt, Gt]
            # [1, Gt] row of this chunk's scales broadcasts over rows
            # (sliced at the REF level: Mosaic has no dynamic_slice on
            # loaded values — caught on-chip)
            s_row = s_scratch[chunk % 2, pl.ds(pos, 1), :]
            scores = raw * s_row
            if masked:  # static: only the tail tile has padding rows
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (qt, gallery_tile), 1)
                scores = jnp.where(col < tail_rows, scores, NEG_INF)
            return _fold_tile(run_vals, run_idx, scores,
                              tile * gallery_tile, k)

        carry = (run_vals, run_idx)
        if num_clean:
            carry = jax.lax.fori_loop(
                0, num_clean, functools.partial(tile_body, masked=False),
                carry)
        if tail_rows:
            carry = tile_body(num_clean, carry, masked=True)
        vals_ref[:] = carry[0]
        idx_ref[:] = carry[1]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "query_tile", "gallery_tile", "valid_gallery",
                     "interpret"),
)
def topk_similarity_quantized(
    queries: jax.Array,    # [Q, D] float
    gallery_q: jax.Array,  # [G, D] int8 (quant.quantize_rows values)
    scales: jax.Array,     # [G] float32 per-row scales
    k: int = 10,
    query_tile: int = 256,
    gallery_tile: int = 2048,
    valid_gallery: int = 0,
    interpret: bool = False,
):
    """Streaming top-k of ``(q_bf16 @ int8_g.T) * scales`` without
    materializing the score matrix: the int8 composition of
    ``topk_similarity`` (HBM traffic O(G*D) bytes instead of 4x that).
    Same tiling/padding contract as ``topk_similarity``."""
    q_count, dim = queries.shape
    g_count = gallery_q.shape[0]
    assert gallery_q.dtype == jnp.int8, gallery_q.dtype
    assert q_count % query_tile == 0, (q_count, query_tile)
    assert g_count % gallery_tile == 0, (g_count, gallery_tile)

    kernel = _make_quant_kernel(k, gallery_tile, valid_gallery or g_count)
    # Pre-tile the scales to [num_chunks * SCALE_CHUNK, gallery_tile] so
    # the kernel streams them SCALE_CHUNK tiles per DMA (row padding is
    # never read: padded tiles are beyond num_proc).
    num_tiles = g_count // gallery_tile
    pad_tiles = (-num_tiles) % SCALE_CHUNK
    s2d = scales.astype(jnp.float32).reshape(num_tiles, gallery_tile)
    if pad_tiles:
        s2d = jnp.pad(s2d, ((0, pad_tiles), (0, 0)))
    vals, idx = pl.pallas_call(
        kernel,
        grid=(q_count // query_tile,),
        out_shape=(
            jax.ShapeDtypeStruct((q_count, k), jnp.float32),
            jax.ShapeDtypeStruct((q_count, k), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(
                (query_tile, dim), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # int8 gallery in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # tiled scales in HBM
        ],
        out_specs=(
            pl.BlockSpec((query_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, gallery_tile, dim), jnp.int8),
            pltpu.VMEM((2, SCALE_CHUNK, gallery_tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(queries.astype(jnp.float32), gallery_q, s2d)
    return vals, idx


def topk_similarity_quantized_padded(queries, gallery, k=10, query_tile=256,
                                     gallery_tile=2048, interpret=False):
    """Pad-and-trim wrapper over ``topk_similarity_quantized``; ``gallery``
    is an ``ops.quant.QuantizedGallery``."""
    q_count = queries.shape[0]
    g_count = gallery.values.shape[0]

    def pad_rows(x, mult):
        rem = (-x.shape[0]) % mult
        if rem == 0:
            return x
        pad_shape = (rem,) + x.shape[1:]
        return jnp.concatenate([x, jnp.zeros(pad_shape, x.dtype)], axis=0)

    vals, idx = topk_similarity_quantized(
        pad_rows(queries, query_tile),
        pad_rows(gallery.values, gallery_tile),
        pad_rows(gallery.scales, gallery_tile),
        k, query_tile, gallery_tile,
        valid_gallery=g_count,
        interpret=interpret,
    )
    return vals[:q_count], idx[:q_count]


def topk_similarity_padded(queries, gallery, k=10, query_tile=256,
                           gallery_tile=2048, interpret=False,
                           compute_dtype=jnp.float32):
    """Pad-and-trim wrapper for arbitrary Q/G.  Padded gallery rows are
    masked to ``NEG_INF`` *inside* the kernel (static ``valid_gallery``
    bound), so they can never displace real items."""
    q_count, _ = queries.shape
    g_count = gallery.shape[0]

    def pad_rows(x, mult):
        rem = (-x.shape[0]) % mult
        if rem == 0:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((rem, x.shape[1]), x.dtype)], axis=0
        )

    vals, idx = topk_similarity(
        pad_rows(queries, query_tile),
        pad_rows(gallery, gallery_tile),
        k, query_tile, gallery_tile,
        valid_gallery=g_count,
        interpret=interpret,
        compute_dtype=compute_dtype,
    )
    return vals[:q_count], idx[:q_count]
