"""Cost ladder for the streaming top-k kernel's merge machinery.

Decomposes ``ops/ranking_pallas.topk_similarity`` (98k x 256 gallery,
1024 queries, k=10) into a ladder of kernel variants that differ only in
the fold, so the cost of the exact-ordering insertion machinery can be
separated from the mandatory work (DMA + MXU matmul + per-tile max):

- ``condonly``  — full kernel, but the insertion while-loop is never
  entered: the mandatory floor (DMA, matmul, per-tile max reduction,
  while-entry test).
- ``onetrip``   — at most one insertion trip per gallery tile.
- ``full``      — the shipped lex-live-set fold (mirrors
  ``ranking_pallas._fold_tile``).
- ``retire``    — an alternative body that retires the extracted maximum
  by overwriting the score tile (one fewer masked reduction per trip, but
  a full-tile write).
- ``rowgroupN`` — the fold applied independently to N row subgroups, so
  each group's while-loop gates on a max-order-statistic over fewer rows.
- ``shipped``   — ``topk_similarity`` itself, as deployed.

Round-4 conclusions from the on-chip run (v5e, committed as
BENCH_TOPK_LADDER.json; see NOTES.md "top-k floor" for the analysis):

- The while machinery itself is ~free (condonly ~= a fold-less kernel).
- Each insertion trip costs ~1.1 us (two [Qt, Gt] masked reductions);
  the shipped kernel takes ~273 trips per grid program because trips per
  tile equal the MAX-order-statistic of per-row insertion counts over
  the Qt lockstep rows (~3.4/tile even late in the stream).
- That statistic is invariant to how the gallery is tiled, which is why
  both a windowed fold (score windows of 256 columns: 2.54 ms) and this
  ladder's row-group variants (best 1.83 ms) measured WORSE than the
  full-tile fold (~1.7 ms): narrower windows multiply the fixed
  per-window costs without reducing total qualifying trips, and row
  subgroups shrink the trip statistic (3.4 -> ~1.7) but pay N while
  loops whose bodies are NOT N-times cheaper (sublane-tiled ops below
  8 rows round up).
- The mandatory floor (condonly) is ~0.55 ms at query_tile=256; the
  ~1.0 ms "skip-the-machinery" target from the round-3 sweep is
  therefore not reachable by any member of this insertion family while
  preserving index-exact f32 ordering — the gap IS the order statistic.

Usage (real chip):  python tools/topk_ladder.py [--out BENCH_TOPK_LADDER.json]
"""
from __future__ import annotations

import argparse
import functools
import json
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38


def fold_lex(run_vals, run_idx, scores, tile_base, k, max_passes, never):
    """The shipped lex-live-set fold (ranking_pallas._fold_tile), with
    knobs to cap or disable insertion trips for floor measurement."""
    qt, gt = scores.shape
    slot = jax.lax.broadcasted_iota(jnp.int32, (qt, k), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (qt, gt), 1)
    m0 = jnp.max(scores, axis=1, keepdims=True)

    def cond(carry):
        run_vals, _, m, _, _, passes = carry
        tau = run_vals[:, k - 1:k]
        qual = jnp.logical_and(m >= tau, m > NEG_INF)
        ok = jnp.logical_and(passes < max_passes, jnp.any(qual))
        if never:
            ok = jnp.logical_and(ok, passes < 0)
        return ok

    def body(carry):
        run_vals, run_idx, m, m_prev, im_prev, passes = carry
        live_tie = jnp.logical_or(m < m_prev, col < im_prev)
        im_col = jnp.max(
            jnp.where(jnp.logical_and(scores == m, live_tie), col, -1),
            axis=1, keepdims=True)
        im = im_col + tile_base
        ranks_above = jnp.logical_or(
            run_vals > m, jnp.logical_and(run_vals == m, run_idx > im))
        pos = jnp.sum(ranks_above.astype(jnp.int32), axis=1, keepdims=True)
        do = jnp.logical_and(pos < k, m > NEG_INF)
        shift_vals = jnp.concatenate([run_vals[:, :1], run_vals[:, :-1]], 1)
        shift_idx = jnp.concatenate([run_idx[:, :1], run_idx[:, :-1]], 1)
        new_vals = jnp.where(slot == pos, m,
                             jnp.where(slot > pos, shift_vals, run_vals))
        new_idx = jnp.where(slot == pos, im,
                            jnp.where(slot > pos, shift_idx, run_idx))
        run_vals = jnp.where(do, new_vals, run_vals)
        run_idx = jnp.where(do, new_idx, run_idx)
        live = jnp.logical_or(scores < m,
                              jnp.logical_and(scores == m, col < im_col))
        m_next = jnp.max(jnp.where(live, scores, NEG_INF), axis=1,
                         keepdims=True)
        return run_vals, run_idx, m_next, m, im_col, passes + 1

    big = jnp.full((qt, 1), jnp.inf, jnp.float32)
    big_col = jnp.full((qt, 1), gt, jnp.int32)
    run_vals, run_idx, _, _, _, _ = jax.lax.while_loop(
        cond, body, (run_vals, run_idx, m0, big, big_col, jnp.int32(0)))
    return run_vals, run_idx


def fold_retire(run_vals, run_idx, scores0, tile_base, k, max_passes):
    """Retire-write body: overwrite the extracted max in the score tile,
    trading one masked reduction per trip for a full-tile write."""
    qt, gt = scores0.shape
    slot = jax.lax.broadcasted_iota(jnp.int32, (qt, k), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (qt, gt), 1)
    m0 = jnp.max(scores0, axis=1, keepdims=True)

    def cond(carry):
        run_vals, _, _, m, passes = carry
        tau = run_vals[:, k - 1:k]
        qual = jnp.logical_and(m >= tau, m > NEG_INF)
        return jnp.logical_and(passes < max_passes, jnp.any(qual))

    def body(carry):
        run_vals, run_idx, scores, m, passes = carry
        eq = scores == m
        im_col = jnp.max(jnp.where(eq, col, -1), axis=1, keepdims=True)
        im = im_col + tile_base
        ranks_above = jnp.logical_or(
            run_vals > m, jnp.logical_and(run_vals == m, run_idx > im))
        pos = jnp.sum(ranks_above.astype(jnp.int32), axis=1, keepdims=True)
        do = jnp.logical_and(pos < k, m > NEG_INF)
        shift_vals = jnp.concatenate([run_vals[:, :1], run_vals[:, :-1]], 1)
        shift_idx = jnp.concatenate([run_idx[:, :1], run_idx[:, :-1]], 1)
        new_vals = jnp.where(slot == pos, m,
                             jnp.where(slot > pos, shift_vals, run_vals))
        new_idx = jnp.where(slot == pos, im,
                            jnp.where(slot > pos, shift_idx, run_idx))
        run_vals = jnp.where(do, new_vals, run_vals)
        run_idx = jnp.where(do, new_idx, run_idx)
        scores = jnp.where(jnp.logical_and(eq, col == im_col), NEG_INF,
                           scores)
        m_next = jnp.max(scores, axis=1, keepdims=True)
        return run_vals, run_idx, scores, m_next, passes + 1

    run_vals, run_idx, _, _, _ = jax.lax.while_loop(
        cond, body, (run_vals, run_idx, scores0, m0, jnp.int32(0)))
    return run_vals, run_idx


def _make_kernel(k, gallery_tile, num_tiles, fold, n_groups=1):
    def kernel(q_ref, g_hbm, vals_ref, idx_ref, g_scratch, sem):
        q = q_ref[:]
        qt = q.shape[0]
        rows = qt // n_groups

        def g_dma(slot, tile):
            return pltpu.make_async_copy(
                g_hbm.at[pl.ds(tile * gallery_tile, gallery_tile), :],
                g_scratch.at[slot], sem.at[slot])

        g_dma(0, 0).start()
        run_vals = jnp.full((qt, k), NEG_INF, jnp.float32)
        run_idx = jnp.full((qt, k), -1, jnp.int32)

        def tile_body(tile, carry):
            run_vals, run_idx = carry
            s = tile % 2

            @pl.when(tile + 1 < num_tiles)
            def _():
                g_dma((tile + 1) % 2, tile + 1).start()

            g_dma(s, tile).wait()
            scores = jax.lax.dot_general(
                q, g_scratch[s], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if n_groups == 1:
                return fold(run_vals, run_idx, scores, tile * gallery_tile)
            new_v, new_i = [], []
            for gidx in range(n_groups):
                sl = slice(gidx * rows, (gidx + 1) * rows)
                gv, gi = fold(run_vals[sl], run_idx[sl], scores[sl],
                              tile * gallery_tile)
                new_v.append(gv)
                new_i.append(gi)
            return (jnp.concatenate(new_v, 0), jnp.concatenate(new_i, 0))

        carry = jax.lax.fori_loop(0, num_tiles, tile_body,
                                  (run_vals, run_idx))
        vals_ref[:] = carry[0]
        idx_ref[:] = carry[1]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "qt", "gt", "variant", "n_groups"))
def run_variant(queries, gallery, k=10, qt=256, gt=2048, variant="full",
                n_groups=1):
    q_count, dim = queries.shape
    g_count = gallery.shape[0]
    fold = {
        "condonly": functools.partial(fold_lex, k=k, max_passes=k,
                                      never=True),
        "onetrip": functools.partial(fold_lex, k=k, max_passes=1,
                                     never=False),
        "full": functools.partial(fold_lex, k=k, max_passes=k, never=False),
        "retire": functools.partial(fold_retire, k=k, max_passes=k),
    }[variant]
    kernel = _make_kernel(k, gt, g_count // gt, fold, n_groups=n_groups)
    return pl.pallas_call(
        kernel,
        grid=(q_count // qt,),
        out_shape=(jax.ShapeDtypeStruct((q_count, k), jnp.float32),
                   jax.ShapeDtypeStruct((q_count, k), jnp.int32)),
        in_specs=[
            pl.BlockSpec((qt, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((qt, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((2, gt, dim), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )(queries, gallery)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="write the ladder JSON artifact here")
    ap.add_argument("--rows", type=int, default=98304)
    ap.add_argument("--queries", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from bench import _timed_loop
    from textreid_tpu.ops.ranking_pallas import topk_similarity

    kg, kq = jax.random.split(jax.random.PRNGKey(0))
    gallery = jax.random.normal(kg, (args.rows, args.dim), jnp.float32)
    queries = jax.random.normal(kq, (args.queries, args.dim), jnp.float32)
    gallery = gallery / jnp.linalg.norm(gallery, axis=1, keepdims=True)
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)
    jax.block_until_ready((gallery, queries))

    out = {"rows": args.rows, "queries": args.queries, "dim": args.dim,
           "k": args.k, "unit": "ms"}

    # exactness: every measured variant must agree with the shipped kernel
    sv, si = topk_similarity(queries, gallery, k=args.k)
    for variant, ng in (("retire", 1), ("full", 8)):
        vv, vi = run_variant(queries, gallery, k=args.k, variant=variant,
                             n_groups=ng)
        name = variant if ng == 1 else f"rowgroup{ng}"
        out[f"{name}_index_match"] = float(
            jnp.mean((vi == si).astype(jnp.float32)))

    secs = _timed_loop(
        lambda q, g: topk_similarity(q, g, k=args.k), (queries, gallery),
        iters=args.iters, no_perturb={1})
    out["shipped_ms"] = round(secs * 1e3, 4)

    for variant in ("condonly", "onetrip", "retire", "full"):
        for qt in (256, 512):
            fn = lambda q, g, v=variant, t=qt: run_variant(
                q, g, k=args.k, qt=t, variant=v)
            secs = _timed_loop(fn, (queries, gallery), iters=args.iters,
                               no_perturb={1})
            out[f"{variant}_qt{qt}_ms"] = round(secs * 1e3, 4)
            print(f"{variant}_qt{qt}: {secs * 1e3:.3f} ms", flush=True)

    # row subgroups: qt256 splits shrink the trip statistic but pay
    # per-group while overheads; (512, 2) keeps 256-row groups while
    # HALVING the mandatory re-stream (condonly qt512 ~= condonly
    # qt256 / 2) — measured at 983k it recovers only ~0.2 ms of that
    # saving because the groups' trips serialize inside one program.
    for qt, ng in ((256, 2), (256, 8), (512, 2)):
        fn = lambda q, g, t=qt, n=ng: run_variant(q, g, k=args.k, qt=t,
                                                  n_groups=n)
        secs = _timed_loop(fn, (queries, gallery), iters=args.iters,
                           no_perturb={1})
        out[f"rowgroup{ng}_qt{qt}_ms"] = round(secs * 1e3, 4)
        print(f"rowgroup{ng}_qt{qt}: {secs * 1e3:.3f} ms", flush=True)

    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
