"""Production retrieval serving API.

The reference stops at offline evaluation; this module packages the towers
for deployment: build a gallery index once (encode + L2-normalize + optional
mesh sharding), then answer free-text queries — or image queries (person
re-id by example), which the shared embedding space supports for free —
with top-k person matches.

Design: both towers are jitted once per batch shape; queries run at fixed
padded batch sizes so repeated calls never recompile.  Ranking uses the
streaming Pallas top-k on TPU (never materializing queries x gallery) and
``jax.lax.top_k`` elsewhere; galleries sharded over a mesh rank via
``evaluation.retrieval.sharded_topk_retrieval``.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .engine.state import TrainState
from .models.losses import l2_normalize


class RetrievalIndex:
    """An encoded, normalized gallery plus the query tower."""

    def __init__(
        self,
        model,
        state: TrainState,
        query_batch: int = 64,
        mesh=None,
        use_pallas: Optional[bool] = None,
        quantize: bool = False,
        int8_encode: bool = False,
        image_query_batch: int = 8,
    ):
        # Serving requires packing-invariant text embeddings: the training/
        # eval encoder reproduces torch's pad-packed max-pool, which depends
        # on the batch max length — fine for parity, wrong for a service
        # whose results must not change with how queries pack into batches.
        # Swap the text tower to the "always" zero-participation rule
        # (models.gru.masked_max_pool); parameters are unchanged.
        textual = getattr(model, "textual", None)
        if textual is not None and getattr(textual, "pool_mode", None) == "batch":
            model = model.clone(textual=textual.clone(pool_mode="always"))
        self.model = model
        self.state = state
        self.query_batch = query_batch
        self.image_query_batch = image_query_batch
        self.mesh = mesh
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        # off-TPU the Pallas kernels run in interpret mode (tests/dev boxes)
        self._interpret = jax.default_backend() != "tpu"
        # int8 gallery (ops/quant.py): 4x less HBM (so 4x the rows per
        # chip), int8 MXU scoring.  On a mesh each shard holds its rows in
        # int8 and ranks them with the quantized path
        # (evaluation.retrieval.sharded_topk_retrieval_quantized).
        self.quantize = quantize
        self.gallery: Optional[jax.Array] = None  # [G, D] normalized
        self.gallery_meta: Optional[np.ndarray] = None

        @jax.jit
        def _encode_images(state, pixels, erase):
            feat = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats,
                 "constants": state.constants},
                pixels, erase=erase, method="encode_image",
            )
            emb = model.apply({"params": state.params}, feat,
                              method="embed_image")
            return l2_normalize(emb.astype(jnp.float32), axis=1)

        # One definition of the text-tower forward; jitted standalone and
        # inlined un-jitted into the fused single-dispatch programs (see
        # _build_query_programs).  ``tower`` is the int8 text tower slot —
        # unused (None) on the float path; enable_int8_text swaps in an
        # embed that consumes it.  It rides every program as a jit
        # ARGUMENT, never a closure: the prepared tower holds the ~50 MB
        # token table and the axon compile relay rejects large constants.
        def _text_embed_float(state, tower, token_ids, lengths):
            del tower
            feat = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats,
                 "constants": state.constants},
                token_ids, lengths, method="encode_text",
            )
            emb = model.apply({"params": state.params}, feat,
                              method="embed_text")
            return l2_normalize(emb.astype(jnp.float32), axis=1)

        # int8 encode modes: "dataflow" (default for True) runs the true
        # int8-dataflow graph — models/int8_tower.py for m_resnet towers
        # (int8 activations between convs), models/int8_vit.py for ViT
        # towers (int8 block matmuls, two-level requant) — calibrated on
        # the first gallery batches; "intercept" uses the per-conv
        # interceptor (models/quant_tower.py) — the fallback for towers
        # with no dataflow graph (plain torchvision resnets).
        self._int8_pending = False
        if int8_encode:
            from .models.m_resnet import ModifiedResNet
            from .models.vit import VisionTransformer

            mode = ("dataflow" if int8_encode is True else int8_encode)
            if (mode == "dataflow"
                    and isinstance(self.model.visual,
                                   (ModifiedResNet, VisionTransformer))):
                self._int8_pending = True  # calibrate in build_gallery
            else:
                from .models.quant_tower import int8_image_encoder

                _encode_images = int8_image_encoder(self.model, state)
        self._encode_images = _encode_images
        self._build_query_programs(_text_embed_float, tower=None)
        self._text_embed_float = _text_embed_float

        interpret = self._interpret
        use_pallas = self.use_pallas
        PALLAS_K_MAX = self._PALLAS_K_MAX

        # Rank-only programs for queries that are ALREADY embeddings
        # (image queries, precomputed vectors).  Not fused with an encoder:
        # the image encoder is swappable at runtime (bf16 / int8-dataflow /
        # interceptor towers share one index), so fusing would freeze one
        # variant into the ranking executable.
        @functools.partial(jax.jit, static_argnames=("k",))
        def _rank_float(gallery, queries, k):
            if use_pallas and k <= PALLAS_K_MAX:
                from .ops.ranking_pallas import topk_similarity_padded

                return topk_similarity_padded(queries, gallery, k=k,
                                              interpret=interpret)
            sim = queries @ gallery.T
            return jax.lax.top_k(sim, min(k, int(gallery.shape[0])))

        @functools.partial(jax.jit, static_argnames=("k",))
        def _rank_quant(values, scales, queries, k):
            from .ops.quant import QuantizedGallery, quantized_topk

            gal = QuantizedGallery(values, scales)
            if use_pallas and k <= PALLAS_K_MAX:
                from .ops.ranking_pallas import (
                    topk_similarity_quantized_padded,
                )

                return topk_similarity_quantized_padded(
                    queries, gal, k=k, interpret=interpret)
            return quantized_topk(queries, gal, min(k, int(values.shape[0])))

        self._rank_float = _rank_float
        self._rank_quant = _rank_quant

    # The streaming kernel's one-at-a-time insertion merge is built for
    # small k (its trip count scales with insertions); past this bound the
    # materializing sort path wins and the score matrix at the 256-query
    # bucket is modest (G rows x 1 KB).  k is a static compile parameter,
    # so the route costs nothing at runtime.
    _PALLAS_K_MAX = 64

    def _build_query_programs(self, text_embed, tower) -> None:
        """Compile the fused single-dispatch query path (single-device):
        text encode + L2-norm + ranking as ONE jitted program.  The
        two-phase path costs >= 2 device dispatches plus a D2H/H2D
        round-trip of the query embeddings between them; through a
        remote-dispatch relay (or any RPC-fronted accelerator) dispatches
        dominate serving latency (bench.py --server, round 3: ~25 ms
        each).  Shapes stay canonical (k and the query bucket are
        static), so steady-state traffic compiles at most once per
        (bucket, k) pair.

        ``text_embed(state, tower, token_ids, lengths)`` is the query
        embed; ``tower`` is its pytree argument (None for the float
        tower, the prepared Int8Text after enable_int8_text).  Built
        fresh per embed swap — the jits cache on function identity, so
        mutating a shared closure would serve stale programs."""
        use_pallas = self.use_pallas
        interpret = self._interpret
        PALLAS_K_MAX = self._PALLAS_K_MAX

        @functools.partial(jax.jit, static_argnames=("k",))
        def _fused_float(state, tower, gallery, token_ids, lengths, k):
            q = text_embed(state, tower, token_ids, lengths)
            if use_pallas and k <= PALLAS_K_MAX:
                from .ops.ranking_pallas import topk_similarity_padded

                return topk_similarity_padded(q, gallery, k=k,
                                              interpret=interpret)
            sim = q @ gallery.T
            return jax.lax.top_k(sim, min(k, int(gallery.shape[0])))

        @functools.partial(jax.jit, static_argnames=("k",))
        def _fused_quant(state, tower, values, scales, token_ids,
                         lengths, k):
            from .ops.quant import QuantizedGallery, quantized_topk

            q = text_embed(state, tower, token_ids, lengths)
            gal = QuantizedGallery(values, scales)
            if use_pallas and k <= PALLAS_K_MAX:
                from .ops.ranking_pallas import (
                    topk_similarity_quantized_padded,
                )

                return topk_similarity_quantized_padded(
                    q, gal, k=k, interpret=interpret)
            return quantized_topk(q, gal, min(k, int(values.shape[0])))

        self._text_tower = tower
        self._fused_float = _fused_float
        self._fused_quant = _fused_quant
        self._encode_texts = jax.jit(text_embed)

    def enable_int8_text(self, calib_batches) -> None:
        """Swap the query text encoder to the int8-dataflow text
        transformer (models/int8_text.py), calibrated on
        ``calib_batches``: an iterable of ``(token_ids [B, T] int32,
        lengths [B] int32)`` with the serving query distribution (e.g.
        dataset captions).  Rebuilds the fused search programs around the
        int8 graph; the textual tower must be a TextTransformer (raises
        NotImplementedError for the bi-GRU)."""
        from .models.int8_text import (
            calibrate_text_amax,
            int8_text_apply,
            prepare_int8_text,
        )
        from .models.text_transformer import TextTransformer

        textual = self.model.textual
        if not isinstance(textual, TextTransformer):
            raise NotImplementedError(
                f"int8 text encode needs a TextTransformer tower; got "
                f"{type(textual).__name__}")
        model = self.model
        tparams = self.state.params["textual"]
        amax = calibrate_text_amax(textual, tparams, calib_batches)
        tower = prepare_int8_text(textual, tparams, amax)

        def _text_embed_int8(state, tower, token_ids, lengths):
            feat = int8_text_apply(textual, tower, token_ids, lengths)
            emb = model.apply({"params": state.params}, feat,
                              method="embed_text")
            return l2_normalize(emb.astype(jnp.float32), axis=1)

        self._build_query_programs(_text_embed_int8, tower=tower)

    # -- gallery ----------------------------------------------------------
    def build_gallery(self, batches, meta=None, valid_rows=None) -> None:
        """Encode an iterable of pixel batches ([B,H,W,3] uint8/f32) into
        the index.  ``meta`` optionally carries per-image ids.

        ``valid_rows`` drops trailing rows after encoding: callers that
        pad their LAST batch to a fixed compiled shape (e.g.
        tools/build_index.py) pass the true row count so duplicate pad
        rows never enter the index — a pad duplicate would rank like its
        source image and displace a real result from top-k."""
        if self._int8_pending:
            batches = self._build_int8_encoder(batches)
        chunks = []
        for batch in batches:
            pixels = jnp.asarray(batch)
            erase = jnp.zeros((pixels.shape[0], 5), jnp.int32)
            chunks.append(self._encode_images(self.state, pixels, erase))
        self.gallery = jnp.concatenate(chunks, axis=0)
        if valid_rows is not None:
            self.gallery = self.gallery[:valid_rows]
        self.gallery_meta = (
            np.asarray(meta)[: self.gallery.shape[0]] if meta is not None
            else np.arange(self.gallery.shape[0])
        )
        if self.quantize and self.mesh is None:
            from .ops.quant import quantize_rows

            self._quant_gallery = quantize_rows(self.gallery)
        self._finalize_mesh_gallery()

    def _build_int8_encoder(self, batches):
        """Calibrate the int8-dataflow tower on the first gallery batches
        and swap it in as the image encoder; returns an iterable replaying
        every batch (calibration ones included)."""
        import itertools

        batches = iter(batches)
        calib = list(itertools.islice(batches, 4))
        if not calib:
            raise ValueError("build_gallery needs at least one batch")
        from .models.vit import VisionTransformer

        if isinstance(self.model.visual, VisionTransformer):
            from .models.int8_vit import build_int8_vit_encoder

            encode, tower = build_int8_vit_encoder(self.model, self.state,
                                                   calib)
        else:
            from .models.int8_tower import build_int8_encoder

            encode, tower = build_int8_encoder(self.model, self.state, calib)
        self._encode_images = (
            lambda state, pixels, erase: encode(state, tower, pixels, erase)
        )
        self._int8_pending = False
        return itertools.chain(calib, batches)

    def _finalize_mesh_gallery(self) -> None:
        """Pad/augment and shard ``self.gallery`` over the mesh (no-op
        single-device).  Called by both build_gallery and load_index so a
        persisted index is always the CLEAN [G, D] matrix and topology
        artifacts never leak between instances."""
        self._augmented = False
        if self.mesh is None:
            return
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.mesh import DATA_AXIS

        n = self.mesh.shape[DATA_AXIS]
        g, d = self.gallery.shape
        if g % n:
            # Pad with rows whose similarity is guaranteed below any
            # cosine score: augment a feature column — real rows [g, 0],
            # pad rows [0, -2], queries [q, 1] -> pad score = -2 < -1.
            pad = n - g % n
            real = jnp.concatenate(
                [self.gallery, jnp.zeros((g, 1), self.gallery.dtype)],
                axis=1,
            )
            pads = jnp.concatenate(
                [jnp.zeros((pad, d)), jnp.full((pad, 1), -2.0)], axis=1
            )
            self.gallery = jnp.concatenate([real, pads], axis=0)
            self._augmented = True
        self.gallery = jax.device_put(
            self.gallery, NamedSharding(self.mesh, P(DATA_AXIS))
        )
        if self.quantize:
            # Quantize the TOPOLOGY form (augmented/padded), so pad rows
            # keep their guaranteed-losing score: a pad row [0...0, -2]
            # quantizes to scale 2/127, values [0...0, -127] — dequantized
            # score exactly -2 against 1-augmented queries.  Real rows are
            # unchanged by the appended zero column (same per-row absmax).
            # A persisted index stores the CLEAN quant form; re-derive.
            from .ops.quant import quantize_rows

            self._quant_gallery = quantize_rows(self.gallery)

    def _clean_gallery(self) -> np.ndarray:
        """The un-augmented [G, D] gallery regardless of mesh topology."""
        gallery = np.asarray(self.gallery)
        if self._augmented:
            gallery = gallery[: len(self.gallery_meta), :-1]
        return gallery

    def save_index(self, path: str) -> None:
        """Persist the encoded gallery (embeddings + metadata + int8 form)
        so a serving replica can boot without re-encoding images.  Always
        stores the clean [G, D] matrix — mesh padding/augmentation is a
        per-instance topology artifact, re-derived at load — so an index
        built on any topology loads on any other."""
        assert self.gallery is not None, "call build_gallery first"
        payload = {
            "gallery": self._clean_gallery(),
            "meta": self.gallery_meta,
        }
        if self.quantize and self.mesh is None:
            # mesh instances hold the quantized TOPOLOGY form (augmented/
            # padded) — a per-instance artifact; loaders re-derive their own
            payload["quant_values"] = np.asarray(self._quant_gallery.values)
            payload["quant_scales"] = np.asarray(self._quant_gallery.scales)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)  # atomic, same contract as checkpointing

    def load_index(self, path: str) -> None:
        """Load an index written by :meth:`save_index` onto this instance's
        topology (single-device or mesh — independent of where it was
        built)."""
        # Read and decompress EVERY member into locals before touching
        # self: np.load is lazy per-member, so a truncated/mid-copy file
        # can fail on the second read — mutating state member-by-member
        # would leave the old gallery serving through the new file's
        # metadata (silently wrong IDs).  All-or-nothing keeps the
        # hot-reload contract: a load failure leaves the previous gallery.
        data = np.load(path)
        meta = data["meta"]
        gallery = data["gallery"]
        if "augmented" in data and bool(data["augmented"]):
            # legacy (round-3 pre-refactor) format persisted the mesh
            # topology artifact: [G+pad, D+1] with pad rows and an
            # augmented score column — strip back to the clean matrix
            gallery = gallery[: len(meta), :-1]
        stored_quant_usable = (
            "quant_values" in data
            # legacy-augmented files quantized the padded [G+pad, D+1]
            # matrix; re-derive from the clean gallery instead
            and data["quant_values"].shape == gallery.shape
        )
        quant = None
        if self.quantize and self.mesh is None and stored_quant_usable:
            from .ops.quant import QuantizedGallery

            quant = QuantizedGallery(
                values=jnp.asarray(data["quant_values"]),
                scales=jnp.asarray(data["quant_scales"]),
            )
        gallery = jnp.asarray(gallery)

        self.gallery_meta = meta
        self.gallery = gallery
        if self.quantize and self.mesh is None:
            if quant is None:
                from .ops.quant import quantize_rows

                quant = quantize_rows(gallery)
            self._quant_gallery = quant
        self._finalize_mesh_gallery()  # mesh path re-quantizes in here

    # -- queries ----------------------------------------------------------
    def encode_queries(self, token_ids: np.ndarray,
                       lengths: np.ndarray) -> np.ndarray:
        """Tokenized queries -> normalized embeddings [N, D] (numpy).

        Every DEVICE shape here is fixed ([query_batch, L] chunks); all
        variable-N slicing happens in numpy on the host.  A jax-level
        slice per distinct residual N would compile a new executable per
        request-batch size — observed as multi-second p95 latencies
        through the remote-compile relay (bench.py --server, round 3).
        """
        n = token_ids.shape[0]
        bs = self.query_batch
        out = []
        for start in range(0, n, bs):
            ids = token_ids[start : start + bs]
            lens = lengths[start : start + bs]
            pad = bs - ids.shape[0]
            if pad:
                ids = np.concatenate([ids, np.zeros((pad, ids.shape[1]),
                                                    ids.dtype)])
                lens = np.concatenate([lens, np.ones(pad, lens.dtype)])
            emb = self._encode_texts(
                self.state, self._text_tower, jnp.asarray(ids),
                jnp.asarray(lens)
            )
            out.append(np.asarray(emb))  # full fixed-shape chunk
        return np.concatenate(out, axis=0)[:n]

    def encode_image_queries(self, pixels: np.ndarray) -> np.ndarray:
        """Pixel queries [N,H,W,3] (uint8 or f32) -> normalized embeddings
        [N,D] (numpy), chunked at the fixed ``image_query_batch`` shape —
        the same no-recompile contract as :meth:`encode_queries`.  Routes
        through whichever image encoder the index runs (bf16, int8-dataflow
        after gallery calibration, interceptor)."""
        pixels = np.asarray(pixels)
        n = pixels.shape[0]
        bs = self.image_query_batch
        out = []
        for start in range(0, n, bs):
            chunk = pixels[start : start + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
            erase = jnp.zeros((bs, 5), jnp.int32)
            emb = self._encode_images(self.state, jnp.asarray(chunk), erase)
            out.append(np.asarray(emb))
        return np.concatenate(out, axis=0)[:n]

    def search(self, token_ids: np.ndarray, lengths: np.ndarray,
               k: int = 10):
        """Top-k gallery matches for tokenized text queries.

        Returns (scores [Q,k], gallery metadata [Q,k]).  Slots beyond the
        real gallery (k > |gallery|, or mesh padding rows) carry score
        ``-inf`` and metadata ``-1`` — a sentinel, never a clipped alias of
        a real id a score-ignoring caller could mistake for a match."""
        assert self.gallery is not None, "call build_gallery first"
        n_q = token_ids.shape[0]
        # Canonicalize the query count to 256-row buckets (the kernel's
        # query tile) IN NUMPY, and slice results back in numpy: letting a
        # raw N reach the device ops compiles a new executable per
        # distinct request-batch size (multi-second p95 through the
        # remote-compile relay; bench.py --server).  Zero-pad rows rank
        # arbitrarily and are sliced off in _finish.
        bucket = 256
        q_pad = -(-n_q // bucket) * bucket

        if self.mesh is None:
            # fused single-dispatch path: pad the TOKENS (not embeddings)
            # and run encode + ranking as one device program
            ids = np.asarray(token_ids, np.int32)
            lens = np.asarray(lengths, np.int32)
            if q_pad != n_q:
                ids = np.concatenate(
                    [ids, np.zeros((q_pad - n_q, ids.shape[1]), ids.dtype)])
                lens = np.concatenate(
                    [lens, np.ones(q_pad - n_q, lens.dtype)])
            if self.quantize:
                vals, idx = self._fused_quant(
                    self.state, self._text_tower,
                    self._quant_gallery.values,
                    self._quant_gallery.scales, jnp.asarray(ids),
                    jnp.asarray(lens), k)
            else:
                vals, idx = self._fused_float(
                    self.state, self._text_tower, self.gallery,
                    jnp.asarray(ids), jnp.asarray(lens), k)
        else:
            vals, idx = self._rank_embedded(
                self.encode_queries(token_ids, lengths), k)
        return self._finish(vals, idx, n_q, k)

    def search_by_image(self, pixels: np.ndarray, k: int = 10):
        """Top-k gallery matches for pixel queries [N,H,W,3] — person
        re-identification by example: the shared embedding space ranks
        image queries against the same image gallery the text path serves.
        Return contract identical to :meth:`search` (scores [N,k],
        metadata [N,k], sentinel ``-inf``/``-1`` beyond the real gallery).

        Two dispatches (encode, rank) rather than the text path's fused
        one — see the rank-only program note in ``__init__``."""
        assert self.gallery is not None, "call build_gallery first"
        n_q = np.asarray(pixels).shape[0]
        queries = self.encode_image_queries(pixels)
        vals, idx = self._rank_embedded(queries, k)
        return self._finish(vals, idx, n_q, k)

    def _rank_embedded(self, queries: np.ndarray, k: int):
        """Rank already-normalized query embeddings [N,D]: pad to the
        256-row bucket (host-side, same no-recompile rationale as
        :meth:`search`), run the single-device or mesh-sharded ranking
        program, return device results still padded to the bucket."""
        n_q = queries.shape[0]
        bucket = 256
        q_pad = -(-n_q // bucket) * bucket
        if q_pad != n_q:
            queries = np.concatenate(
                [queries, np.zeros((q_pad - n_q, queries.shape[1]),
                                   queries.dtype)])
        if self.mesh is None:
            q = jnp.asarray(queries)
            if self.quantize:
                return self._rank_quant(
                    self._quant_gallery.values, self._quant_gallery.scales,
                    q, k)
            return self._rank_float(self.gallery, q, k)

        queries = jnp.asarray(queries)
        from .evaluation.retrieval import (
            sharded_topk_retrieval,
            sharded_topk_retrieval_quantized,
        )

        if self._augmented:
            queries = jnp.concatenate(
                [queries, jnp.ones((queries.shape[0], 1), queries.dtype)],
                axis=1,
            )
        # clamp to the (padded) row count: requesting more is both
        # infeasible per-shard and pointless — the sentinel padding
        # in _finish fills the remaining slots
        k_run = min(k, int(self.gallery.shape[0]))
        if self.quantize:
            return sharded_topk_retrieval_quantized(
                self.mesh, queries, self._quant_gallery, k=k_run,
                use_pallas=self.use_pallas, interpret=self._interpret,
            )
        return sharded_topk_retrieval(
            self.mesh, queries, self.gallery, k=k_run,
            use_pallas=self.use_pallas, interpret=self._interpret,
        )

    def _finish(self, vals, idx, n_q: int, k: int):
        """Trim bucket padding, pad k out to the request (XLA top_k caps at
        the gallery size), and map device row indices to caller metadata
        with the sentinel contract (-inf score, -1 meta)."""
        n_real = len(self.gallery_meta)
        vals, idx_np = np.asarray(vals)[:n_q], np.asarray(idx)[:n_q]
        if vals.shape[1] < k:
            pad = k - vals.shape[1]
            vals = np.pad(vals, ((0, 0), (0, pad)),
                          constant_values=-np.inf)
            idx_np = np.pad(idx_np, ((0, 0), (0, pad)), constant_values=-1)
        valid = (idx_np >= 0) & (idx_np < n_real)
        vals = np.where(valid, vals, -np.inf)
        meta = np.where(
            valid, self.gallery_meta[np.clip(idx_np, 0, n_real - 1)], -1
        )
        return vals, meta
