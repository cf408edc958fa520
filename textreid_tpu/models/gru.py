"""Bi-directional GRU text encoder.

TPU-native re-design of the reference text branch
(`/root/reference/lib/models/backbones/gru.py`):

* The reference sorts the batch by length, packs, runs cuDNN GRU, and
  unsorts (gru.py:66-82).  Sorting and packing are hostile to XLA's
  static-shape compilation model, so here each direction is a masked
  ``lax.scan`` over a fixed ``[B, T]`` token grid.  The backward
  direction is fed a per-sample reversed sequence (position ``t`` reads
  token ``len-1-t``), which reproduces packed-sequence semantics where
  the reverse pass starts at each sample's own last valid token.
* The input-side projections of all three gates for every timestep are
  hoisted out of the scan into a single ``[B*T, E] x [E, 3H]`` matmul
  (MXU-friendly); the scan body only performs the small recurrent
  matmul and gate arithmetic.
* Gate math matches ``torch.nn.GRU`` with ``bias=False``
  (gru.py:36-43): ``r = sigma(W_ir x + W_hr h)``, ``z = sigma(W_iz x + W_hz h)``,
  ``n = tanh(W_in x + r * (W_hn h))``, ``h' = (1-z) n + z h``.
* Max-over-time pooling reproduces the reference exactly
  (gru.py:62-64): ``pad_packed_sequence`` pads to the *batch* max length
  with zeros, so a zero participates in the max for every sample shorter
  than the longest one in its batch, while the longest sample keeps
  genuinely negative channels.  See ``masked_max_pool``; verified against
  the actual torch code in tests/test_reference_oracle.py.

Token embedding follows gru.py:24-34: a learnable embedding table when
``ONEHOT == "yes"``, otherwise a frozen lookup table (e.g. CLIP's token
embedding loaded from ``clip_vocab_vit.npy``) with an optional Linear
adapter when the table width differs from the GRU input width.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _embed_lookup(table: Array, token_ids: Array) -> Array:
    """Embedding lookup (plain gather).

    A one-hot-matmul variant for small tables was built and measured in
    round 4: the isolated gather is slow (~80 GB/s, 0.35 ms/step) and the
    contraction beats it standalone, but inside the FULL train step the
    matmul version regressed the step 96.4 -> 101.0 ms (new
    dynamic-update-slice ops + longer scan whiles in the traced
    breakdown) — XLA's global schedule lost more than the gather saved.
    Keep the gather; the trace artifacts carry the evidence."""
    return jnp.take(table, token_ids, axis=0)


def torch_rnn_init(hidden_dim: int) -> Callable:
    """torch GRU default init: U(-1/sqrt(H), 1/sqrt(H))."""
    k = 1.0 / (hidden_dim**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-k, maxval=k)

    return init


def gru_scan(
    x_gates: Array,
    w_h: Array,
    h0: Array,
    *,
    reverse: bool = False,
) -> Array:
    """Run a single-direction GRU over precomputed input gates.

    Args:
      x_gates: ``[B, T, 3H]`` input-side gate pre-activations, gate order
        ``(r, z, n)`` along the last axis (torch ``weight_ih`` layout).
      w_h: ``[H, 3H]`` recurrent weight (transposed torch ``weight_hh``).
      h0: ``[B, H]`` initial hidden state.
      reverse: scan the time axis back-to-front.

    Returns:
      ``[B, T, H]`` hidden states for every timestep.
    """
    hidden = h0.shape[-1]

    def step(h, xg):
        hg = h @ w_h
        r = jax.nn.sigmoid(xg[:, :hidden] + hg[:, :hidden])
        z = jax.nn.sigmoid(xg[:, hidden : 2 * hidden] + hg[:, hidden : 2 * hidden])
        n = jnp.tanh(xg[:, 2 * hidden :] + r * hg[:, 2 * hidden :])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    xs = jnp.swapaxes(x_gates, 0, 1)  # [T, B, 3H] for scan
    _, ys = jax.lax.scan(step, h0, xs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)  # [B, T, H]


def masked_max_pool(x: Array, lengths: Array, mode: str = "batch") -> Array:
    """Max over valid time steps with torch pad-packed semantics
    (reference gru.py:62-64): positions ``t >= len_b`` are excluded, and a
    zero additionally participates for every sample shorter than the *batch*
    max length (pad_packed_sequence pads to the batch max, filling zeros).

    ``mode="batch"`` reproduces that exactly — which makes the embedding
    depend on the batch composition, just like the reference.  Serving
    needs packing-invariant embeddings, so ``mode="always"`` lets the zero
    participate for every sample with any padded position (equivalent for
    the overwhelmingly common case where the sample is shorter than the
    padded grid, and independent of what else is in the batch)."""
    seq = x.shape[1]
    valid = (jnp.arange(seq)[None, :] < lengths[:, None])[..., None]
    m = jnp.max(jnp.where(valid, x, -jnp.inf), axis=1)  # [B, C]
    if mode == "batch":
        has_pad = (lengths < jnp.max(lengths))[:, None]
    elif mode == "always":
        has_pad = (lengths < seq)[:, None]
    else:
        raise ValueError(f"Unknown pool mode: {mode}")
    return jnp.where(has_pad, jnp.maximum(m, 0.0), m)


def reverse_padded(x: Array, lengths: Array) -> Array:
    """Per-sample time reversal of the valid prefix: out[b, t] = x[b, len_b-1-t].

    Positions ``t >= len_b`` hold out-of-prefix values and must be masked by
    the caller.  Implemented as a gather with clipped indices (static shape).
    """
    seq = x.shape[1]
    t_idx = jnp.arange(seq)[None, :]
    src = jnp.clip(lengths[:, None] - 1 - t_idx, 0, seq - 1)
    return jnp.take_along_axis(x, src[..., None], axis=1)


class BiGRUEncoder(nn.Module):
    """Bi-GRU over embedded tokens with masked max-over-time pooling."""

    hidden_dim: int = 512
    vocab_size: int = 12000
    embed_size: int = 512
    num_layers: int = 1
    bidirectional: bool = True
    use_onehot: str = "yes"
    # Factory returning the frozen [vocab, table_width] lookup table when
    # ``use_onehot != "yes"`` (e.g. CLIP token embeddings from
    # clip_vocab_vit.npy).  Stored in the non-trainable "constants"
    # collection at init time.
    frozen_table_init: Optional[Callable[[], jnp.ndarray]] = None
    # Explicit opt-in for the fixed-random-table fallback when no frozen
    # table is supplied (unit tests / synthetic smoke runs only).  Without
    # it a missing table is a hard error — see utils/vocab.py.
    allow_random_table: bool = False
    # Fused Pallas scan kernel (ops/gru_pallas.py): Pallas forward with a
    # custom VJP that differentiates the bit-identical XLA scan, so it is
    # usable in training and serving alike.
    use_pallas: bool = False
    # Inter-layer dropout (torch GRU semantics: between layers only,
    # 1 - DROPOUT_KEEP_PROB); no-op with a single layer.
    dropout_rate: float = 0.0
    # Max-pool zero-participation rule: "batch" = torch pad-packed parity
    # (batch-composition-dependent, like the reference); "always" =
    # packing-invariant (serving). See masked_max_pool.
    pool_mode: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.hidden_dim * 2 if self.bidirectional else self.hidden_dim

    def embed_tokens(self, token_ids: Array) -> Array:
        if self.use_onehot == "yes":
            table = self.param(
                "token_embedding",
                nn.initializers.normal(stddev=1.0),
                (self.vocab_size, self.embed_size),
                jnp.float32,  # f32 master copy
            )
            # torch nn.Embedding(padding_idx=0) zeroes the pad row.
            table = table.at[0].set(0.0).astype(self.dtype)
            return _embed_lookup(table, token_ids)

        if self.frozen_table_init is not None:
            init_fn = lambda: jnp.asarray(self.frozen_table_init(), self.dtype)  # noqa: E731
        elif self.allow_random_table:
            # Explicitly-requested fallback (unit tests / synthetic runs):
            # a fixed random table keeps shapes correct.
            init_fn = lambda: jax.random.normal(  # noqa: E731
                jax.random.PRNGKey(0), (self.vocab_size, self.embed_size), self.dtype
            )
        else:
            raise ValueError(
                f"use_onehot={self.use_onehot!r} needs a frozen token table "
                "(frozen_table_init), or allow_random_table=True for "
                "synthetic runs."
            )
        table = self.variable("constants", "frozen_token_table", init_fn).value
        embedded = _embed_lookup(table, token_ids)
        if table.shape[-1] != self.embed_size:
            embedded = nn.Dense(self.embed_size, dtype=self.dtype, name="embed_adapter")(
                embedded
            )
        return embedded

    @nn.compact
    def __call__(self, token_ids: Array, lengths: Array,
                 deterministic: bool = True) -> Array:
        """token_ids: [B, T] int32, lengths: [B] int32 -> [B, out_channels].

        Multi-layer semantics match ``torch.nn.GRU``: layer ``l+1`` consumes
        the concatenation of *both* directions of layer ``l``; inter-layer
        dropout (``1 - DROPOUT_KEEP_PROB``) applies to every layer output
        except the last (gru.py:36-43).
        """
        x = self.embed_tokens(token_ids)
        batch, seq, _ = x.shape
        lengths = jnp.clip(lengths, 1, seq)

        init = torch_rnn_init(self.hidden_dim)

        def direction_weights(name, layer, in_dim):
            w_i = self.param(
                f"{name}_w_ih_l{layer}", init,
                (in_dim, 3 * self.hidden_dim), jnp.float32,
            ).astype(self.dtype)
            w_h = self.param(
                f"{name}_w_hh_l{layer}", init,
                (self.hidden_dim, 3 * self.hidden_dim), jnp.float32,
            ).astype(self.dtype)
            return w_i, w_h

        def input_gates(inputs, w_i):
            in_dim = inputs.shape[-1]
            return (inputs.reshape(batch * seq, in_dim) @ w_i).reshape(
                batch, seq, 3 * self.hidden_dim
            )

        def run_direction(inputs, name, layer):
            w_i, w_h = direction_weights(name, layer, inputs.shape[-1])
            x_gates = input_gates(inputs, w_i)
            h0 = jnp.zeros((batch, self.hidden_dim), self.dtype)
            if self.use_pallas:
                from ..ops.gru_pallas import gru_scan_auto

                return gru_scan_auto(x_gates, w_h, h0)
            return gru_scan(x_gates, w_h, h0)

        layer_in = x
        for layer in range(self.num_layers):
            is_last = layer == self.num_layers - 1
            if self.use_pallas and self.bidirectional and is_last:
                # Fused kernel for the output layer: both directions scanned
                # interleaved and the masked max-over-time pooled in VMEM —
                # the [B, T, H] per-step hidden states never touch HBM
                # (ops/gru_pallas.bigru_pooled_scan).
                from ..ops.gru_pallas import bigru_pooled_scan

                wi_f, wh_f = direction_weights("fwd", layer, layer_in.shape[-1])
                wi_b, wh_b = direction_weights("bwd", layer, layer_in.shape[-1])
                xg_f = input_gates(layer_in, wi_f)
                xg_b = input_gates(reverse_padded(layer_in, lengths), wi_b)
                return bigru_pooled_scan(xg_f, xg_b, wh_f, wh_b, lengths,
                                         pool_mode=self.pool_mode)

            out_fwd = run_direction(layer_in, "fwd", layer)
            if self.bidirectional:
                rev_in = reverse_padded(layer_in, lengths)
                out_bwd = reverse_padded(
                    run_direction(rev_in, "bwd", layer), lengths
                )
                layer_out = jnp.concatenate([out_fwd, out_bwd], axis=-1)
            else:
                layer_out = out_fwd
            if self.dropout_rate > 0 and layer < self.num_layers - 1:
                layer_out = nn.Dropout(self.dropout_rate)(
                    layer_out, deterministic=deterministic
                )
            layer_in = layer_out

        # Max over valid time steps (reference gru.py:62-64 max-pools the
        # pad-packed output).  torch's pad_packed_sequence pads only to the
        # *batch* max length, so zeros participate in the max exactly for
        # samples shorter than the longest one in their batch — the longest
        # sample keeps genuinely negative channels.  (Caught by running the
        # actual reference code as an oracle, tests/test_reference_oracle.py.)
        return masked_max_pool(layer_in, lengths, self.pool_mode)


def build_bigru(cfg, frozen_table_init=None,
                use_pallas: bool = False) -> BiGRUEncoder:
    """Constructor mirroring the reference builder (gru.py:91-117).

    ``use_pallas`` selects the fused Pallas scan (differentiable via its
    custom VJP; TPU only).  Only enabled for lane-aligned hidden sizes
    (H % 128 == 0) — unaligned tiny models fall back to the XLA scan."""
    use_pallas = use_pallas and cfg.MODEL.GRU.NUM_UNITS % 128 == 0
    return BiGRUEncoder(
        hidden_dim=cfg.MODEL.GRU.NUM_UNITS,
        vocab_size=cfg.MODEL.GRU.VOCABULARY_SIZE,
        embed_size=cfg.MODEL.GRU.EMBEDDING_SIZE,
        num_layers=cfg.MODEL.GRU.NUM_LAYER,
        bidirectional=True,
        use_onehot=cfg.MODEL.GRU.ONEHOT,
        frozen_table_init=frozen_table_init,
        allow_random_table=bool(cfg.TPU.ALLOW_RANDOM_VOCAB),
        use_pallas=use_pallas,
        dropout_rate=1.0 - cfg.MODEL.GRU.DROPOUT_KEEP_PROB,
    )
