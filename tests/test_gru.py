"""Bi-GRU parity against torch.nn.GRU with packed variable-length sequences.

The torch packed-sequence pipeline (sort -> pack -> cuDNN GRU -> unpack ->
max-over-time) is the behavior contract of the reference text encoder
(`/root/reference/lib/models/backbones/gru.py:48-82`).  Our masked-scan
formulation must match it bit-for-bit (up to fp32 tolerance), including the
backward direction starting at each sample's own last valid token and the
padded positions pooling as exact zeros.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from textreid_tpu.models.gru import (
    BiGRUEncoder,
    gru_scan,
    masked_max_pool,
    reverse_padded,
)


def torch_bigru_maxpool(x, lengths, w_ih_f, w_hh_f, w_ih_b, w_hh_b, hidden):
    """Oracle: torch GRU (bias=False, bidirectional) + packed sequences +
    max over time of the zero-padded output."""
    gru = torch.nn.GRU(
        x.shape[-1], hidden, num_layers=1, bias=False, bidirectional=True,
        batch_first=True,
    )
    with torch.no_grad():
        gru.weight_ih_l0.copy_(torch.from_numpy(w_ih_f))
        gru.weight_hh_l0.copy_(torch.from_numpy(w_hh_f))
        gru.weight_ih_l0_reverse.copy_(torch.from_numpy(w_ih_b))
        gru.weight_hh_l0_reverse.copy_(torch.from_numpy(w_hh_b))

    xt = torch.from_numpy(x)
    lens = torch.from_numpy(lengths)
    order = torch.argsort(lens, descending=True)
    inv = torch.argsort(order)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        xt[order], lens[order], batch_first=True
    )
    out, _ = gru(packed)
    # NB: like the reference (gru.py:78-79), pad_packed_sequence pads only
    # to the *batch* max length — the longest sample gets no zero padding.
    out, _ = torch.nn.utils.rnn.pad_packed_sequence(out, batch_first=True)
    out = out[inv]
    return out.max(dim=1).values.detach().numpy()


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(7)
    b, t, e, h = 5, 12, 8, 6
    x = rng.randn(b, t, e).astype(np.float32)
    lengths = np.array([12, 3, 7, 1, 9], dtype=np.int64)
    w_ih_f = (rng.randn(3 * h, e) * 0.3).astype(np.float32)
    w_hh_f = (rng.randn(3 * h, h) * 0.3).astype(np.float32)
    w_ih_b = (rng.randn(3 * h, e) * 0.3).astype(np.float32)
    w_hh_b = (rng.randn(3 * h, h) * 0.3).astype(np.float32)
    return b, t, e, h, x, lengths, w_ih_f, w_hh_f, w_ih_b, w_hh_b


def jax_bigru_maxpool(x, lengths, w_ih_f, w_hh_f, w_ih_b, w_hh_b, h):
    """Drive the scan primitives exactly the way BiGRUEncoder does."""
    xj = jnp.asarray(x)
    lens = jnp.asarray(lengths, jnp.int32)
    b, t, _ = xj.shape

    def run(inputs, w_ih, w_hh):
        gates = jnp.einsum("bte,ge->btg", inputs, jnp.asarray(w_ih))
        return gru_scan(gates, jnp.asarray(w_hh).T, jnp.zeros((b, h)))

    out_f = run(xj, w_ih_f, w_hh_f)
    out_b = reverse_padded(run(reverse_padded(xj, lens), w_ih_b, w_hh_b), lens)
    out = jnp.concatenate([out_f, out_b], axis=-1)
    return np.asarray(masked_max_pool(out, lens))


class TestGRUParity:
    def test_variable_length_bidirectional(self, problem):
        b, t, e, h, x, lengths, wf, whf, wb, whb = problem
        want = torch_bigru_maxpool(x, lengths, wf, whf, wb, whb, h)
        got = jax_bigru_maxpool(x, lengths, wf, whf, wb, whb, h)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_full_length_no_padding(self, problem):
        b, t, e, h, x, _, wf, whf, wb, whb = problem
        lengths = np.full(b, t, dtype=np.int64)
        want = torch_bigru_maxpool(x, lengths, wf, whf, wb, whb, h)
        got = jax_bigru_maxpool(x, lengths, wf, whf, wb, whb, h)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_negative_activation_pads_pool_to_zero(self, problem):
        """The reference max-pools the zero-padded output, so a channel whose
        valid outputs are all negative pools to exactly 0 when the sample is
        shorter than the batch max (gru.py:62-64,78-79)."""
        b, t, e, h, x, _, wf, whf, wb, whb = problem
        lengths = np.array([3, 2, 4, 1, 2], dtype=np.int64)
        got = jax_bigru_maxpool(x, lengths, wf, whf, wb, whb, h)
        want = torch_bigru_maxpool(x, lengths, wf, whf, wb, whb, h)
        np.testing.assert_allclose(got, want, atol=1e-5)
        # padding wins in at least some channel for this seed
        assert (got == 0.0).any()

    def test_batch_max_sample_keeps_negative_channels(self, problem):
        """pad_packed_sequence pads only to the *batch* max length, so the
        longest sample in a batch gets NO zero participation — an
        all-negative channel must stay negative for it.  (Regression for a
        round-1 semantic bug found by running the actual reference code as
        an oracle, tests/test_reference_oracle.py.)"""
        b, t, e, h, x, _, wf, whf, wb, whb = problem
        # sample 0 is the batch max but shorter than the padded grid t=12
        lengths = np.array([6, 2, 4, 1, 2], dtype=np.int64)
        want = torch_bigru_maxpool(x, lengths, wf, whf, wb, whb, h)
        got = jax_bigru_maxpool(x, lengths, wf, whf, wb, whb, h)
        np.testing.assert_allclose(got, want, atol=1e-5)
        # the oracle itself must show a negative pooled channel for sample 0
        assert want[0].min() < 0.0
        # and everyone shorter than the batch max is clamped at >= 0
        assert got[1:].min() >= 0.0


class TestReversePadded:
    def test_reverses_valid_prefix(self):
        x = jnp.arange(2 * 5 * 1, dtype=jnp.float32).reshape(2, 5, 1)
        lens = jnp.array([3, 5], jnp.int32)
        r = reverse_padded(x, lens)
        np.testing.assert_array_equal(
            np.asarray(r[0, :3, 0]), np.array([2.0, 1.0, 0.0])
        )
        np.testing.assert_array_equal(
            np.asarray(r[1, :, 0]), np.array([9.0, 8.0, 7.0, 6.0, 5.0])
        )

    def test_involution_on_valid_prefix(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(3, 7, 4).astype(np.float32))
        lens = jnp.array([7, 2, 5], jnp.int32)
        rr = reverse_padded(reverse_padded(x, lens), lens)
        for i, ln in enumerate([7, 2, 5]):
            np.testing.assert_allclose(rr[i, :ln], x[i, :ln], atol=0)


class TestBiGRUEncoderModule:
    def test_shapes_and_determinism(self):
        enc = BiGRUEncoder(hidden_dim=16, vocab_size=50, embed_size=8)
        ids = jnp.array(np.random.RandomState(0).randint(1, 50, (4, 10)))
        lens = jnp.array([10, 4, 7, 1], jnp.int32)
        variables = enc.init(jax.random.PRNGKey(0), ids, lens)
        out1 = enc.apply(variables, ids, lens)
        out2 = enc.apply(variables, ids, lens)
        assert out1.shape == (4, 32)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_padding_tokens_do_not_change_output(self):
        """Tokens past `length` must not affect the encoding."""
        enc = BiGRUEncoder(hidden_dim=8, vocab_size=30, embed_size=4)
        rng = np.random.RandomState(1)
        ids_a = rng.randint(1, 30, (2, 9))
        ids_b = ids_a.copy()
        ids_b[:, 5:] = 0  # different pad tokens
        lens = jnp.array([5, 5], jnp.int32)
        variables = enc.init(jax.random.PRNGKey(0), jnp.array(ids_a), lens)
        out_a = enc.apply(variables, jnp.array(ids_a), lens)
        out_b = enc.apply(variables, jnp.array(ids_b), lens)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    def test_frozen_clip_table_mode(self):
        table = np.random.RandomState(2).randn(40, 8).astype(np.float32)
        enc = BiGRUEncoder(
            hidden_dim=8, vocab_size=40, embed_size=8, use_onehot="clip_vit",
            frozen_table_init=lambda: table,
        )
        ids = jnp.array([[1, 2, 3, 0]], jnp.int32)
        lens = jnp.array([3], jnp.int32)
        variables = enc.init(jax.random.PRNGKey(0), ids, lens)
        # the frozen table must land in 'constants', not trainable params
        assert "frozen_token_table" in variables["constants"]
        flat = jax.tree_util.tree_leaves(variables["params"])
        assert all(f.shape != (40, 8) for f in flat)
        out = enc.apply(variables, ids, lens)
        assert out.shape == (1, 16)


class TestMultiLayerBiGRU:
    def test_two_layer_parity_with_torch(self):
        """torch layer l+1 consumes the concat of both directions of layer l;
        verify the module reproduces a 2-layer bidirectional GRU exactly."""
        rng = np.random.RandomState(11)
        b, t, e, h, v = 4, 9, 6, 5, 30

        gru = torch.nn.GRU(e, h, num_layers=2, bias=False, bidirectional=True,
                           batch_first=True)
        ids = rng.randint(1, v, (b, t))
        lengths = np.array([9, 3, 6, 1], dtype=np.int64)
        table = rng.randn(v, e).astype(np.float32)
        x = table[ids]

        xt = torch.from_numpy(x)
        lens = torch.from_numpy(lengths)
        order = torch.argsort(lens, descending=True)
        inv = torch.argsort(order)
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            xt[order], lens[order], batch_first=True)
        out, _ = gru(packed)
        out, _ = torch.nn.utils.rnn.pad_packed_sequence(out, batch_first=True)
        want = out[inv].max(dim=1).values.detach().numpy()

        enc = BiGRUEncoder(hidden_dim=h, vocab_size=v, embed_size=e,
                           num_layers=2, use_onehot="yes")
        variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                             jnp.asarray(lengths, jnp.int32))
        params = dict(variables["params"])
        params["token_embedding"] = jnp.asarray(table)
        for layer in range(2):
            for name, tkey in [("fwd", ""), ("bwd", "_reverse")]:
                params[f"{name}_w_ih_l{layer}"] = jnp.asarray(
                    getattr(gru, f"weight_ih_l{layer}{tkey}").detach().numpy().T)
                params[f"{name}_w_hh_l{layer}"] = jnp.asarray(
                    getattr(gru, f"weight_hh_l{layer}{tkey}").detach().numpy().T)
        got = enc.apply({"params": params}, jnp.asarray(ids),
                        jnp.asarray(lengths, jnp.int32))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
