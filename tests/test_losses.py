"""Loss library golden tests against torch oracles.

The oracles below re-derive each loss from its published formula
(instance/CE-label-smooth, global-align soft-margin, InfoNCE) directly with
torch ops, independent of the reference implementation, per the test
prescription in SURVEY.md section 4.1.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from textreid_tpu.models import losses


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def to_t(x):
    return torch.from_numpy(np.asarray(x)).float()


class TestInstanceLoss:
    def test_matches_torch_ce(self, rng):
        d, c, b = 16, 10, 8
        proj = rng.randn(d, c).astype(np.float32)
        v = rng.randn(b, d).astype(np.float32)
        t = rng.randn(b, d).astype(np.float32)
        labels = rng.randint(0, c, size=b)

        got = losses.instance_loss(jnp.array(proj), jnp.array(v), jnp.array(t),
                                   jnp.array(labels))

        proj_n = TF.normalize(to_t(proj), dim=0)
        want = TF.cross_entropy(to_t(v) @ proj_n, torch.tensor(labels)) + \
            TF.cross_entropy(to_t(t) @ proj_n, torch.tensor(labels))
        assert np.allclose(float(got), float(want), atol=1e-5)

    def test_label_smoothing(self, rng):
        d, c, b = 16, 10, 8
        eps = 0.1
        proj = rng.randn(d, c).astype(np.float32)
        v = rng.randn(b, d).astype(np.float32)
        t = rng.randn(b, d).astype(np.float32)
        labels = rng.randint(0, c, size=b)

        got = losses.instance_loss(jnp.array(proj), jnp.array(v), jnp.array(t),
                                   jnp.array(labels), epsilon=eps)

        # Oracle: smoothed targets (1-eps)*onehot + eps/C;
        # loss = (-targets * log_probs).mean(0).sum()   [Szegedy et al.]
        proj_n = TF.normalize(to_t(proj), dim=0)

        def smooth_ce(logits):
            logp = TF.log_softmax(logits, dim=1)
            tgt = TF.one_hot(torch.tensor(labels), c).float()
            tgt = (1 - eps) * tgt + eps / c
            return (-tgt * logp).mean(0).sum()

        want = smooth_ce(to_t(v) @ proj_n) + smooth_ce(to_t(t) @ proj_n)
        assert np.allclose(float(got), float(want), atol=1e-5)

    def test_norm_and_scale_flags(self, rng):
        d, c, b = 8, 5, 4
        proj = rng.randn(d, c).astype(np.float32)
        v = rng.randn(b, d).astype(np.float32)
        t = rng.randn(b, d).astype(np.float32)
        labels = rng.randint(0, c, size=b)
        got = losses.instance_loss(jnp.array(proj), jnp.array(v), jnp.array(t),
                                   jnp.array(labels), scale=8.0, norm=True)
        proj_n = TF.normalize(to_t(proj), dim=0)
        vn, tn = TF.normalize(to_t(v), dim=-1), TF.normalize(to_t(t), dim=-1)
        want = TF.cross_entropy(8.0 * vn @ proj_n, torch.tensor(labels)) + \
            TF.cross_entropy(8.0 * tn @ proj_n, torch.tensor(labels))
        assert np.allclose(float(got), float(want), atol=1e-5)


class TestGlobalAlignLoss:
    def test_matches_oracle(self, rng):
        b, d = 12, 16
        v = rng.randn(b, d).astype(np.float32)
        t = rng.randn(b, d).astype(np.float32)
        labels = rng.randint(0, 4, size=b)

        got = losses.global_align_loss(jnp.array(v), jnp.array(t),
                                       jnp.array(labels))

        vn, tn = TF.normalize(to_t(v), dim=1), TF.normalize(to_t(t), dim=1)
        sim = vn @ tn.t()
        lab = torch.tensor(labels)
        pos = lab.view(-1, 1) == lab.view(1, -1)
        loss_pos = torch.log1p(torch.exp(-10.0 * (sim[pos] - 0.6)))
        loss_neg = torch.log1p(torch.exp(40.0 * (sim[~pos] - 0.4)))
        want = (loss_pos.sum() + loss_neg.sum()) * 2.0 / b
        assert np.allclose(float(got), float(want), atol=1e-5)

    def test_from_sim_variant(self, rng):
        b = 6
        sim = np.tanh(rng.randn(b, b)).astype(np.float32)
        labels = rng.randint(0, 3, size=b)
        direct = losses.global_align_loss_from_sim(jnp.array(sim), jnp.array(labels))
        lab = torch.tensor(labels)
        pos = lab.view(-1, 1) == lab.view(1, -1)
        s = to_t(sim)
        want = (torch.log1p(torch.exp(-10.0 * (s[pos] - 0.6))).sum()
                + torch.log1p(torch.exp(40.0 * (s[~pos] - 0.4))).sum()) * 2.0 / b
        assert np.allclose(float(direct), float(want), atol=1e-5)


class TestInfoNCE:
    def test_matches_torch_ce(self, rng):
        n, k = 8, 32
        vp = rng.randn(n, 1).astype(np.float32)
        vn_ = rng.randn(n, k).astype(np.float32)
        tp = rng.randn(n, 1).astype(np.float32)
        tn_ = rng.randn(n, k).astype(np.float32)

        got = losses.infonce_loss(jnp.array(vp), jnp.array(vn_),
                                  jnp.array(tp), jnp.array(tn_), 0.07)

        zeros = torch.zeros(n, dtype=torch.long)
        want = TF.cross_entropy(torch.cat([to_t(vp), to_t(vn_)], 1) / 0.07, zeros) + \
            TF.cross_entropy(torch.cat([to_t(tp), to_t(tn_)], 1) / 0.07, zeros)
        assert np.allclose(float(got), float(want), atol=1e-5)

    def test_masked_negatives_equal_dropped_negatives(self, rng):
        """-inf-masked columns must give the same loss as physically removing
        those columns (the reference's dynamic neg_idx gather,
        moco_head/head.py:147-157)."""
        n, k = 4, 16
        vp = rng.randn(n, 1).astype(np.float32)
        vneg = rng.randn(n, k).astype(np.float32)
        tp = rng.randn(n, 1).astype(np.float32)
        tneg = rng.randn(n, k).astype(np.float32)
        drop = np.array([2, 7, 11])
        keep = np.setdiff1d(np.arange(k), drop)

        masked_v = vneg.copy()
        masked_t = tneg.copy()
        masked_v[:, drop] = -np.inf
        masked_t[:, drop] = -np.inf

        got = losses.infonce_loss(jnp.array(vp), jnp.array(masked_v),
                                  jnp.array(tp), jnp.array(masked_t))
        want = losses.infonce_loss(jnp.array(vp), jnp.array(vneg[:, keep]),
                                   jnp.array(tp), jnp.array(tneg[:, keep]))
        assert np.allclose(float(got), float(want), atol=1e-6)


class TestAuxLosses:
    def test_cmpc(self, rng):
        d, c, b = 8, 6, 5
        proj = rng.randn(d, c).astype(np.float32)
        v = rng.randn(b, d).astype(np.float32)
        t = rng.randn(b, d).astype(np.float32)
        labels = rng.randint(0, c, size=b)
        got = losses.cmpc_loss(jnp.array(proj), jnp.array(v), jnp.array(t),
                               jnp.array(labels))
        vn, tn = TF.normalize(to_t(v), dim=1), TF.normalize(to_t(t), dim=1)
        proj_n = TF.normalize(to_t(proj), dim=0)
        ipt = (to_t(v) * tn).sum(1, keepdim=True) * tn
        tpi = (to_t(t) * vn).sum(1, keepdim=True) * vn
        want = TF.cross_entropy(ipt @ proj_n, torch.tensor(labels)) + \
            TF.cross_entropy(tpi @ proj_n, torch.tensor(labels))
        assert np.allclose(float(got), float(want), atol=1e-5)

    def test_cmpm_finite(self, rng):
        b, d = 6, 8
        v = rng.randn(b, d).astype(np.float32)
        t = rng.randn(b, d).astype(np.float32)
        labels = rng.randint(0, 3, size=b)
        got = losses.cmpm_loss(jnp.array(v), jnp.array(t), jnp.array(labels))
        assert np.isfinite(float(got))


def test_l2_normalize_matches_torch_zero_vector():
    """torch F.normalize clamps the norm at 1e-12; zero rows stay zero."""
    x = np.zeros((2, 4), np.float32)
    x[1] = [3.0, 4.0, 0.0, 0.0]
    got = np.asarray(losses.l2_normalize(jnp.array(x)))
    want = TF.normalize(to_t(x), p=2, dim=-1).numpy()
    assert np.allclose(got, want, atol=1e-7)
