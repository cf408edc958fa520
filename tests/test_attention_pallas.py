"""Fused Pallas attention (ops/attention_pallas.py) vs the XLA oracle.

The kernel's agreement contract: same math as
``jax.nn.dot_product_attention`` on the fused-QKV layout (f32 logits +
softmax, probabilities cast to the input dtype for the PV matmul), so f32
agreement is to float tolerance and bf16 agreement to bf16 rounding.  All
tests run the kernel in interpreter mode (no TPU in CI).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textreid_tpu.ops.attention_pallas import (
    _pick_block_batch,
    fused_attention,
    fused_attention_bwd,
    hybrid_attention,
    xla_attention,
)


def _qkv(key, batch, seq, heads, head_dim, dtype, scale=0.5):
    return (jax.random.normal(key, (batch, seq, 3 * heads * head_dim))
            * scale).astype(dtype)


def _pair_or_skip(layout, heads, head_dim):
    """pair layout needs width % 128 == 0 and head_dim | 128."""
    from textreid_tpu.ops.attention_pallas import _heads_per_lane_block

    if layout == "pair" and not _heads_per_lane_block(heads * head_dim,
                                                      heads):
        pytest.skip("shape ineligible for pair layout")


class TestKernelAgreement:
    @pytest.mark.parametrize("layout", ["fused", "split", "pair"])
    @pytest.mark.parametrize(
        "batch,seq,heads,head_dim,causal",
        [
            (4, 193, 12, 64, False),   # ViT-B/16 on 384x128 crops
            (4, 77, 8, 64, True),      # CLIP text tower
            (5, 33, 4, 16, True),      # odd sizes: unaligned S, small D
            (1, 8, 1, 8, False),       # degenerate single head
        ],
    )
    def test_f32_matches_xla(self, batch, seq, heads, head_dim, causal,
                             layout):
        _pair_or_skip(layout, heads, head_dim)
        qkv = _qkv(jax.random.PRNGKey(0), batch, seq, heads, head_dim,
                   jnp.float32)
        ref = xla_attention(qkv, heads=heads, causal=causal)
        got = fused_attention(qkv, heads=heads, causal=causal,
                              interpret=True, layout=layout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-6, rtol=2e-6)

    @pytest.mark.parametrize("causal", [False, True])
    def test_bf16_matches_xla(self, causal):
        qkv = _qkv(jax.random.PRNGKey(1), 3, 49, 4, 32, jnp.bfloat16)
        ref = xla_attention(qkv, heads=4, causal=causal).astype(jnp.float32)
        got = fused_attention(qkv, heads=4, causal=causal,
                              interpret=True).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1.5e-2)

    def test_block_batch_not_dividing_batch(self):
        # batch 5 with requested block 8 -> block 5; with 2 -> 1.
        qkv = _qkv(jax.random.PRNGKey(2), 5, 19, 2, 16, jnp.float32)
        ref = xla_attention(qkv, heads=2)
        for bb in (1, 2, 3, 8):
            got = fused_attention(qkv, heads=2, block_batch=bb,
                                  interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-6, rtol=2e-6)

    def test_explicit_scale(self):
        qkv = _qkv(jax.random.PRNGKey(3), 2, 17, 2, 16, jnp.float32)
        ref = xla_attention(qkv, heads=2, scale=0.31)
        got = fused_attention(qkv, heads=2, scale=0.31, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-6, rtol=2e-6)

    def test_rejects_misaligned_qkv(self):
        qkv = jnp.zeros((2, 8, 100), jnp.float32)
        with pytest.raises(ValueError, match="not divisible"):
            fused_attention(qkv, heads=3, interpret=True)

    def test_pair_layout_eligibility(self):
        from textreid_tpu.ops.attention_pallas import _heads_per_lane_block

        assert _heads_per_lane_block(768, 12) == 2    # ViT-B/16: D=64
        assert _heads_per_lane_block(512, 8) == 2     # CLIP text: D=64
        assert _heads_per_lane_block(128, 4) == 4     # D=32
        assert _heads_per_lane_block(256, 2) == 1     # D=128: one head/block
        assert _heads_per_lane_block(64, 4) == 0      # width % 128 != 0
        assert _heads_per_lane_block(768, 3) == 0     # D=256 > 128
        # heads % hpb != 0: width 384, 3 heads of D=128 -> hpb=1 fine; use
        # a case where hpb=2 can't tile the heads: D=64, heads=3
        assert _heads_per_lane_block(192, 3) == 0

    def test_pair_layout_rejects_ineligible(self):
        qkv = _qkv(jax.random.PRNGKey(5), 2, 9, 4, 16, jnp.float32)  # W=64
        with pytest.raises(ValueError, match="pair layout"):
            fused_attention(qkv, heads=4, interpret=True, layout="pair")

    def test_auto_layout_resolution(self):
        from textreid_tpu.ops.attention_pallas import _resolve_layout

        assert _resolve_layout("auto", 768, 12) == "pair"   # ViT-B/16
        assert _resolve_layout("auto", 512, 8) == "pair"    # CLIP text
        assert _resolve_layout("auto", 64, 4) == "split"    # ineligible
        assert _resolve_layout("split", 768, 12) == "split"  # explicit wins
        # None follows DEFAULT_LAYOUT
        from textreid_tpu.ops import attention_pallas as ap

        assert _resolve_layout(None, 64, 4) in (ap.DEFAULT_LAYOUT, "split")

    def test_auto_layout_runs_both_paths(self):
        """'auto' must execute: pair-eligible and ineligible shapes both
        agree with the oracle through the same entry point."""
        for batch, seq, heads, head_dim in [(2, 8, 2, 64), (2, 8, 4, 16)]:
            qkv = _qkv(jax.random.PRNGKey(7), batch, seq, heads, head_dim,
                       jnp.float32)
            ref = xla_attention(qkv, heads=heads)
            out = fused_attention(qkv, heads=heads, interpret=True,
                                  layout="auto")
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-6, rtol=2e-6)

    def test_pick_block_batch(self):
        assert _pick_block_batch(128, 8) == 8
        assert _pick_block_batch(5, 8) == 5
        assert _pick_block_batch(6, 4) == 3
        assert _pick_block_batch(7, 2) == 1
        assert _pick_block_batch(1, 16) == 1

    def test_block_batch_vmem_clamp(self):
        # S=512: 2 x bt x 512^2 x 4B tiles must fit 8 MiB -> bt <= 4
        assert _pick_block_batch(128, 8, seq=512, score_tiles=2) == 4
        # short sequences keep the requested block
        assert _pick_block_batch(128, 8, seq=193, score_tiles=2) == 8
        # beyond the single-sample budget: explicit rejection
        with pytest.raises(ValueError, match="online-softmax"):
            _pick_block_batch(128, 8, seq=4096, score_tiles=2)


class TestHybridVJP:
    @pytest.mark.parametrize("pallas_bwd", [False, True])
    def test_grad_matches_xla(self, pallas_bwd):
        qkv = _qkv(jax.random.PRNGKey(4), 2, 33, 4, 16, jnp.float32)

        def loss_h(t):
            return jnp.sum(jnp.sin(hybrid_attention(t, 4, True, None, 8,
                                                    True, pallas_bwd)))

        def loss_x(t):
            return jnp.sum(jnp.sin(xla_attention(t, heads=4, causal=True)))

        g_h = jax.grad(loss_h)(qkv)
        g_x = jax.grad(loss_x)(qkv)
        np.testing.assert_allclose(np.asarray(g_h), np.asarray(g_x),
                                   atol=1e-5, rtol=1e-5)

    @pytest.mark.parametrize("layout", ["fused", "split", "pair"])
    @pytest.mark.parametrize(
        "batch,seq,heads,head_dim,causal",
        [
            (3, 49, 4, 32, False),
            (2, 77, 8, 64, True),     # CLIP text tower
            (5, 33, 4, 16, True),     # odd: block_batch won't divide
        ],
    )
    def test_bwd_kernel_matches_xla_vjp(self, batch, seq, heads, head_dim,
                                        causal, layout):
        _pair_or_skip(layout, heads, head_dim)
        qkv = _qkv(jax.random.PRNGKey(11), batch, seq, heads, head_dim,
                   jnp.float32)
        g = jax.random.normal(jax.random.PRNGKey(12),
                              (batch, seq, heads * head_dim), jnp.float32)
        _, vjp = jax.vjp(
            lambda t: xla_attention(t, heads=heads, causal=causal), qkv)
        (ref,) = vjp(g)
        got = fused_attention_bwd(qkv, g, heads=heads, causal=causal,
                                  interpret=True, layout=layout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_bwd_kernel_bf16(self):
        qkv = _qkv(jax.random.PRNGKey(13), 2, 49, 4, 32, jnp.bfloat16)
        g = (jax.random.normal(jax.random.PRNGKey(14), (2, 49, 128))
             .astype(jnp.bfloat16))
        _, vjp = jax.vjp(
            lambda t: xla_attention(t, heads=4, causal=False), qkv)
        (ref,) = vjp(g)
        got = fused_attention_bwd(qkv, g, heads=4, interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), atol=3e-2)

    def test_forward_is_pallas_value(self):
        qkv = _qkv(jax.random.PRNGKey(5), 2, 21, 2, 16, jnp.float32)
        out = hybrid_attention(qkv, 2, False, None, 8, True)
        ref = fused_attention(qkv, heads=2, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestMeshPartitioning:
    """The kernel is mesh-aware (custom_partitioning): a batch-sharded jit
    runs one kernel per device on its local shard — no all-gather of the
    activations around the custom call (GSPMD's default for opaque calls,
    observed as 15 all-gathers in the 8-way HLO before the rule)."""

    def _mesh(self):
        from jax.sharding import Mesh

        return Mesh(np.array(jax.devices()), ("data",))

    def test_sharded_fwd_no_allgather_and_exact(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self._mesh()
        ns = NamedSharding(mesh, P("data"))
        qkv = _qkv(jax.random.PRNGKey(20), 16, 33, 4, 16, jnp.float32)
        f = jax.jit(lambda t: fused_attention(t, heads=4, interpret=True),
                    in_shardings=ns, out_shardings=ns)
        sharded = jax.device_put(qkv, ns)
        hlo = f.lower(sharded).compile().as_text()
        assert hlo.count("all-gather") == 0
        np.testing.assert_allclose(
            np.asarray(f(sharded)),
            np.asarray(xla_attention(qkv, heads=4)), atol=2e-6, rtol=2e-6)

    def test_sharded_bwd_no_allgather_and_exact(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self._mesh()
        ns = NamedSharding(mesh, P("data"))
        qkv = _qkv(jax.random.PRNGKey(21), 16, 33, 4, 16, jnp.float32)
        g = jax.random.normal(jax.random.PRNGKey(22), (16, 33, 64),
                              jnp.float32)
        f = jax.jit(
            lambda t, gg: fused_attention_bwd(t, gg, heads=4,
                                              interpret=True),
            in_shardings=(ns, ns), out_shardings=ns)
        a, b = jax.device_put(qkv, ns), jax.device_put(g, ns)
        hlo = f.lower(a, b).compile().as_text()
        assert hlo.count("all-gather") == 0
        ref = jax.vjp(lambda t: xla_attention(t, heads=4), qkv)[1](g)[0]
        np.testing.assert_allclose(np.asarray(f(a, b)), np.asarray(ref),
                                   atol=2e-6, rtol=2e-6)


class TestTowerIntegration:
    """The fused path must be a pure implementation swap: same param tree,
    same outputs (to kernel tolerance) for both transformer towers."""

    def _vit(self, fused):
        from textreid_tpu.models.vit import VisionTransformer

        return VisionTransformer(
            input_resolution=(48, 32), patch_size=16, width=64, layers=2,
            heads=2, output_dim=32, dtype=jnp.float32,
            fused_attention=fused, attn_interpret=fused)

    def test_vit_forward_agrees(self):
        x = jax.random.normal(jax.random.PRNGKey(6), (3, 48, 32, 3))
        base = self._vit(False)
        params = base.init(jax.random.PRNGKey(7), x)
        ref = base.apply(params, x)
        got = self._vit(True).apply(params, x)  # identical param tree
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_text_transformer_forward_agrees(self):
        from textreid_tpu.models.text_transformer import TextTransformer

        ids = jnp.array([[5, 9, 2, 0, 0], [3, 1, 4, 1, 5]], jnp.int32)
        lengths = jnp.array([3, 5], jnp.int32)
        kw = dict(vocab_size=32, context_length=8, width=32, layers=2,
                  heads=2, output_dim=16, dtype=jnp.float32)
        base = TextTransformer(**kw)
        params = base.init(jax.random.PRNGKey(8), ids, lengths)
        ref = base.apply(params, ids, lengths)
        got = TextTransformer(fused_attention=True, attn_interpret=True,
                              **kw).apply(params, ids, lengths)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_remat_composes_with_hybrid_vjp(self):
        """TPU.REMAT wraps the visual tower in jax.checkpoint; the fused
        path must survive rematerialization (pallas forward recomputed,
        custom backward still used)."""
        x = jax.random.normal(jax.random.PRNGKey(15), (2, 48, 32, 3))
        base, fused = self._vit(False), self._vit(True)
        params = base.init(jax.random.PRNGKey(16), x)

        def loss(apply_fn):
            def f(p):
                out = jax.checkpoint(lambda q: apply_fn(q, x))(p)
                return jnp.sum(out ** 2)
            return f

        g_ref = jax.grad(loss(base.apply))(params)
        g_got = jax.grad(loss(fused.apply))(params)
        for r, g in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=1e-4, rtol=1e-4)

    def test_vit_grad_through_fused_block(self):
        """Training viability: gradients flow through the hybrid VJP in a
        full tower (backward differentiates the XLA formulation)."""
        x = jax.random.normal(jax.random.PRNGKey(9), (2, 48, 32, 3))
        base, fused = self._vit(False), self._vit(True)
        params = base.init(jax.random.PRNGKey(10), x)

        g_ref = jax.grad(lambda p: jnp.sum(base.apply(p, x) ** 2))(params)
        g_got = jax.grad(lambda p: jnp.sum(fused.apply(p, x) ** 2))(params)
        flat_r = jax.tree.leaves(g_ref)
        flat_g = jax.tree.leaves(g_got)
        for r, g in zip(flat_r, flat_g):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=1e-4, rtol=1e-4)


class TestBwdMode:
    """"bwd" mode (XLA forward + Pallas backward) — the on-chip winner for
    ViT-B/16 training (tools/attn_probe.py; defaults.py TPU section)."""

    def test_hybrid_xla_fwd_is_exact(self):
        # pallas_fwd=False: the primal IS the XLA formulation, bitwise
        qkv = _qkv(jax.random.PRNGKey(20), 2, 21, 2, 16, jnp.float32)
        out = hybrid_attention(qkv, 2, False, None, 8, True, True, 4, None,
                               False)
        ref = xla_attention(qkv, heads=2, causal=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_hybrid_xla_fwd_pallas_bwd_grads(self):
        qkv = _qkv(jax.random.PRNGKey(21), 2, 33, 4, 16, jnp.float32)

        def loss_h(t):
            return jnp.sum(jnp.sin(hybrid_attention(
                t, 4, True, None, 8, True, True, 4, None, False)))

        def loss_x(t):
            return jnp.sum(jnp.sin(xla_attention(t, heads=4, causal=True)))

        g_h = jax.grad(loss_h)(qkv)
        g_x = jax.grad(loss_x)(qkv)
        np.testing.assert_allclose(np.asarray(g_h), np.asarray(g_x),
                                   atol=1e-5, rtol=1e-5)

    def test_block_bwd_mode_matches_off(self):
        """A TransformerBlock in "bwd" mode: identical forward to the XLA
        block (same lowering), gradients equal to kernel tolerance."""
        from textreid_tpu.models.vit import VisionTransformer

        def vit(mode, interp):
            return VisionTransformer(
                input_resolution=(48, 32), patch_size=16, width=64,
                layers=2, heads=2, output_dim=32, dtype=jnp.float32,
                fused_attention=mode, attn_interpret=interp)

        x = jax.random.normal(jax.random.PRNGKey(22), (3, 48, 32, 3))
        base = vit(False, False)
        params = base.init(jax.random.PRNGKey(23), x)
        np.testing.assert_array_equal(
            np.asarray(vit("bwd", True).apply(params, x)),
            np.asarray(base.apply(params, x)))
        g_ref = jax.grad(lambda p: jnp.sum(base.apply(p, x) ** 2))(params)
        g_got = jax.grad(
            lambda p: jnp.sum(vit("bwd", True).apply(p, x) ** 2))(params)
        for r, g in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=1e-4, rtol=1e-4)

    def test_mode_normalization_and_cfg_resolution(self):
        from textreid_tpu.config import get_default_cfg
        from textreid_tpu.models.vit import (attention_mode,
                                             fused_attention_from_cfg)

        assert attention_mode(False) == "off"
        assert attention_mode(True) == "on"
        assert attention_mode("bwd") == "bwd"
        with pytest.raises(ValueError, match="fused-attention mode"):
            attention_mode("sideways")

        cfg = get_default_cfg()
        # gate off: "off" for both towers regardless of backend
        assert fused_attention_from_cfg(cfg, "visual") == "off"
        assert fused_attention_from_cfg(cfg, "text") == "off"
        with pytest.raises(ValueError, match="unknown tower"):
            fused_attention_from_cfg(cfg, "audio")
        cfg.TPU.FUSED_ATTENTION = True
        if jax.default_backend() == "tpu":  # pragma: no cover - CPU CI
            assert fused_attention_from_cfg(cfg, "visual") == "on"
            assert fused_attention_from_cfg(cfg, "text") == "off"
        else:
            # non-TPU backends never enable the kernel
            assert fused_attention_from_cfg(cfg, "visual") == "off"

    def test_bad_mode_rejected_in_block(self):
        from textreid_tpu.models.vit import VisionTransformer

        x = jax.random.normal(jax.random.PRNGKey(24), (1, 48, 32, 3))
        bad = VisionTransformer(
            input_resolution=(48, 32), patch_size=16, width=64, layers=1,
            heads=2, output_dim=32, fused_attention="sideways")
        with pytest.raises(ValueError, match="fused-attention mode"):
            bad.init(jax.random.PRNGKey(25), x)
