"""Weight-converter parity tests.

Each converter primitive is checked against the corresponding torch
functional op on random weights (conv/BN/dense/GRU layouts, attention pool,
position-embedding resize) — the numerical-parity strategy of SURVEY.md
section 4.2 made runnable without the released checkpoint files.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from textreid_tpu.models.m_resnet import AttentionPool2d, Bottleneck, ModifiedResNet
from textreid_tpu.utils.weight_convert import (
    bn_params,
    conv_kernel,
    convert_gru,
    convert_m_resnet,
    linear_kernel,
    merge_pretrained,
    resize_pos_embed,
)

RNG = np.random.RandomState(0)


class TestPrimitives:
    def test_conv_kernel_layout(self):
        """flax conv with converted kernel == torch F.conv2d (NCHW<->NHWC)."""
        import flax.linen as nn

        w = RNG.randn(8, 3, 3, 3).astype(np.float32)  # [out,in,kh,kw]
        x = RNG.randn(2, 3, 10, 6).astype(np.float32)  # NCHW

        want = TF.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                         stride=2, padding=1).numpy()

        conv = nn.Conv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                       use_bias=False)
        variables = {"params": {"kernel": jnp.asarray(conv_kernel(w))}}
        got = conv.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4
        )

    def test_bn_inference_parity(self):
        import flax.linen as nn

        c = 6
        sd = {
            "bn.weight": RNG.randn(c).astype(np.float32),
            "bn.bias": RNG.randn(c).astype(np.float32),
            "bn.running_mean": RNG.randn(c).astype(np.float32),
            "bn.running_var": np.abs(RNG.randn(c)).astype(np.float32) + 0.5,
        }
        x = RNG.randn(4, c).astype(np.float32)
        want = TF.batch_norm(
            torch.from_numpy(x), torch.from_numpy(sd["bn.running_mean"]),
            torch.from_numpy(sd["bn.running_var"]),
            torch.from_numpy(sd["bn.weight"]), torch.from_numpy(sd["bn.bias"]),
            training=False, eps=1e-5,
        ).numpy()

        p, s = bn_params(sd, "bn")
        bn = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
        got = bn.apply(
            {"params": jax.tree.map(jnp.asarray, p),
             "batch_stats": jax.tree.map(jnp.asarray, s)},
            jnp.asarray(x),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_linear_kernel_layout(self):
        import flax.linen as nn

        w = RNG.randn(5, 7).astype(np.float32)
        b = RNG.randn(5).astype(np.float32)
        x = RNG.randn(3, 7).astype(np.float32)
        want = TF.linear(torch.from_numpy(x), torch.from_numpy(w),
                         torch.from_numpy(b)).numpy()
        dense = nn.Dense(5)
        got = dense.apply(
            {"params": {"kernel": jnp.asarray(linear_kernel(w)),
                        "bias": jnp.asarray(b)}},
            jnp.asarray(x),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_pos_embed_resize_matches_torch_interpolate(self):
        c = 16
        posemb = RNG.randn(7 * 7 + 1, c).astype(np.float32)
        new_grid = (12, 4)
        got = resize_pos_embed(posemb, new_grid)

        tok, grid = posemb[:1], posemb[1:]
        g = torch.from_numpy(grid.reshape(1, 7, 7, c)).permute(0, 3, 1, 2)
        want_grid = TF.interpolate(g, size=new_grid, mode="bilinear",
                                   align_corners=False)
        want_grid = want_grid.permute(0, 2, 3, 1).reshape(48, c).numpy()
        want = np.concatenate([tok, want_grid], axis=0)
        assert got.shape == (49, c)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestAttentionPoolParity:
    def test_matches_torch_mha_cls_output(self):
        """Our CLS-only attention pool must equal torch's full
        multi_head_attention_forward output at position 0 — the exact op the
        reference calls (m_resnet.py:111-133)."""
        embed_dim, heads, h, w, out_dim, b = 32, 4, 3, 2, 16, 2
        n_tok = h * w + 1

        wq = RNG.randn(embed_dim, embed_dim).astype(np.float32)
        wk = RNG.randn(embed_dim, embed_dim).astype(np.float32)
        wv = RNG.randn(embed_dim, embed_dim).astype(np.float32)
        wc = RNG.randn(out_dim, embed_dim).astype(np.float32)
        bq = RNG.randn(embed_dim).astype(np.float32)
        bk = RNG.randn(embed_dim).astype(np.float32)
        bv = RNG.randn(embed_dim).astype(np.float32)
        bc = RNG.randn(out_dim).astype(np.float32)
        pos = RNG.randn(n_tok, embed_dim).astype(np.float32)
        feats = RNG.randn(b, embed_dim, h, w).astype(np.float32)  # NCHW

        # torch oracle — same call shape as the reference forward
        x = torch.from_numpy(feats)
        x = x.reshape(b, embed_dim, h * w).permute(2, 0, 1)  # (HW)NC
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + torch.from_numpy(pos)[:, None, :]
        out, _ = TF.multi_head_attention_forward(
            query=x, key=x, value=x,
            embed_dim_to_check=embed_dim, num_heads=heads,
            q_proj_weight=torch.from_numpy(wq),
            k_proj_weight=torch.from_numpy(wk),
            v_proj_weight=torch.from_numpy(wv),
            in_proj_weight=None,
            in_proj_bias=torch.from_numpy(np.concatenate([bq, bk, bv])),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
            out_proj_weight=torch.from_numpy(wc),
            out_proj_bias=torch.from_numpy(bc),
            use_separate_proj_weight=True, training=False, need_weights=False,
        )
        want = out[0].detach().numpy()

        pool = AttentionPool2d(
            spacial_dim=(h, w), embed_dim=embed_dim, num_heads=heads,
            output_dim=out_dim,
        )
        variables = {
            "params": {
                "positional_embedding": jnp.asarray(pos),
                "q_proj": {"kernel": jnp.asarray(linear_kernel(wq)),
                           "bias": jnp.asarray(bq)},
                "k_proj": {"kernel": jnp.asarray(linear_kernel(wk)),
                           "bias": jnp.asarray(bk)},
                "v_proj": {"kernel": jnp.asarray(linear_kernel(wv)),
                           "bias": jnp.asarray(bv)},
                "c_proj": {"kernel": jnp.asarray(linear_kernel(wc)),
                           "bias": jnp.asarray(bc)},
            }
        }
        got = pool.apply(variables, jnp.asarray(feats.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def _rand_m_resnet_sd(layers=(1, 1, 1, 1), width=16, out_dim=24, grid=(2, 1),
                      src_grid=7):
    """Random CLIP-RN-shaped state dict with torch key naming."""
    sd = {}

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = RNG.randn(cout, cin, k, k).astype(np.float32) * 0.1

    def bn(name, c):
        sd[name + ".weight"] = RNG.rand(c).astype(np.float32) + 0.5
        sd[name + ".bias"] = RNG.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = RNG.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = RNG.rand(c).astype(np.float32) + 0.5

    conv("conv1", width // 2, 3, 3); bn("bn1", width // 2)
    conv("conv2", width // 2, width // 2, 3); bn("bn2", width // 2)
    conv("conv3", width, width // 2, 3); bn("bn3", width)

    inplanes = width
    for stage, blocks in enumerate(layers, start=1):
        planes = width * 2 ** (stage - 1)
        stride = 1 if stage == 1 else (2 if stage < 4 else 1)
        for b in range(blocks):
            p = f"layer{stage}.{b}"
            conv(p + ".conv1", planes, inplanes, 1); bn(p + ".bn1", planes)
            conv(p + ".conv2", planes, planes, 3); bn(p + ".bn2", planes)
            conv(p + ".conv3", planes * 4, planes, 1); bn(p + ".bn3", planes * 4)
            if b == 0 and (stride > 1 or inplanes != planes * 4):
                conv(p + ".downsample.0", planes * 4, inplanes, 1)
                bn(p + ".downsample.1", planes * 4)
            inplanes = planes * 4

    embed_dim = width * 32
    sd["attnpool.positional_embedding"] = RNG.randn(
        src_grid * src_grid + 1, embed_dim
    ).astype(np.float32) * 0.1
    for name, od in (("q_proj", embed_dim), ("k_proj", embed_dim),
                     ("v_proj", embed_dim), ("c_proj", out_dim)):
        sd[f"attnpool.{name}.weight"] = RNG.randn(od, embed_dim).astype(
            np.float32) * 0.05
        sd[f"attnpool.{name}.bias"] = RNG.randn(od).astype(np.float32) * 0.05
    return sd


class TestModifiedResNetConversion:
    def test_converted_tree_feeds_model(self):
        layers, width, out_dim = (1, 1, 1, 1), 16, 24
        res = (32, 16)  # grid (2, 1) with last_stride=1
        sd = {"visual." + k: v for k, v in
              _rand_m_resnet_sd(layers, width, out_dim).items()}
        model = ModifiedResNet(
            layers=layers, output_dim=out_dim, heads=4, last_stride=1,
            input_resolution=res, width=width,
        )
        x = jnp.asarray(RNG.randn(2, *res, 3).astype(np.float32))
        init_vars = model.init(jax.random.PRNGKey(0), x)
        converted = convert_m_resnet(sd, layers, model.final_grid)
        merged = merge_pretrained(init_vars, converted)
        # every leaf shape must line up
        jax.tree.map(
            lambda a, b: (_ for _ in ()).throw(
                AssertionError(f"{a.shape} vs {b.shape}")
            ) if a.shape != b.shape else None,
            init_vars, merged,
        )
        out = model.apply(merged, x)
        assert out.shape == (2, out_dim)
        assert np.isfinite(np.asarray(out)).all()
        # and the conversion actually replaced the random init
        a = init_vars["params"]["conv1"]["kernel"]
        b = merged["params"]["conv1"]["kernel"]
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_pos_embed_resized_on_grid_mismatch(self):
        layers, width, out_dim = (1, 1, 1, 1), 16, 24
        sd = _rand_m_resnet_sd(layers, width, out_dim, src_grid=7)
        converted = convert_m_resnet(sd, layers, final_grid=(2, 1))
        pos = converted["params"]["attnpool"]["positional_embedding"]
        assert pos.shape == (3, width * 32)


class TestGRUConversion:
    def test_layout_matches_torch_gru(self):
        """End-to-end: convert torch GRU weights and verify our scan module
        reproduces torch's packed-sequence output."""
        from tests.test_gru import jax_bigru_maxpool, torch_bigru_maxpool

        e = h = 6
        sd = {
            "gru.weight_ih_l0": RNG.randn(3 * h, e).astype(np.float32) * 0.3,
            "gru.weight_hh_l0": RNG.randn(3 * h, h).astype(np.float32) * 0.3,
            "gru.weight_ih_l0_reverse": RNG.randn(3 * h, e).astype(np.float32) * 0.3,
            "gru.weight_hh_l0_reverse": RNG.randn(3 * h, h).astype(np.float32) * 0.3,
        }
        converted = convert_gru(sd)["params"]
        # converted kernels are [in, 3H]; the oracle helpers take torch layout
        x = RNG.randn(3, 7, e).astype(np.float32)
        lens = np.array([7, 3, 5], np.int64)
        want = torch_bigru_maxpool(
            x, lens, sd["gru.weight_ih_l0"], sd["gru.weight_hh_l0"],
            sd["gru.weight_ih_l0_reverse"], sd["gru.weight_hh_l0_reverse"], h,
        )
        got = jax_bigru_maxpool(
            x, lens,
            converted["fwd_w_ih_l0"].T, converted["fwd_w_hh_l0"].T,
            converted["bwd_w_ih_l0"].T, converted["bwd_w_hh_l0"].T, h,
        )
        np.testing.assert_allclose(got, want, atol=1e-5)
