"""CLIP ViT backbone tests: transformer-block parity vs a torch-functional
oracle (the same MHA/QuickGELU math CLIP publishes) and full-model wiring
through the converted weight layout."""

import numpy as np
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from textreid_tpu.config import get_default_cfg
from textreid_tpu.models.vit import TransformerBlock, VisionTransformer, build_vit
from textreid_tpu.utils.weight_convert import convert_clip_vit, merge_pretrained

RNG = np.random.RandomState(0)


def _rand_block_sd(prefix, width):
    sd = {}
    sd[f"{prefix}.ln_1.weight"] = RNG.rand(width).astype(np.float32) + 0.5
    sd[f"{prefix}.ln_1.bias"] = RNG.randn(width).astype(np.float32) * 0.05
    sd[f"{prefix}.attn.in_proj_weight"] = RNG.randn(3 * width, width).astype(
        np.float32) * 0.05
    sd[f"{prefix}.attn.in_proj_bias"] = RNG.randn(3 * width).astype(
        np.float32) * 0.05
    sd[f"{prefix}.attn.out_proj.weight"] = RNG.randn(width, width).astype(
        np.float32) * 0.05
    sd[f"{prefix}.attn.out_proj.bias"] = RNG.randn(width).astype(
        np.float32) * 0.05
    sd[f"{prefix}.ln_2.weight"] = RNG.rand(width).astype(np.float32) + 0.5
    sd[f"{prefix}.ln_2.bias"] = RNG.randn(width).astype(np.float32) * 0.05
    sd[f"{prefix}.mlp.c_fc.weight"] = RNG.randn(4 * width, width).astype(
        np.float32) * 0.05
    sd[f"{prefix}.mlp.c_fc.bias"] = RNG.randn(4 * width).astype(
        np.float32) * 0.05
    sd[f"{prefix}.mlp.c_proj.weight"] = RNG.randn(width, 4 * width).astype(
        np.float32) * 0.05
    sd[f"{prefix}.mlp.c_proj.bias"] = RNG.randn(width).astype(np.float32) * 0.05
    return sd


def torch_block(x, sd, p, heads):
    """Pre-LN CLIP residual block via torch functional ops."""
    def ln(t, name):
        return TF.layer_norm(t, (t.shape[-1],),
                             torch.from_numpy(sd[f"{p}.{name}.weight"]),
                             torch.from_numpy(sd[f"{p}.{name}.bias"]), 1e-5)

    h = ln(x, "ln_1")
    b, n, w = h.shape
    attn, _ = TF.multi_head_attention_forward(
        h.transpose(0, 1), h.transpose(0, 1), h.transpose(0, 1),
        w, heads,
        torch.from_numpy(sd[f"{p}.attn.in_proj_weight"]),
        torch.from_numpy(sd[f"{p}.attn.in_proj_bias"]),
        None, None, False, 0.0,
        torch.from_numpy(sd[f"{p}.attn.out_proj.weight"]),
        torch.from_numpy(sd[f"{p}.attn.out_proj.bias"]),
        training=False, need_weights=False,
    )
    x = x + attn.transpose(0, 1)
    h = ln(x, "ln_2")
    h = TF.linear(h, torch.from_numpy(sd[f"{p}.mlp.c_fc.weight"]),
                  torch.from_numpy(sd[f"{p}.mlp.c_fc.bias"]))
    h = h * torch.sigmoid(1.702 * h)  # QuickGELU
    h = TF.linear(h, torch.from_numpy(sd[f"{p}.mlp.c_proj.weight"]),
                  torch.from_numpy(sd[f"{p}.mlp.c_proj.bias"]))
    return x + h


class TestTransformerBlockParity:
    def test_matches_torch_functional(self):
        width, heads, b, n = 32, 4, 2, 9
        sd = _rand_block_sd("transformer.resblocks.0", width)
        x = RNG.randn(b, n, width).astype(np.float32)

        want = torch_block(torch.from_numpy(x), sd,
                           "transformer.resblocks.0", heads).numpy()

        converted = convert_clip_vit(
            {**sd,
             "class_embedding": np.zeros(width, np.float32),
             "positional_embedding": np.zeros((n, width), np.float32),
             "conv1.weight": np.zeros((width, 3, 4, 4), np.float32),
             "ln_pre.weight": np.ones(width, np.float32),
             "ln_pre.bias": np.zeros(width, np.float32),
             "ln_post.weight": np.ones(width, np.float32),
             "ln_post.bias": np.zeros(width, np.float32),
             "proj": np.zeros((width, 16), np.float32)},
            layers=1,
        )
        block = TransformerBlock(width=width, heads=heads)
        got = block.apply(
            {"params": jax.tree.map(jnp.asarray,
                                    converted["params"]["block_0"])},
            jnp.asarray(x),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TestVisionTransformer:
    def test_full_model_with_converted_weights(self):
        width, layers, heads, out_dim, patch = 32, 2, 4, 16, 8
        res = (32, 16)  # grid 4x2 -> 9 tokens
        sd = {
            "class_embedding": RNG.randn(width).astype(np.float32) * 0.05,
            # source pos-embed on a square 3x3 grid -> must be resized to 4x2
            "positional_embedding": RNG.randn(10, width).astype(np.float32) * 0.05,
            "conv1.weight": RNG.randn(width, 3, patch, patch).astype(
                np.float32) * 0.05,
            "ln_pre.weight": np.ones(width, np.float32),
            "ln_pre.bias": np.zeros(width, np.float32),
            "ln_post.weight": np.ones(width, np.float32),
            "ln_post.bias": np.zeros(width, np.float32),
            "proj": RNG.randn(width, out_dim).astype(np.float32) * 0.05,
        }
        for i in range(layers):
            sd.update(_rand_block_sd(f"transformer.resblocks.{i}", width))

        model = VisionTransformer(
            input_resolution=res, patch_size=patch, width=width,
            layers=layers, heads=heads, output_dim=out_dim,
        )
        x = jnp.asarray(RNG.randn(2, *res, 3).astype(np.float32))
        init_vars = model.init(jax.random.PRNGKey(0), x)
        converted = convert_clip_vit(sd, layers, final_grid=model.grid)
        merged = merge_pretrained(init_vars, converted)
        jax.tree.map(lambda a, b: None if a.shape == b.shape else
                     (_ for _ in ()).throw(AssertionError((a.shape, b.shape))),
                     init_vars, merged)
        out = model.apply(merged, x)
        assert out.shape == (2, out_dim)
        assert np.isfinite(np.asarray(out)).all()

    def test_build_vit_from_cfg(self):
        cfg = get_default_cfg()
        cfg.MODEL.VISUAL_MODEL = "clip_vit_b16"
        cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH = 64, 32
        model = build_vit(cfg)
        assert model.patch_size == 16
        assert model.grid == (4, 2)
        assert model.out_channels == 512
