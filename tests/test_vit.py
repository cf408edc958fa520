"""CLIP ViT backbone tests: full-tower and per-block parity vs a
torch-functional oracle (the same patchify/MHA/QuickGELU math CLIP
publishes), full-model wiring through the converted weight layout, and the
composition with sharded large-gallery retrieval (the literal BASELINE.json
stretch configuration)."""

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


def _rand_vit_sd(width, layers, patch, out_dim, n_tokens):
    """Random CLIP-layout ViT state dict with the pos-embed already at the
    target grid (resize parity is covered by the converter tests)."""
    sd = {
        "class_embedding": RNG.randn(width).astype(np.float32) * 0.05,
        "positional_embedding": RNG.randn(n_tokens, width).astype(
            np.float32) * 0.05,
        "conv1.weight": RNG.randn(width, 3, patch, patch).astype(
            np.float32) * 0.05,
        "ln_pre.weight": RNG.rand(width).astype(np.float32) + 0.5,
        "ln_pre.bias": RNG.randn(width).astype(np.float32) * 0.05,
        "ln_post.weight": RNG.rand(width).astype(np.float32) + 0.5,
        "ln_post.bias": RNG.randn(width).astype(np.float32) * 0.05,
        "proj": RNG.randn(width, out_dim).astype(np.float32) * 0.05,
    }
    for i in range(layers):
        sd.update(_rand_block_sd(f"transformer.resblocks.{i}", width))
    return sd


def torch_vit_forward(x, sd, layers, heads, patch):
    """The published CLIP VisionTransformer forward in torch functional ops
    (patchify conv -> CLS prepend -> pos-embed -> pre-LN transformer ->
    ln_post on CLS -> projection), straight from the state dict."""
    x = TF.conv2d(x, torch.from_numpy(sd["conv1.weight"]), stride=patch)
    b, w, gh, gw = x.shape
    x = x.reshape(b, w, gh * gw).permute(0, 2, 1)  # [B, N, W]
    cls = torch.from_numpy(sd["class_embedding"]).reshape(1, 1, w)
    x = torch.cat([cls.expand(b, -1, -1), x], dim=1)
    x = x + torch.from_numpy(sd["positional_embedding"])[None]
    x = TF.layer_norm(x, (w,), torch.from_numpy(sd["ln_pre.weight"]),
                      torch.from_numpy(sd["ln_pre.bias"]), 1e-5)
    for i in range(layers):
        x = torch_block(x, sd, f"transformer.resblocks.{i}", heads)
    x = TF.layer_norm(x[:, 0], (w,), torch.from_numpy(sd["ln_post.weight"]),
                      torch.from_numpy(sd["ln_post.bias"]), 1e-5)
    return x @ torch.from_numpy(sd["proj"])


class TestFullTowerParity:
    """End-to-end numeric parity of the whole ViT tower against the torch
    oracle from one shared state dict — the same evidence tier as
    tests/test_m_resnet_parity.py (VERDICT r2 next-item 2a)."""

    def test_full_tower_matches_torch(self):
        width, layers, heads, out_dim, patch = 32, 3, 4, 16, 8
        res = (32, 16)  # grid 4x2 -> 9 tokens
        sd = _rand_vit_sd(width, layers, patch, out_dim, n_tokens=9)

        x = RNG.randn(2, 3, *res).astype(np.float32)
        want = torch_vit_forward(torch.from_numpy(x), sd, layers, heads,
                                 patch).numpy()

        model = VisionTransformer(
            input_resolution=res, patch_size=patch, width=width,
            layers=layers, heads=heads, output_dim=out_dim,
        )
        converted = convert_clip_vit(sd, layers, final_grid=model.grid)
        init_vars = model.init(
            jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
        merged = merge_pretrained(init_vars, converted)
        got = np.asarray(model.apply(
            merged, jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestViTShardedRetrieval:
    """The literal BASELINE.json stretch sentence — 'CLIP ViT-B/16 backbone
    + sharded large-gallery retrieval' — composed in one test: a gallery
    encoded by the ViT tower, sharded top-k over the 8-device CPU mesh
    (VERDICT r2 next-item 9)."""

    def test_vit_gallery_sharded_topk(self):
        from textreid_tpu.engine.state import TrainState
        from textreid_tpu.models import BiGRUEncoder, TextReIDModel
        from textreid_tpu.parallel import make_mesh
        from textreid_tpu.serving import RetrievalIndex

        model = TextReIDModel(
            visual=VisionTransformer(input_resolution=(32, 16), patch_size=8,
                                     width=32, layers=2, heads=4,
                                     output_dim=16),
            textual=BiGRUEncoder(hidden_dim=8, vocab_size=30, embed_size=8),
            feature_size=16, num_classes=4,
        )
        rng = np.random.RandomState(0)
        pixels = jnp.asarray(rng.randint(0, 255, (2, 32, 16, 3),
                                         dtype=np.uint8))
        ids = jnp.asarray(rng.randint(1, 30, (2, 8)).astype(np.int32))
        lens = jnp.asarray([8, 4], dtype=jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), pixels, ids, lens,
                               method="init_all")
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            constants=variables.get("constants", {}), opt_state=None,
        )
        batches = [rng.randint(0, 255, (5, 32, 16, 3), dtype=np.uint8)
                   for _ in range(2)]

        plain = RetrievalIndex(model, state, use_pallas=False)
        plain.build_gallery(batches, meta=np.arange(200, 210))
        sharded = RetrievalIndex(model, state, mesh=make_mesh(8),
                                 use_pallas=False)
        sharded.build_gallery(batches, meta=np.arange(200, 210))

        token_ids = rng.randint(1, 30, (3, 8)).astype(np.int32)
        lengths = np.full(3, 8, np.int32)
        s1, m1 = plain.search(token_ids, lengths, k=4)
        s2, m2 = sharded.search(token_ids, lengths, k=4)
        np.testing.assert_allclose(s1, s2, atol=1e-5)
        np.testing.assert_array_equal(m1, m2)
        assert set(m1.ravel()).issubset(set(range(200, 210)))


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
