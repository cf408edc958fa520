"""CLIP text-transformer textual tower: full-tower parity vs a
torch-functional oracle (the published CLIP text encoder math, causal mask
included), padding invariance of the EOT pooling, the converter's 1-D
positional resize, and composition with the two-tower model."""

import numpy as np
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from tests.test_vit import _rand_block_sd
from textreid_tpu.config import get_default_cfg
from textreid_tpu.models.text_transformer import (
    TextTransformer,
    build_text_transformer,
)
from textreid_tpu.utils.weight_convert import convert_clip_text, merge_pretrained

RNG = np.random.RandomState(3)


def _rand_text_sd(width, layers, vocab, ctx, out_dim):
    """Random CLIP-layout text-tower state dict (top-level keys, the way a
    CLIP jit archive stores the text half next to ``visual.*``)."""
    sd = {
        "token_embedding.weight": RNG.randn(vocab, width).astype(
            np.float32) * 0.02,
        "positional_embedding": RNG.randn(ctx, width).astype(np.float32) * 0.01,
        "ln_final.weight": RNG.rand(width).astype(np.float32) + 0.5,
        "ln_final.bias": RNG.randn(width).astype(np.float32) * 0.05,
        "text_projection": RNG.randn(width, out_dim).astype(np.float32) * 0.05,
    }
    for i in range(layers):
        sd.update(_rand_block_sd(f"transformer.resblocks.{i}", width))
    return sd


def torch_text_block(x, sd, p, heads, attn_mask):
    """Pre-LN CLIP residual block with a causal mask (text-encoder form of
    tests/test_vit.py:torch_block)."""
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
        training=False, need_weights=False, attn_mask=attn_mask,
    )
    x = x + attn.transpose(0, 1)
    h = ln(x, "ln_2")
    h = TF.linear(h, torch.from_numpy(sd[f"{p}.mlp.c_fc.weight"]),
                  torch.from_numpy(sd[f"{p}.mlp.c_fc.bias"]))
    h = h * torch.sigmoid(1.702 * h)  # QuickGELU
    h = TF.linear(h, torch.from_numpy(sd[f"{p}.mlp.c_proj.weight"]),
                  torch.from_numpy(sd[f"{p}.mlp.c_proj.bias"]))
    return x + h


def torch_clip_text_forward(tokens, lengths, sd, layers, heads):
    """The published CLIP text-encoder forward in torch functional ops:
    token embedding -> positional embedding -> causal pre-LN transformer ->
    ln_final at the EOT slot -> projection."""
    b, t = tokens.shape
    x = torch.from_numpy(sd["token_embedding.weight"])[tokens]
    x = x + torch.from_numpy(sd["positional_embedding"])[:t]
    mask = torch.full((t, t), float("-inf"))
    mask.triu_(1)  # CLIP's build_attention_mask
    for i in range(layers):
        x = torch_text_block(x, sd, f"transformer.resblocks.{i}", heads, mask)
    w = x.shape[-1]
    x = TF.layer_norm(x, (w,), torch.from_numpy(sd["ln_final.weight"]),
                      torch.from_numpy(sd["ln_final.bias"]), 1e-5)
    x = x[torch.arange(b), lengths - 1]
    return x @ torch.from_numpy(sd["text_projection"])


def _tiny_tower(ctx=12, vocab=50):
    return TextTransformer(vocab_size=vocab, context_length=ctx, width=32,
                           layers=2, heads=4, output_dim=16)


class TestFullTowerParity:
    """End-to-end numeric parity of the whole text tower against the torch
    oracle from one shared state dict — the same evidence tier as the
    m_resnet and ViT towers."""

    def test_full_tower_matches_torch(self):
        width, layers, heads, vocab, ctx, out_dim = 32, 3, 4, 50, 12, 16
        sd = _rand_text_sd(width, layers, vocab, ctx, out_dim)

        tokens = RNG.randint(1, vocab, (4, ctx)).astype(np.int64)
        lengths = np.array([12, 7, 1, 9], dtype=np.int64)
        want = torch_clip_text_forward(
            torch.from_numpy(tokens), torch.from_numpy(lengths), sd,
            layers, heads).numpy()

        model = TextTransformer(vocab_size=vocab, context_length=ctx,
                                width=width, layers=layers, heads=heads,
                                output_dim=out_dim)
        converted = convert_clip_text(sd, layers)
        init_vars = model.init(
            jax.random.PRNGKey(0), jnp.asarray(tokens, jnp.int32),
            jnp.asarray(lengths, jnp.int32))
        merged = merge_pretrained(init_vars, converted)
        got = np.asarray(model.apply(
            merged, jnp.asarray(tokens, jnp.int32),
            jnp.asarray(lengths, jnp.int32)))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_visual_keys_in_archive_are_ignored(self):
        """convert_clip_text accepts the FULL CLIP archive: ``visual.*``
        keys (including the visual tower's own transformer.resblocks, which
        the jit archive stores under the prefix) must not collide."""
        width, layers = 32, 1
        sd = _rand_text_sd(width, layers, 20, 8, 16)
        full = dict(sd)
        full["visual.transformer.resblocks.0.ln_1.weight"] = np.full(
            width, 99.0, np.float32)
        a = convert_clip_text(sd, layers)
        b = convert_clip_text(full, layers)
        np.testing.assert_array_equal(
            a["params"]["block_0"]["ln_1"]["scale"],
            b["params"]["block_0"]["ln_1"]["scale"])


class TestPooling:
    def test_padding_invariance(self):
        """The causal mask makes the EOT feature independent of every token
        past ``lengths`` — the packing-invariance the GRU tower only gets
        in pool_mode='always' (models/gru.py:masked_max_pool)."""
        model = _tiny_tower()
        tokens = RNG.randint(1, 50, (3, 10)).astype(np.int32)
        lengths = jnp.asarray([10, 4, 6], jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(tokens),
                               lengths)
        base = model.apply(variables, jnp.asarray(tokens), lengths)

        mutated = tokens.copy()
        mutated[1, 4:] = 33
        mutated[2, 6:] = 7
        got = model.apply(variables, jnp.asarray(mutated), lengths)
        np.testing.assert_array_equal(np.asarray(base[1:]),
                                      np.asarray(got[1:]))

    def test_eot_slot_selected(self):
        """Changing ``lengths`` moves the pooled slot: embeddings for the
        same tokens under different lengths must differ."""
        model = _tiny_tower()
        tokens = jnp.asarray(RNG.randint(1, 50, (1, 10)).astype(np.int32))
        variables = model.init(jax.random.PRNGKey(0), tokens,
                               jnp.asarray([10], jnp.int32))
        a = model.apply(variables, tokens, jnp.asarray([10], jnp.int32))
        b = model.apply(variables, tokens, jnp.asarray([5], jnp.int32))
        assert float(jnp.abs(a - b).max()) > 1e-6

    def test_context_overflow_is_an_error(self):
        model = _tiny_tower(ctx=8)
        tokens = jnp.zeros((1, 9), jnp.int32)
        try:
            model.init(jax.random.PRNGKey(0), tokens,
                       jnp.asarray([9], jnp.int32))
        except ValueError as e:
            assert "context_length" in str(e)
        else:
            raise AssertionError("length 9 > context 8 must raise")


class TestConverterResize:
    def test_pos_embed_1d_resize(self):
        """CONTEXT_LENGTH != 77 linearly resamples the positional table;
        identical lengths pass through bit-exact."""
        sd = _rand_text_sd(16, 1, 20, 8, 8)
        same = convert_clip_text(sd, 1, context_length=8)
        np.testing.assert_array_equal(same["params"]["positional_embedding"],
                                      sd["positional_embedding"])
        grown = convert_clip_text(sd, 1, context_length=12)
        assert grown["params"]["positional_embedding"].shape == (12, 16)
        # monotone resample: endpoints map near the source endpoints
        np.testing.assert_allclose(
            grown["params"]["positional_embedding"][0],
            sd["positional_embedding"][0], atol=1e-6)


class TestComposition:
    def test_build_and_grads(self):
        """build_model with MODEL.TEXTUAL_MODEL='transformer': init_all,
        eval forward, and finite gradients through both towers (the
        simple-head CMPM-style similarity loss)."""
        cfg = get_default_cfg()
        cfg.MODEL.TEXTUAL_MODEL = "transformer"
        cfg.MODEL.TRANSFORMER.WIDTH = 32
        cfg.MODEL.TRANSFORMER.LAYERS = 2
        cfg.MODEL.TRANSFORMER.HEADS = 4
        cfg.MODEL.TRANSFORMER.OUTPUT_DIM = 16
        cfg.MODEL.TRANSFORMER.VOCAB_SIZE = 50
        cfg.MODEL.TRANSFORMER.CONTEXT_LENGTH = 12
        cfg.MODEL.VISUAL_MODEL = "resnet18"
        cfg.MODEL.EMBEDDING.FEATURE_SIZE = 16
        cfg.MODEL.NUM_CLASSES = 4
        cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH = 32, 16

        from textreid_tpu.models import build_model

        model = build_model(cfg)
        assert model.textual.out_channels == 16

        rng = np.random.RandomState(0)
        px = jnp.asarray(rng.randint(0, 255, (2, 32, 16, 3), dtype=np.uint8))
        ids = jnp.asarray(rng.randint(1, 50, (2, 10)).astype(np.int32))
        lens = jnp.asarray([10, 4], jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), px, ids, lens,
                               method="init_all")
        ve, te = model.apply(variables, px, ids, lens)
        assert ve.shape == te.shape == (2, 16)

        def loss(params):
            v, t = model.apply(
                {**variables, "params": params}, px, ids, lens)
            return jnp.sum(v * t)

        grads = jax.grad(loss)(variables["params"])
        leaves = jax.tree.leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
        # gradients reach the text tower's transformer blocks
        g_blk = grads["textual"]["block_0"]["qkv"]["kernel"]
        assert float(jnp.abs(g_blk).max()) > 0

    def test_serving_with_transformer_query_tower(self):
        """RetrievalIndex is textual-tower-agnostic: gallery built and
        searched with the transformer as the query encoder (its EOT pooling
        is packing-invariant, so no serving pool_mode override applies —
        serving.py:47-49 is a GRU-only concern)."""
        from textreid_tpu.engine.state import TrainState
        from textreid_tpu.models import TextReIDModel
        from textreid_tpu.models.resnet import ResNet
        from textreid_tpu.serving import RetrievalIndex

        model = TextReIDModel(
            visual=ResNet(block="basic", layers=(1, 1, 1, 1)),
            textual=_tiny_tower(ctx=10),
            feature_size=16, num_classes=4,
        )
        rng = np.random.RandomState(0)
        px = jnp.asarray(rng.randint(0, 255, (2, 32, 16, 3), dtype=np.uint8))
        ids = jnp.asarray(rng.randint(1, 50, (2, 8)).astype(np.int32))
        lens = jnp.asarray([8, 4], jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), px, ids, lens,
                               method="init_all")
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            constants=variables.get("constants", {}), opt_state=None,
        )
        index = RetrievalIndex(model, state, use_pallas=False)
        batches = [rng.randint(0, 255, (5, 32, 16, 3), dtype=np.uint8)
                   for _ in range(2)]
        index.build_gallery(batches, meta=np.arange(100, 110))
        q_ids = rng.randint(1, 50, (3, 8)).astype(np.int32)
        q_lens = np.array([8, 5, 2], np.int32)
        scores, meta = index.search(q_ids, q_lens, k=4)
        assert scores.shape == (3, 4) and meta.shape == (3, 4)
        assert set(meta.ravel()).issubset(set(range(100, 110)))
        # padding invariance survives the serving path end to end
        q2 = q_ids.copy()
        q2[1, 5:] = 17
        s2, m2 = index.search(q2, q_lens, k=4)
        np.testing.assert_allclose(scores[1], s2[1], atol=1e-6)
        np.testing.assert_array_equal(meta[1], m2[1])

    def test_named_presets(self):
        cfg = get_default_cfg()
        cfg.MODEL.TEXTUAL_MODEL = "transformer"
        cfg.MODEL.TRANSFORMER.ARCH = "clip_text_b16"
        tower = build_text_transformer(cfg)
        assert (tower.width, tower.layers, tower.heads,
                tower.output_dim) == (512, 12, 8, 512)
        cfg.MODEL.TRANSFORMER.ARCH = "nope"
        try:
            build_text_transformer(cfg)
        except KeyError as e:
            assert "nope" in str(e)
        else:
            raise AssertionError("unknown ARCH must raise")
