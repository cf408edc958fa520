"""Full-stack ModifiedResNet parity.

Oracle: the CLIP-RN forward recomputed with torch *functional* ops straight
from a random state dict (stem conv/bn/relu x3 -> avgpool -> anti-aliased
bottlenecks -> CLS attention pool), then compared against our Flax model fed
the converted weights.  Covers conv padding, BN eval math, avgpool placement,
downsample branch order, residual relu, and the attention pool end to end.
"""

import numpy as np
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from textreid_tpu.models.m_resnet import ModifiedResNet
from textreid_tpu.utils.weight_convert import convert_m_resnet, merge_pretrained
from tests.test_weight_convert import _rand_m_resnet_sd

LAYERS = (1, 1, 1, 1)
WIDTH = 16
OUT_DIM = 24
RES = (32, 16)  # -> final grid (2, 1) at last_stride=1


def t(sd, key):
    return torch.from_numpy(sd[key])


def torch_bn(x, sd, p):
    return TF.batch_norm(
        x, t(sd, p + ".running_mean"), t(sd, p + ".running_var"),
        t(sd, p + ".weight"), t(sd, p + ".bias"), training=False, eps=1e-5,
    )


def torch_bottleneck(x, sd, prefix, stride):
    out = TF.relu(torch_bn(TF.conv2d(x, t(sd, prefix + ".conv1.weight")),
                           sd, prefix + ".bn1"))
    out = TF.relu(torch_bn(TF.conv2d(out, t(sd, prefix + ".conv2.weight"),
                                     padding=1), sd, prefix + ".bn2"))
    if stride > 1:
        out = TF.avg_pool2d(out, stride)
    out = torch_bn(TF.conv2d(out, t(sd, prefix + ".conv3.weight")),
                   sd, prefix + ".bn3")
    if prefix + ".downsample.0.weight" in sd:
        identity = x
        if stride > 1:
            identity = TF.avg_pool2d(identity, stride)
        identity = torch_bn(
            TF.conv2d(identity, t(sd, prefix + ".downsample.0.weight")),
            sd, prefix + ".downsample.1",
        )
    else:
        identity = x
    return TF.relu(out + identity)


def torch_attnpool(x, sd, heads, out_dim):
    b, c, h, w = x.shape
    tokens = x.reshape(b, c, h * w).permute(2, 0, 1)
    tokens = torch.cat([tokens.mean(dim=0, keepdim=True), tokens], dim=0)
    tokens = tokens + t(sd, "attnpool.positional_embedding")[:, None, :]
    out, _ = TF.multi_head_attention_forward(
        query=tokens, key=tokens, value=tokens,
        embed_dim_to_check=c, num_heads=heads,
        q_proj_weight=t(sd, "attnpool.q_proj.weight"),
        k_proj_weight=t(sd, "attnpool.k_proj.weight"),
        v_proj_weight=t(sd, "attnpool.v_proj.weight"),
        in_proj_weight=None,
        in_proj_bias=torch.cat([
            t(sd, "attnpool.q_proj.bias"),
            t(sd, "attnpool.k_proj.bias"),
            t(sd, "attnpool.v_proj.bias"),
        ]),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
        out_proj_weight=t(sd, "attnpool.c_proj.weight"),
        out_proj_bias=t(sd, "attnpool.c_proj.bias"),
        use_separate_proj_weight=True, training=False, need_weights=False,
    )
    return out[0]


def torch_forward(x, sd):
    x = TF.relu(torch_bn(TF.conv2d(x, t(sd, "conv1.weight"), stride=2,
                                   padding=1), sd, "bn1"))
    x = TF.relu(torch_bn(TF.conv2d(x, t(sd, "conv2.weight"), padding=1),
                         sd, "bn2"))
    x = TF.relu(torch_bn(TF.conv2d(x, t(sd, "conv3.weight"), padding=1),
                         sd, "bn3"))
    x = TF.avg_pool2d(x, 2)
    for stage in range(1, 5):
        stride = 1 if stage == 1 else (2 if stage < 4 else 1)
        for b in range(LAYERS[stage - 1]):
            x = torch_bottleneck(x, sd, f"layer{stage}.{b}",
                                 stride if b == 0 else 1)
    return torch_attnpool(x, sd, heads=4, out_dim=OUT_DIM)


def test_modified_resnet_full_parity():
    sd = _rand_m_resnet_sd(LAYERS, WIDTH, OUT_DIM, src_grid=7)
    # Use a position embedding already at the final grid so no resize is
    # involved in this test (resize parity is covered separately).
    embed_dim = WIDTH * 32
    sd["attnpool.positional_embedding"] = np.random.RandomState(5).randn(
        2 * 1 + 1, embed_dim
    ).astype(np.float32) * 0.1

    x = np.random.RandomState(9).randn(2, 3, *RES).astype(np.float32)
    want = torch_forward(torch.from_numpy(x), sd).detach().numpy()

    model = ModifiedResNet(
        layers=LAYERS, output_dim=OUT_DIM, heads=4, last_stride=1,
        input_resolution=RES, width=WIDTH,
    )
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    init_vars = model.init(jax.random.PRNGKey(0), xj)
    merged = merge_pretrained(
        init_vars, convert_m_resnet(sd, LAYERS, model.final_grid)
    )
    got = np.asarray(model.apply(merged, xj))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_modified_resnet_res5_stride2():
    """last_stride=2 path (default RESNET.RES5_STRIDE) also matches."""
    sd = _rand_m_resnet_sd(LAYERS, WIDTH, OUT_DIM, src_grid=7)
    embed_dim = WIDTH * 32
    # final grid (1, 1) with last_stride=2 over 32x16... 32/32=1, 16/32=0 ->
    # use a taller input so the grid stays >= 1.
    res = (64, 32)
    sd["attnpool.positional_embedding"] = np.random.RandomState(5).randn(
        2 * 1 + 1, embed_dim
    ).astype(np.float32) * 0.1

    x = np.random.RandomState(11).randn(1, 3, *res).astype(np.float32)

    def torch_forward_s2(xt):
        y = TF.relu(torch_bn(TF.conv2d(xt, t(sd, "conv1.weight"), stride=2,
                                       padding=1), sd, "bn1"))
        y = TF.relu(torch_bn(TF.conv2d(y, t(sd, "conv2.weight"), padding=1),
                             sd, "bn2"))
        y = TF.relu(torch_bn(TF.conv2d(y, t(sd, "conv3.weight"), padding=1),
                             sd, "bn3"))
        y = TF.avg_pool2d(y, 2)
        for stage in range(1, 5):
            stride = 1 if stage == 1 else 2
            for b in range(LAYERS[stage - 1]):
                y = torch_bottleneck(y, sd, f"layer{stage}.{b}",
                                     stride if b == 0 else 1)
        return torch_attnpool(y, sd, heads=4, out_dim=OUT_DIM)

    want = torch_forward_s2(torch.from_numpy(x)).detach().numpy()
    model = ModifiedResNet(
        layers=LAYERS, output_dim=OUT_DIM, heads=4, last_stride=2,
        input_resolution=res, width=WIDTH,
    )
    assert model.final_grid == (2, 1)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    init_vars = model.init(jax.random.PRNGKey(0), xj)
    merged = merge_pretrained(
        init_vars, convert_m_resnet(sd, LAYERS, model.final_grid)
    )
    got = np.asarray(model.apply(merged, xj))
    np.testing.assert_allclose(got, want, atol=2e-4)


class TestDegenerateInputGuards:
    """An input resolution the trunk downsamples to an empty grid must be a
    loud build-time error, not a silent NaN (the attnpool mean over zero
    tokens) — found by the /verify drive at 32x16 with RES5_STRIDE=2."""

    def test_m_resnet_empty_grid_raises(self):
        import jax.numpy as jnp
        import pytest

        from textreid_tpu.models.m_resnet import modified_resnet50

        with pytest.raises(ValueError, match="too small"):
            modified_resnet50((32, 16), 2, dtype=jnp.bfloat16).final_grid

    def test_m_resnet_stride1_ok(self):
        import jax.numpy as jnp

        from textreid_tpu.models.m_resnet import modified_resnet50

        assert modified_resnet50((32, 16), 1,
                                 dtype=jnp.bfloat16).final_grid == (2, 1)

    def test_vit_empty_patch_grid_raises(self):
        import pytest

        from textreid_tpu.models.vit import VisionTransformer

        with pytest.raises(ValueError, match="empty"):
            VisionTransformer(input_resolution=(32, 16), patch_size=32).grid
