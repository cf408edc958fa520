"""PyTorch <-> JAX weight conversion.

One-time importers for the three external checkpoint families the reference
consumes (SURVEY.md section 5.4), plus the inverse exporter
(:func:`export_textreid_checkpoint` / `tools/export_torch.py`) so models
trained here can be evaluated by the upstream torch code:

* OpenAI CLIP jit archives ``RN50.pt`` / ``RN101.pt`` — ``visual.`` prefix
  strip + bilinear position-embedding resize for non-224 inputs
  (`/root/reference/lib/models/backbones/m_resnet.py:235-291`),
* torchvision ImageNet ResNets (`lib/models/backbones/resnet.py:125-128`),
* released TextReID training checkpoints (full ``Model`` state dicts incl.
  MoCo key encoders, queues and the loss projection).

Layout rules: torch conv ``[out, in, kh, kw]`` -> flax ``[kh, kw, in, out]``;
torch linear ``[out, in]`` -> flax kernel ``[in, out]``; torch GRU
``weight_ih_l0 [3H, E]`` (gate order r,z,n) -> our ``fwd_w_ih_l0 [E, 3H]``
(same gate order, transposed); BN weight/bias -> scale/bias with running
mean/var into ``batch_stats``.

Everything operates on plain numpy so torch is only needed to *read* ``.pth``
files (``load_torch_state_dict``); the mapping itself is testable without
checkpoint files.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import jax
import numpy as np

Array = np.ndarray
StateDict = Dict[str, Array]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def conv_kernel(w: Array) -> Array:
    """torch [out, in, kh, kw] -> flax [kh, kw, in, out]."""
    return np.transpose(w, (2, 3, 1, 0))


def linear_kernel(w: Array) -> Array:
    """torch [out, in] -> flax [in, out]."""
    return np.transpose(w, (1, 0))


def bn_params(sd: StateDict, prefix: str) -> Tuple[dict, dict]:
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }
    return params, stats


def _bilinear_axis(x: Array, new_size: int, axis: int) -> Array:
    """Bilinear resample along one axis with half-pixel centers and NO
    antialiasing — torch ``F.interpolate(mode="bilinear",
    align_corners=False)`` semantics (jax.image.resize antialiases on
    downscale, so it cannot be used here)."""
    old_size = x.shape[axis]
    if old_size == new_size:
        return x
    coords = (np.arange(new_size) + 0.5) * (old_size / new_size) - 0.5
    lo = np.floor(coords).astype(np.int64)
    frac = (coords - lo).astype(x.dtype)
    lo_c = np.clip(lo, 0, old_size - 1)
    hi_c = np.clip(lo + 1, 0, old_size - 1)
    a = np.take(x, lo_c, axis=axis)
    b = np.take(x, hi_c, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = new_size
    frac = frac.reshape(shape)
    return a * (1 - frac) + b * frac


def resize_pos_embed(posemb: Array, new_grid: Tuple[int, int]) -> Array:
    """Bilinear-resize the CLIP attention-pool position embedding from its
    square source grid to ``new_grid`` (reference m_resnet.py:220-232:
    ``F.interpolate(..., mode="bilinear", align_corners=False)``)."""
    tok, grid = posemb[:1], posemb[1:]
    gs_old = int(round(len(grid) ** 0.5))
    assert gs_old * gs_old == len(grid), f"non-square source grid: {len(grid)}"
    grid = grid.reshape(gs_old, gs_old, -1)
    grid = _bilinear_axis(grid, new_grid[0], axis=0)
    grid = _bilinear_axis(grid, new_grid[1], axis=1)
    resized = grid.reshape(new_grid[0] * new_grid[1], -1)
    return np.concatenate([tok, resized], axis=0)


# ---------------------------------------------------------------------------
# module-level converters
# ---------------------------------------------------------------------------

def convert_m_resnet(
    sd: StateDict,
    layers: Tuple[int, ...],
    final_grid: Optional[Tuple[int, int]] = None,
) -> dict:
    """CLIP ModifiedResNet state dict -> our flax variables.

    ``sd`` keys may carry a ``visual.`` prefix (CLIP jit archives); it is
    stripped.  Returns ``{"params": ..., "batch_stats": ...}`` shaped for
    ``textreid_tpu.models.m_resnet.ModifiedResNet``.
    """
    sd = {
        (k[len("visual."):] if k.startswith("visual.") else k): np.asarray(v)
        for k, v in sd.items()
    }
    params: dict = {}
    stats: dict = {}

    for i in (1, 2, 3):
        params[f"conv{i}"] = {"kernel": conv_kernel(sd[f"conv{i}.weight"])}
        params[f"bn{i}"], stats[f"bn{i}"] = bn_params(sd, f"bn{i}")

    for stage, blocks in enumerate(layers, start=1):
        for b in range(blocks):
            src = f"layer{stage}.{b}"
            dst = f"layer{stage}_{b}"
            bp: dict = {}
            bs: dict = {}
            for i in (1, 2, 3):
                bp[f"conv{i}"] = {"kernel": conv_kernel(sd[f"{src}.conv{i}.weight"])}
                bp[f"bn{i}"], bs[f"bn{i}"] = bn_params(sd, f"{src}.bn{i}")
            if f"{src}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": conv_kernel(sd[f"{src}.downsample.0.weight"])
                }
                bp["downsample_bn"], bs["downsample_bn"] = bn_params(
                    sd, f"{src}.downsample.1"
                )
            params[dst] = bp
            stats[dst] = bs

    pos = sd["attnpool.positional_embedding"]
    if final_grid is not None and len(pos) - 1 != final_grid[0] * final_grid[1]:
        pos = resize_pos_embed(pos, final_grid)
    attn = {"positional_embedding": pos}
    for name in ("q_proj", "k_proj", "v_proj", "c_proj"):
        attn[name] = {
            "kernel": linear_kernel(sd[f"attnpool.{name}.weight"]),
            "bias": sd[f"attnpool.{name}.bias"],
        }
    params["attnpool"] = attn
    return {"params": params, "batch_stats": stats}


def convert_resnet(sd: StateDict, layers: Tuple[int, ...],
                   bottleneck: bool = True) -> dict:
    """torchvision ResNet state dict -> our flax variables (fc stripped,
    reference resnet.py:178-183)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {"conv1": {"kernel": conv_kernel(sd["conv1.weight"])}}
    stats: dict = {}
    params["bn1"], stats["bn1"] = bn_params(sd, "bn1")

    n_convs = 3 if bottleneck else 2
    for stage, blocks in enumerate(layers, start=1):
        for b in range(blocks):
            src = f"layer{stage}.{b}"
            dst = f"layer{stage}_{b}"
            bp: dict = {}
            bs: dict = {}
            for i in range(1, n_convs + 1):
                bp[f"conv{i}"] = {"kernel": conv_kernel(sd[f"{src}.conv{i}.weight"])}
                bp[f"bn{i}"], bs[f"bn{i}"] = bn_params(sd, f"{src}.bn{i}")
            if f"{src}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": conv_kernel(sd[f"{src}.downsample.0.weight"])
                }
                bp["downsample_bn"], bs["downsample_bn"] = bn_params(
                    sd, f"{src}.downsample.1"
                )
            params[dst] = bp
            stats[dst] = bs
    return {"params": params, "batch_stats": stats}


def convert_gru(sd: StateDict, num_layers: int = 1,
                bidirectional: bool = True) -> dict:
    """torch nn.GRU weights (``gru.`` prefix) + optional embedding table ->
    BiGRUEncoder params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}
    if "embed.weight" in sd:
        w = sd["embed.weight"]
        if w.ndim == 2 and "gru.weight_ih_l0" in sd and (
            w.shape[1] == sd["gru.weight_ih_l0"].shape[1]
        ):
            # learnable nn.Embedding [V, E]
            params["token_embedding"] = w
        else:
            # Linear adapter over a frozen table
            params["embed_adapter"] = {"kernel": linear_kernel(w)}
            if "embed.bias" in sd:
                params["embed_adapter"]["bias"] = sd["embed.bias"]
    for layer in range(num_layers):
        params[f"fwd_w_ih_l{layer}"] = linear_kernel(sd[f"gru.weight_ih_l{layer}"])
        params[f"fwd_w_hh_l{layer}"] = linear_kernel(sd[f"gru.weight_hh_l{layer}"])
        if bidirectional:
            params[f"bwd_w_ih_l{layer}"] = linear_kernel(
                sd[f"gru.weight_ih_l{layer}_reverse"]
            )
            params[f"bwd_w_hh_l{layer}"] = linear_kernel(
                sd[f"gru.weight_hh_l{layer}_reverse"]
            )
    return {"params": params}


def _dense(sd: StateDict, prefix: str) -> dict:
    return {
        "kernel": linear_kernel(np.asarray(sd[f"{prefix}.weight"])),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _subdict(sd: StateDict, prefix: str) -> StateDict:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_textreid_checkpoint(sd: StateDict, cfg) -> dict:
    """Full reference ``Model`` state dict -> pieces of our TrainState.

    Handles both head types.  Returns a dict with keys among
    ``params, batch_stats, key_params, key_batch_stats, v_queue, t_queue,
    id_queue, queue_ptr`` (queues transposed to our [K, D] row layout).
    """
    sd = {re.sub(r"^module\.", "", k): np.asarray(v) for k, v in sd.items()}
    is_moco = any(k.startswith("embed_model.v_encoder_k") for k in sd)

    vis_layers = {
        "m_resnet50": (3, 4, 6, 3),
        "m_resnet": (3, 4, 6, 3),
        "m_resnet101": (3, 4, 23, 3),
        "resnet18": (2, 2, 2, 2),
        "resnet34": (3, 4, 6, 3),
        "resnet50": (3, 4, 6, 3),
        "resnet101": (3, 4, 23, 3),
        "resnet152": (3, 8, 36, 3),
    }[cfg.MODEL.VISUAL_MODEL]
    is_clip = cfg.MODEL.VISUAL_MODEL.startswith("m_")
    bottleneck = cfg.MODEL.VISUAL_MODEL not in ("resnet18", "resnet34")
    down = 16 if cfg.MODEL.RESNET.RES5_STRIDE == 1 else 32
    final_grid = (cfg.INPUT.HEIGHT // down, cfg.INPUT.WIDTH // down)

    def conv_visual(sub):
        if is_clip:
            return convert_m_resnet(sub, vis_layers, final_grid)
        return convert_resnet(sub, vis_layers, bottleneck=bottleneck)

    def conv_textual(sub):
        return convert_gru(sub, num_layers=cfg.MODEL.GRU.NUM_LAYER)

    out: dict = {}
    visual_q = conv_visual(_subdict(sd, "visual_model."))
    textual_q = conv_textual(_subdict(sd, "textual_model."))

    params = {
        "visual": visual_q["params"],
        "textual": textual_q["params"],
    }
    batch_stats = {"visual": visual_q["batch_stats"]}

    if is_moco:
        em = "embed_model."
        params["v_embed_layer"] = _dense(sd, em + "v_embed_layer")
        params["t_embed_layer"] = _dense(sd, em + "t_embed_layer")
        params["projection"] = np.asarray(sd[em + "loss_evaluator.projection"])
        if f"{em}v_fc_q.0.weight" in sd:
            for tower in ("v", "t"):
                params[f"{tower}_fc"] = {
                    "fc1": _dense(sd, f"{em}{tower}_fc_q.0"),
                    "fc2": _dense(sd, f"{em}{tower}_fc_q.2"),
                }
        visual_k = conv_visual(_subdict(sd, em + "v_encoder_k."))
        textual_k = conv_textual(_subdict(sd, em + "t_encoder_k."))
        key_params = {
            "visual": visual_k["params"],
            "textual": textual_k["params"],
        }
        if f"{em}v_fc_k.0.weight" in sd:
            for tower in ("v", "t"):
                key_params[f"{tower}_fc"] = {
                    "fc1": _dense(sd, f"{em}{tower}_fc_k.0"),
                    "fc2": _dense(sd, f"{em}{tower}_fc_k.2"),
                }
        out["key_params"] = key_params
        out["key_batch_stats"] = {"visual": visual_k["batch_stats"]}
        # reference queues are [D, K] (head.py:53-56); ours are [K, D]
        out["v_queue"] = np.transpose(sd[em + "v_queue"], (1, 0))
        out["t_queue"] = np.transpose(sd[em + "t_queue"], (1, 0))
        out["id_queue"] = sd[em + "id_queue"].reshape(-1).astype(np.int32)
        out["queue_ptr"] = np.asarray(sd[em + "queue_ptr"]).reshape(()).astype(
            np.int32
        )
    else:
        em = "embed_model."
        params["v_embed_layer"] = _dense(sd, em + "visual_embed_layer")
        params["t_embed_layer"] = _dense(sd, em + "textual_embed_layer")
        params["projection"] = np.asarray(sd[em + "loss_evaluator.projection"])

    out["params"] = params
    out["batch_stats"] = batch_stats
    return out


# ---------------------------------------------------------------------------
# export: our TrainState pieces -> reference-layout torch state dict
# ---------------------------------------------------------------------------

def _inv_conv_kernel(k: Array) -> Array:
    """flax [kh, kw, in, out] -> torch [out, in, kh, kw]."""
    return np.transpose(np.asarray(k), (3, 2, 0, 1))


def _inv_linear_kernel(k: Array) -> Array:
    """flax [in, out] -> torch [out, in]."""
    return np.transpose(np.asarray(k), (1, 0))


def _export_bn(out: dict, prefix: str, p: dict, s: dict) -> None:
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])
    out[f"{prefix}.running_mean"] = np.asarray(s["mean"])
    out[f"{prefix}.running_var"] = np.asarray(s["var"])
    out[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)


def _export_dense(out: dict, prefix: str, p: dict) -> None:
    out[f"{prefix}.weight"] = _inv_linear_kernel(p["kernel"])
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _export_visual(out: dict, prefix: str, params: dict, stats: dict,
                   is_clip: bool) -> None:
    """Inverse of convert_m_resnet / convert_resnet (pos-embed kept at the
    current grid — the importer's resize is for grid *changes* only)."""
    stem = (1, 2, 3) if is_clip else (1,)
    for i in stem:
        out[f"{prefix}conv{i}.weight"] = _inv_conv_kernel(
            params[f"conv{i}"]["kernel"])
        _export_bn(out, f"{prefix}bn{i}", params[f"bn{i}"], stats[f"bn{i}"])
    for dst in sorted(k for k in params if k.startswith("layer")):
        stage, b = dst[len("layer"):].split("_")
        src = f"{prefix}layer{stage}.{b}"
        bp, bs = params[dst], stats[dst]
        for i in (1, 2, 3):
            if f"conv{i}" not in bp:
                continue  # basic blocks have two convs
            out[f"{src}.conv{i}.weight"] = _inv_conv_kernel(
                bp[f"conv{i}"]["kernel"])
            _export_bn(out, f"{src}.bn{i}", bp[f"bn{i}"], bs[f"bn{i}"])
        if "downsample_conv" in bp:
            out[f"{src}.downsample.0.weight"] = _inv_conv_kernel(
                bp["downsample_conv"]["kernel"])
            _export_bn(out, f"{src}.downsample.1", bp["downsample_bn"],
                       bs["downsample_bn"])
    if is_clip:
        attn = params["attnpool"]
        out[f"{prefix}attnpool.positional_embedding"] = np.asarray(
            attn["positional_embedding"])
        for name in ("q_proj", "k_proj", "v_proj", "c_proj"):
            _export_dense(out, f"{prefix}attnpool.{name}", attn[name])


def _export_textual(out: dict, prefix: str, params: dict,
                    constants: Optional[dict] = None) -> None:
    """Inverse of convert_gru (reference gru.py: nn.GRU bias=False; embed is
    nn.Embedding(padding_idx=0), an nn.Linear adapter, or absent)."""
    if "token_embedding" in params:
        table = np.asarray(params["token_embedding"]).copy()
        table[0] = 0.0  # nn.Embedding(padding_idx=0): the pad row is zero
        out[f"{prefix}embed.weight"] = table
    elif "embed_adapter" in params:
        _export_dense(out, f"{prefix}embed", params["embed_adapter"])
    del constants  # the frozen CLIP table is not a reference model weight
    layers = sorted({int(k.rsplit("l", 1)[1]) for k in params
                     if k.startswith("fwd_w_ih_l")})
    for layer in layers:
        out[f"{prefix}gru.weight_ih_l{layer}"] = _inv_linear_kernel(
            params[f"fwd_w_ih_l{layer}"])
        out[f"{prefix}gru.weight_hh_l{layer}"] = _inv_linear_kernel(
            params[f"fwd_w_hh_l{layer}"])
        if f"bwd_w_ih_l{layer}" in params:
            out[f"{prefix}gru.weight_ih_l{layer}_reverse"] = _inv_linear_kernel(
                params[f"bwd_w_ih_l{layer}"])
            out[f"{prefix}gru.weight_hh_l{layer}_reverse"] = _inv_linear_kernel(
                params[f"bwd_w_hh_l{layer}"])


def export_textreid_checkpoint(pieces: dict, cfg) -> StateDict:
    """Our TrainState pieces -> a reference-layout torch state dict — the
    exact inverse of :func:`convert_textreid_checkpoint`, so a model trained
    here can be evaluated by the upstream torch code (and round-trips
    bit-exactly through import -> export).

    Two documented round-trip exceptions: BN ``num_batches_tracked``
    counters come back 0 (torch bookkeeping with no slot in our state and
    no effect on eval-mode BN), and the attnpool positional embedding stays
    at the trained grid (the reference resizes it at load itself).

    ``pieces`` uses the importer's output schema: ``params``/``batch_stats``
    mandatory; ``key_params``/``key_batch_stats``/``v_queue``/``t_queue``/
    ``id_queue``/``queue_ptr`` for MoCo states (queues in our [K, D] row
    layout — transposed back to the reference's [D, K],
    moco_head/head.py:53-58).  Only the bi-GRU textual tower has a
    reference counterpart; exporting a transformer-tower state raises.
    """
    if cfg.MODEL.TEXTUAL_MODEL != "bigru":
        raise ValueError(
            f"the reference has no {cfg.MODEL.TEXTUAL_MODEL!r} textual "
            "tower — only bigru states can be exported to its layout"
        )
    params = jax.tree.map(np.asarray, dict(pieces["params"]))
    stats = jax.tree.map(np.asarray, dict(pieces.get("batch_stats", {})))
    is_clip = cfg.MODEL.VISUAL_MODEL.startswith("m_")
    is_moco = cfg.MODEL.EMBEDDING.EMBED_HEAD == "moco"

    out: StateDict = {}
    _export_visual(out, "visual_model.", params["visual"],
                   stats.get("visual", {}), is_clip)
    _export_textual(out, "textual_model.", params["textual"],
                    pieces.get("constants"))

    em = "embed_model."
    if is_moco:
        _export_dense(out, em + "v_embed_layer", params["v_embed_layer"])
        _export_dense(out, em + "t_embed_layer", params["t_embed_layer"])
        out[em + "loss_evaluator.projection"] = params["projection"]
        if "v_fc" in params:
            for tower in ("v", "t"):
                _export_dense(out, f"{em}{tower}_fc_q.0",
                              params[f"{tower}_fc"]["fc1"])
                _export_dense(out, f"{em}{tower}_fc_q.2",
                              params[f"{tower}_fc"]["fc2"])
        key_params = jax.tree.map(np.asarray, dict(pieces["key_params"]))
        key_stats = jax.tree.map(
            np.asarray, dict(pieces.get("key_batch_stats", {})))
        _export_visual(out, em + "v_encoder_k.", key_params["visual"],
                       key_stats.get("visual", {}), is_clip)
        _export_textual(out, em + "t_encoder_k.", key_params["textual"])
        if "v_fc" in key_params:
            for tower in ("v", "t"):
                _export_dense(out, f"{em}{tower}_fc_k.0",
                              key_params[f"{tower}_fc"]["fc1"])
                _export_dense(out, f"{em}{tower}_fc_k.2",
                              key_params[f"{tower}_fc"]["fc2"])
        out[em + "v_queue"] = np.transpose(np.asarray(pieces["v_queue"]),
                                           (1, 0))
        out[em + "t_queue"] = np.transpose(np.asarray(pieces["t_queue"]),
                                           (1, 0))
        out[em + "id_queue"] = np.asarray(
            pieces["id_queue"]).reshape(1, -1).astype(np.int64)
        out[em + "queue_ptr"] = np.asarray(
            pieces["queue_ptr"]).reshape(1).astype(np.int64)
    else:
        _export_dense(out, em + "visual_embed_layer",
                      params["v_embed_layer"])
        _export_dense(out, em + "textual_embed_layer",
                      params["t_embed_layer"])
        out[em + "loss_evaluator.projection"] = params["projection"]
    return out


def save_torch_state_dict(sd: StateDict, path: str) -> None:
    """Write a numpy state dict as a torch ``.pth`` the reference's
    ``Checkpointer`` loads (``{"model": state_dict}``, reference
    checkpoint.py:40-47)."""
    import torch

    torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in sd.items()}}, path)


def resize_pos_embed_2d(posemb: Array, src_grid: Tuple[int, int],
                        new_grid: Tuple[int, int]) -> Array:
    """Like :func:`resize_pos_embed` but with an explicit (possibly
    non-square) source grid."""
    tok, grid = posemb[:1], posemb[1:]
    assert len(grid) == src_grid[0] * src_grid[1]
    grid = grid.reshape(src_grid[0], src_grid[1], -1)
    grid = _bilinear_axis(grid, new_grid[0], axis=0)
    grid = _bilinear_axis(grid, new_grid[1], axis=1)
    return np.concatenate(
        [tok, grid.reshape(new_grid[0] * new_grid[1], -1)], axis=0
    )


def convert_clip_vit(sd: StateDict, layers: int,
                     final_grid: Optional[Tuple[int, int]] = None) -> dict:
    """CLIP VisionTransformer state dict (``visual.`` prefix tolerated) ->
    our ``models.vit.VisionTransformer`` variables."""
    if any(k.startswith("visual.") for k in sd):
        # Full CLIP archive: keep only the visual subtree — the text tower
        # also has top-level ``transformer.resblocks.*`` keys that would
        # otherwise collide with the stripped visual ones.
        sd = {k[len("visual."):]: np.asarray(v)
              for k, v in sd.items() if k.startswith("visual.")}
    else:
        sd = {k: np.asarray(v) for k, v in sd.items()}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    pos = sd["positional_embedding"]
    if final_grid is not None and len(pos) - 1 != final_grid[0] * final_grid[1]:
        pos = resize_pos_embed(pos, final_grid)

    params: dict = {
        "patch_embed": {"kernel": conv_kernel(sd["conv1.weight"])},
        "class_embedding": sd["class_embedding"],
        "positional_embedding": pos,
        "ln_pre": ln("ln_pre"),
        "ln_post": ln("ln_post"),
        "proj": sd["proj"],
    }
    for i in range(layers):
        params[f"block_{i}"] = _clip_block(sd, f"transformer.resblocks.{i}")
    return {"params": params}


def _clip_block(sd: StateDict, src: str) -> dict:
    """One CLIP residual attention block -> our ``TransformerBlock`` params
    (shared by the ViT visual tower and the text transformer)."""

    def ln(prefix):
        return {"scale": np.asarray(sd[f"{prefix}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.bias"])}

    return {
        "ln_1": ln(f"{src}.ln_1"),
        "qkv": {
            "kernel": linear_kernel(np.asarray(sd[f"{src}.attn.in_proj_weight"])),
            "bias": np.asarray(sd[f"{src}.attn.in_proj_bias"]),
        },
        "out_proj": _dense(sd, f"{src}.attn.out_proj"),
        "ln_2": ln(f"{src}.ln_2"),
        "c_fc": _dense(sd, f"{src}.mlp.c_fc"),
        "c_proj": _dense(sd, f"{src}.mlp.c_proj"),
    }


def convert_clip_text(sd: StateDict, layers: int,
                      context_length: Optional[int] = None) -> dict:
    """The text half of a CLIP state dict -> our
    ``models.text_transformer.TextTransformer`` variables.

    CLIP jit archives hold the text tower at the top level
    (``token_embedding.weight``, ``positional_embedding``,
    ``transformer.resblocks.*``, ``ln_final``, ``text_projection``) next to
    the ``visual.*`` subtree; pass the full dict — visual keys are ignored.
    When ``context_length`` differs from the checkpoint's (77), the
    positional table is linearly resampled along the sequence axis (the
    same half-pixel no-antialias interpolation as the 2-D visual resize).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()
          if not k.startswith("visual.")}

    pos = sd["positional_embedding"]
    if context_length is not None and len(pos) != context_length:
        pos = _bilinear_axis(pos, context_length, axis=0)

    params: dict = {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": pos,
        "ln_final": {"scale": sd["ln_final.weight"],
                     "bias": sd["ln_final.bias"]},
        "text_projection": sd["text_projection"],
    }
    for i in range(layers):
        params[f"block_{i}"] = _clip_block(sd, f"transformer.resblocks.{i}")
    return {"params": params}


# ---------------------------------------------------------------------------
# file readers (torch only needed here)
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> StateDict:
    """Read a ``.pth`` checkpoint or a CLIP jit archive into numpy."""
    import torch

    try:
        obj = torch.jit.load(path, map_location="cpu").state_dict()
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict) and "model" in obj:
            obj = obj["model"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if isinstance(v, (np.ndarray,)) or hasattr(v, "detach")}


def load_clip_visual(path: str, arch: str, final_grid: Tuple[int, int],
                     sd: Optional[StateDict] = None) -> dict:
    """CLIP jit archive -> ModifiedResNet variables
    (reference m_resnet.py:246-291).  Pass ``sd`` to reuse an
    already-loaded archive (they are hundreds of MB)."""
    layers = {"RN50": (3, 4, 6, 3), "RN101": (3, 4, 23, 3)}[arch]
    if sd is None:
        sd = load_torch_state_dict(path)
    visual = {k: v for k, v in sd.items() if k.startswith("visual.")}
    return convert_m_resnet(visual, layers, final_grid)


def merge_pretrained(variables: dict, converted: dict,
                     tolerant: bool = False) -> dict:
    """Overlay converted weights onto freshly-initialized variables,
    keeping any leaves the checkpoint does not provide (the tolerant-load
    contract of reference checkpoint.py:90-148).

    ``tolerant=True`` additionally aligns *renamed/moved* leaves by
    longest-suffix key matching (reference checkpoint.py:90-127), so a
    checkpoint from a slightly restructured model revision loads with
    warnings instead of silently keeping init for moved subtrees.
    """
    import jax.numpy as jnp

    if tolerant:
        from .checkpoint import align_pytree

        return {
            coll: jax.tree.map(
                lambda leaf, ref: jnp.asarray(leaf, np.asarray(ref).dtype),
                align_pytree(jax.device_get(tree),
                             converted.get(coll, {}), label=coll),
                tree,
            )
            for coll, tree in variables.items()
        }

    def merge(dst, src, path):
        if not isinstance(dst, dict):
            if src is None:
                return dst
            src = jnp.asarray(src)
            if tuple(src.shape) != tuple(np.asarray(dst).shape):
                raise ValueError(
                    f"pretrained-weight shape mismatch at {path}: checkpoint "
                    f"{tuple(src.shape)} vs model {tuple(np.asarray(dst).shape)}"
                    " — the archive does not match the configured model"
                    " (wrong CLIP variant / MODEL.* spec?)"
                )
            return src.astype(np.asarray(dst).dtype)
        out = {}
        for k, v in dst.items():
            out[k] = (merge(v, src.get(k), f"{path}/{k}")
                      if isinstance(src, dict) else v)
        return out

    return {
        coll: merge(tree, converted.get(coll, {}), coll)
        for coll, tree in variables.items()
    }
