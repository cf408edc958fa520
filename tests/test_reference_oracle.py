"""Full-pipeline parity against the ACTUAL reference torch code.

Real CUHK-PEDES artifacts cannot be mounted here (zero egress), so — per the
round-1 verdict fallback — this module executes `/root/reference`'s own code
(via the shims in oracle_utils.py) on a synthetic dataset and diffs complete
pipelines:

* eval:   reference ``inference`` -> ``evaluation`` vs ours, same converted
          weights, same on-disk dataset: similarity matrix, rerank matrices
          and the full CMC/mAP grid must agree
          (`lib/engine/inference.py:48-96`, `lib/data/metrics/evaluation.py`);
* replay: ``inference_data.npz`` written by the torch code must replay
          through our ``--load-result`` path and vice versa
          (`evaluation.py:85-95,126-142`);
* train:  N MoCo steps from identical weights and identical batches — the
          reference's Model+MoCoHead+Adam loop vs our jitted train step —
          must produce matching per-step loss dicts
          (`lib/engine/trainer.py:72-121`, `moco_head/head.py:111-176`).

The fake ``RN50.pt`` jit archive additionally exercises the reference's
``torch.jit.load`` + ``state_filter`` pos-embed resize path *and* our
``load_clip_visual`` converter against one artifact.
"""

import copy
import logging
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # runs the upstream torch code end-to-end, ~10 min total

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from textreid_tpu.config import get_default_cfg  # noqa: E402
from textreid_tpu.data import make_data_loader, make_synthetic_dataset  # noqa: E402
from textreid_tpu.engine import create_train_state, inference, make_train_step  # noqa: E402
from textreid_tpu.models import build_model  # noqa: E402
from textreid_tpu.solver import make_optimizer  # noqa: E402
from textreid_tpu.solver.build import make_lr_schedule, set_learning_rate  # noqa: E402
from textreid_tpu.utils.vocab import frozen_table_initializer  # noqa: E402
from textreid_tpu.utils.weight_convert import (  # noqa: E402
    convert_textreid_checkpoint,
    merge_pretrained,
)

from oracle_utils import (  # noqa: E402
    build_reference_model,
    install_reference_shims,
    make_fake_clip_rn50,
    reference_caption_batch,
)

N_IDS = 16
IMGS_PER_ID = 2
FEAT = 256
K = 8
BATCH = 8
VOCAB_ROWS = 600  # frozen-table rows; token ids < VOCAB_ROWS
VOCAB_WIDTH = 512  # table width == GRU.VOCABULARY_SIZE == EMBEDDING_SIZE


def oracle_cfg(root: str):
    """Flagship MoCo CLIP-RN50 config shrunk to CPU-testable shapes, shared
    verbatim by both sides (our ConfigNode IS the yacs shim)."""
    cfg = get_default_cfg()
    cfg.ROOT = root
    cfg.DATASETS.TRAIN = ("cuhkpedes_train",)
    cfg.DATASETS.TEST = ("cuhkpedes_test",)
    cfg.DATASETS.USE_ONEHOT = True
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.DATALOADER.EN_SAMPLER = False
    cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH = 64, 32
    cfg.INPUT.PIXEL_MEAN = [0.48145466, 0.4578275, 0.40821073]
    cfg.INPUT.PIXEL_STD = [0.26862954, 0.26130258, 0.27577711]
    cfg.INPUT.MAX_TEXT_LENGTH = 105
    cfg.MODEL.VISUAL_MODEL = "m_resnet50"
    cfg.MODEL.TEXTUAL_MODEL = "bigru"
    cfg.MODEL.NUM_CLASSES = N_IDS
    cfg.MODEL.GRU.ONEHOT = "clip_vit"
    cfg.MODEL.GRU.VOCABULARY_SIZE = VOCAB_WIDTH
    cfg.MODEL.GRU.EMBEDDING_SIZE = VOCAB_WIDTH
    cfg.MODEL.GRU.NUM_UNITS = 512
    cfg.MODEL.RESNET.RES5_STRIDE = 1
    cfg.MODEL.EMBEDDING.EMBED_HEAD = "moco"
    cfg.MODEL.EMBEDDING.FEATURE_SIZE = FEAT
    cfg.MODEL.EMBEDDING.EPSILON = 0.1
    cfg.MODEL.MOCO.FC = False
    cfg.MODEL.MOCO.K = K
    cfg.SOLVER.IMS_PER_BATCH = BATCH
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.WARMUP_EPOCHS = 5
    cfg.SOLVER.WARMUP_FACTOR = 0.1
    cfg.TEST.IMS_PER_BATCH = BATCH
    cfg.TPU.DEVICE_PREP = False  # host float pipeline, bit-compatible
    cfg.TPU.GRU_PALLAS = False
    return cfg


@pytest.fixture(scope="module")
def oracle_env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("oracle_root"))
    data_dir = os.path.join(root, "datasets", "cuhkpedes")
    make_synthetic_dataset(
        data_dir, num_identities=N_IDS, images_per_id=IMGS_PER_ID,
        image_size=(64, 32), vocab_size=VOCAB_ROWS, max_tokens=12,
        seed=7, split="test",
    )
    table = (np.random.RandomState(3).randn(VOCAB_ROWS, VOCAB_WIDTH) * 0.05
             ).astype(np.float32)
    np.save(os.path.join(data_dir, "clip_vocab_vit.npy"), table)
    make_fake_clip_rn50(os.path.join(root, "pretrained", "clip", "RN50.pt"))

    cfg = oracle_cfg(root)
    ref_model = build_reference_model(cfg)  # seeds torch, loads fake RN50.pt
    return {"root": root, "cfg": cfg, "ref_model": ref_model}


def our_state_from_reference(cfg, ref_model):
    """Convert the live reference model's weights into our TrainState."""
    sd = {k: v.detach().cpu().numpy() for k, v in ref_model.state_dict().items()}
    converted = convert_textreid_checkpoint(sd, cfg)

    model = build_model(cfg, frozen_table_initializer(cfg))
    sample = {
        "pixels": np.zeros((BATCH, cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH, 3),
                           np.float32),
        "token_ids": np.ones((BATCH, cfg.INPUT.MAX_TEXT_LENGTH), np.int32),
        "lengths": np.full((BATCH,), 5, np.int32),
    }
    tx = make_optimizer(cfg, jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.asarray(sample["pixels"]),
        jnp.asarray(sample["token_ids"]), jnp.asarray(sample["lengths"]),
        method="init_all"))()["params"])
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), sample)

    merged = merge_pretrained(
        {"params": state.params, "batch_stats": state.batch_stats},
        {"params": converted["params"],
         "batch_stats": converted["batch_stats"]},
    )
    state = state.replace(params=merged["params"],
                          batch_stats=merged["batch_stats"])
    if "key_params" in converted:  # MoCo head only
        key_merged = merge_pretrained(
            {"params": state.key_params, "batch_stats": state.key_batch_stats},
            {"params": converted["key_params"],
             "batch_stats": converted["key_batch_stats"]},
        )
        state = state.replace(
            key_params=key_merged["params"],
            key_batch_stats=key_merged["batch_stats"],
            v_queue=jnp.asarray(converted["v_queue"]),
            t_queue=jnp.asarray(converted["t_queue"]),
            id_queue=jnp.asarray(converted["id_queue"]),
            queue_ptr=jnp.asarray(converted["queue_ptr"]),
        )
    return model, tx, state


def reference_metric_grid(npz):
    """Recompute the reference's full CMC/mAP grid from its npz via the
    reference's own ``rank`` (evaluation.py:145-173 assembly)."""
    install_reference_shims()
    from lib.data.metrics.evaluation import rank as ref_rank

    sim = torch.tensor(npz["similarity"])
    image_pid = torch.tensor(npz["image_pid"])
    text_pid = torch.tensor(npz["text_pid"])
    rvn = torch.tensor(npz["rvn_mat"])
    rtn = torch.tensor(npz["rtn_mat"])
    topk = torch.tensor([1, 5, 10])
    out = {}
    for name, s, q, g in [
        ("t2i", sim, text_pid, image_pid),
        ("i2t", sim.t(), image_pid, text_pid),
        ("re_t2i", rvn + sim, text_pid, image_pid),
        ("re_i2t", rtn + sim.t(), image_pid, text_pid),
    ]:
        cmc, mean_ap, _ = ref_rank(s, q, g, topk, get_mAP=True)
        out[name] = {"cmc": [float(c) for c in cmc], "mAP": float(mean_ap)}
    return out


class TestEvalParity:
    @pytest.mark.slow_smoke
    def test_full_eval_pipeline_matches_reference(self, oracle_env, tmp_path):
        cfg, ref_model = oracle_env["cfg"], oracle_env["ref_model"]
        install_reference_shims()
        from lib.data.build import make_data_loader as ref_make_data_loader
        from lib.engine.inference import inference as ref_inference

        ref_out = str(tmp_path / "ref_out")
        our_out = str(tmp_path / "our_out")
        os.makedirs(ref_out)
        os.makedirs(our_out)

        # --- reference pipeline (torch, CPU) --------------------------------
        ref_loaders = ref_make_data_loader(cfg, is_train=False)
        ref_top1 = ref_inference(
            ref_model, ref_loaders[0], device="cpu", output_folder=ref_out,
            save_data=True, rerank=True,
        )
        ref_npz = np.load(os.path.join(ref_out, "inference_data.npz"))

        # --- our pipeline (jax), same converted weights ---------------------
        model, _, state = our_state_from_reference(cfg, ref_model)
        our_loader = make_data_loader(cfg, is_train=False)[0]
        top1 = inference(
            model, state, our_loader, output_folder=our_out,
            save_data=True, rerank=True,
        )
        our_npz = np.load(os.path.join(our_out, "inference_data.npz"))

        # Continuous cross-pipeline quantity: the similarity matrix (through
        # two different conv/BN backends the embeddings deviate ~1e-4..1e-3).
        np.testing.assert_allclose(
            our_npz["similarity"], ref_npz["similarity"], atol=2e-3)
        np.testing.assert_array_equal(our_npz["image_pid"], ref_npz["image_pid"])
        np.testing.assert_array_equal(our_npz["text_pid"], ref_npz["text_pid"])

        # The rerank matrices are a DISCONTINUOUS function of similarity
        # (top-5 neighbor sets): backend-level embedding noise can flip a
        # boundary neighbor, so cross-pipeline comparison is only meaningful
        # function-level on SHARED inputs — run the reference's own
        # k_reciprocal (evaluation.py:53-65, the FIXME Python loop) on OUR
        # normalized embeddings and require exact agreement with our
        # one-hot-matmul formulation.
        from lib.data.metrics.evaluation import k_reciprocal as ref_k_reciprocal

        from textreid_tpu.evaluation.metrics import (
            get_unique_indices,
            k_reciprocal as our_k_reciprocal,
        )
        from textreid_tpu.models.losses import l2_normalize

        keep = get_unique_indices(our_npz["image_ids"])
        img_n = np.asarray(l2_normalize(our_npz["v_embed"][keep], axis=-1))
        txt_n = np.asarray(l2_normalize(our_npz["t_embed"], axis=-1))
        want_rvn = ref_k_reciprocal(torch.from_numpy(txt_n),
                                    torch.from_numpy(img_n)).numpy()
        want_rtn = ref_k_reciprocal(torch.from_numpy(img_n),
                                    torch.from_numpy(txt_n)).numpy()
        np.testing.assert_allclose(our_npz["rvn_mat"], want_rvn, atol=1e-5)
        np.testing.assert_allclose(our_npz["rtn_mat"], want_rtn, atol=1e-5)

        # Full metric grid: the reference's rank() on OUR npz vs our
        # evaluation() on the same embeddings — exact (shared inputs).
        our_grid_ref_rank = reference_metric_grid(our_npz)
        from textreid_tpu.evaluation.metrics import evaluation as our_evaluation

        our_grid = our_evaluation(
            our_npz["v_embed"], our_npz["t_embed"], our_npz["pids"],
            our_npz["pids"], our_npz["image_ids"], rerank=True,
        )
        for name in ("t2i", "i2t", "re_t2i", "re_i2t"):
            np.testing.assert_allclose(
                our_grid[name]["cmc"], our_grid_ref_rank[name]["cmc"],
                atol=1e-3, err_msg=name)
            np.testing.assert_allclose(
                our_grid[name]["mAP"], our_grid_ref_rank[name]["mAP"],
                atol=1e-3, err_msg=name)
        # Cross-pipeline headline: allow at most one borderline query flip
        # (1/32 queries = 3.125 CMC points) from backend-level noise.
        np.testing.assert_allclose(float(top1), float(ref_top1), atol=3.2)

    def test_reference_npz_replays_through_our_loader(self, oracle_env,
                                                      tmp_path):
        """Our --load-result path on a torch-produced inference_data.npz."""
        cfg, ref_model = oracle_env["cfg"], oracle_env["ref_model"]
        install_reference_shims()
        from lib.data.build import make_data_loader as ref_make_data_loader
        from lib.engine.inference import inference as ref_inference

        ref_out = str(tmp_path / "ref_out")
        os.makedirs(ref_out)
        ref_loaders = ref_make_data_loader(cfg, is_train=False)
        ref_top1 = ref_inference(
            ref_model, ref_loaders[0], device="cpu", output_folder=ref_out,
            save_data=True, rerank=True,
        )

        model, _, state = our_state_from_reference(cfg, ref_model)
        our_loader = make_data_loader(cfg, is_train=False)[0]
        replay_top1 = inference(
            model, state, our_loader, output_folder=ref_out,  # cache hit
            save_data=False, rerank=True,
        )
        np.testing.assert_allclose(float(replay_top1), float(ref_top1),
                                   atol=1e-4)

    def test_our_npz_replays_through_reference_code(self, oracle_env,
                                                    tmp_path):
        """The torch code's load path on an npz WE produced (dual-format
        cache): reference evaluation.py:85-95 must reproduce its table."""
        cfg, ref_model = oracle_env["cfg"], oracle_env["ref_model"]
        install_reference_shims()
        from lib.data.build import make_data_loader as ref_make_data_loader
        from lib.data.metrics.evaluation import evaluation as ref_evaluation

        our_out = str(tmp_path / "our_out")
        os.makedirs(our_out)
        model, _, state = our_state_from_reference(cfg, ref_model)
        our_loader = make_data_loader(cfg, is_train=False)[0]
        our_top1 = inference(
            model, state, our_loader, output_folder=our_out,
            save_data=True, rerank=True,
        )

        ref_loaders = ref_make_data_loader(cfg, is_train=False)
        ref_replay_top1 = ref_evaluation(
            dataset=ref_loaders[0].dataset, predictions=None,
            output_folder=our_out, topk=[1, 5, 10], save_data=False,
            rerank=True,
        )
        np.testing.assert_allclose(float(ref_replay_top1), float(our_top1),
                                   atol=1e-4)


class TestTrainParity:
    @pytest.mark.slow_smoke
    def test_moco_train_steps_match_reference(self, oracle_env):
        """N full MoCo optimization steps from identical weights and batches:
        per-step loss dicts must match the torch pipeline (trainer.py:72-121,
        moco_head/head.py:111-176, solver/build.py:6-17)."""
        cfg = oracle_env["cfg"]
        install_reference_shims()
        from lib.solver import make_lr_scheduler as ref_make_lr_scheduler
        from lib.solver import make_optimizer as ref_make_optimizer

        ref_model = copy.deepcopy(oracle_env["ref_model"])  # training mutates

        # identical fixed batches on both sides
        rng = np.random.RandomState(11)
        steps = 4
        batches = []
        for _ in range(steps):
            pixels = rng.randn(BATCH, cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH,
                               3).astype(np.float32)
            n_tok = rng.randint(3, 12, size=BATCH)
            token_ids = np.zeros((BATCH, cfg.INPUT.MAX_TEXT_LENGTH), np.int32)
            for i, n in enumerate(n_tok):
                token_ids[i, :n] = rng.randint(1, VOCAB_ROWS, size=n)
            batches.append({
                "pixels": pixels,
                "token_ids": token_ids,
                "lengths": n_tok.astype(np.int32),
                "pids": rng.randint(0, N_IDS, size=BATCH).astype(np.int32),
            })

        # --- torch side: the reference per-iteration body --------------------
        ref_model.train()
        optimizer = ref_make_optimizer(cfg, ref_model)
        ref_make_lr_scheduler(cfg, optimizer)  # sets epoch-0 (warmup) lr
        ref_lr = optimizer.param_groups[0]["lr"]
        ref_losses = []
        for b in batches:
            images = torch.from_numpy(
                np.transpose(b["pixels"], (0, 3, 1, 2))).contiguous()
            captions = reference_caption_batch(
                [row[:n] for row, n in zip(b["token_ids"], b["lengths"])],
                cfg.INPUT.MAX_TEXT_LENGTH,
            )
            for cap, pid in zip(captions, b["pids"]):
                cap.add_field("id", torch.tensor(int(pid)))
            loss_dict = ref_model(images, captions)
            total = sum(loss_dict.values())
            optimizer.zero_grad()
            total.backward()
            optimizer.step()
            ref_losses.append({k: float(v) for k, v in loss_dict.items()})

        # --- our side: jitted functional step --------------------------------
        model, tx, state = our_state_from_reference(
            cfg, oracle_env["ref_model"])
        lr0 = make_lr_schedule(cfg)(0)
        np.testing.assert_allclose(lr0, ref_lr, rtol=1e-12)
        state = state.replace(opt_state=set_learning_rate(state.opt_state, lr0))
        step_fn = jax.jit(make_train_step(model, tx, cfg))
        our_losses = []
        for b in batches:
            state, metrics = step_fn(state, b)
            our_losses.append({
                k: float(metrics[k])
                for k in ("instance_loss", "infonce_loss", "global_align_loss")
            })

        # Step 0 is a pure forward from identical weights — tight.  Later
        # steps compound the ~1e-5 torch-vs-XLA conv/BN backend deviation
        # through Adam updates (the column-normalized instance-loss
        # projection is the most sensitive), so the budget grows per step;
        # a LOGIC divergence (EMA order, queue contents, lr) would blow
        # these bounds immediately (observed drift: step2 rel ~8e-3).
        step_rtol = [1.5e-3, 8e-3, 2.5e-2, 6e-2]
        for i, (ours, refs) in enumerate(zip(our_losses, ref_losses)):
            for k in ("instance_loss", "infonce_loss", "global_align_loss"):
                np.testing.assert_allclose(
                    ours[k], refs[k], rtol=step_rtol[i], atol=1e-3,
                    err_msg=f"step {i} {k}: ours={ours} ref={refs}")
        logging.getLogger("PersonSearch.oracle").info(
            "train parity: ours=%s ref=%s", our_losses, ref_losses)


class TestSimpleHeadParity:
    """The baseline (simple-head) family through the same oracle: full eval
    and train steps against the reference SimpleHead + LossComputation
    (simple_head/head.py:33-47, loss.py:22-45)."""

    @pytest.fixture(scope="class")
    def simple_env(self, oracle_env):
        cfg = oracle_env["cfg"].clone()
        cfg.MODEL.EMBEDDING.EMBED_HEAD = "simple"
        ref_model = build_reference_model(cfg)  # reuses the fake RN50.pt
        return {"cfg": cfg, "ref_model": ref_model}

    def test_eval_pipeline_matches(self, simple_env, tmp_path):
        cfg, ref_model = simple_env["cfg"], simple_env["ref_model"]
        install_reference_shims()
        from lib.data.build import make_data_loader as ref_make_data_loader
        from lib.engine.inference import inference as ref_inference

        ref_out = str(tmp_path / "ref_out")
        os.makedirs(ref_out)
        ref_loaders = ref_make_data_loader(cfg, is_train=False)
        ref_top1 = ref_inference(
            ref_model, ref_loaders[0], device="cpu", output_folder=ref_out,
            save_data=True, rerank=True,
        )
        ref_npz = np.load(os.path.join(ref_out, "inference_data.npz"))

        model, _, state = our_state_from_reference(cfg, ref_model)
        our_loader = make_data_loader(cfg, is_train=False)[0]
        our_out = str(tmp_path / "our_out")
        os.makedirs(our_out)
        top1 = inference(model, state, our_loader, output_folder=our_out,
                         save_data=True, rerank=True)
        our_npz = np.load(os.path.join(our_out, "inference_data.npz"))
        np.testing.assert_allclose(
            our_npz["similarity"], ref_npz["similarity"], atol=2e-3)
        np.testing.assert_allclose(float(top1), float(ref_top1), atol=3.2)

    def test_train_steps_match(self, simple_env):
        cfg = simple_env["cfg"]
        install_reference_shims()
        from lib.solver import make_lr_scheduler as ref_make_lr_scheduler
        from lib.solver import make_optimizer as ref_make_optimizer

        ref_model = copy.deepcopy(simple_env["ref_model"])
        rng = np.random.RandomState(21)
        steps = 3
        batches = []
        for _ in range(steps):
            n_tok = rng.randint(3, 12, size=BATCH)
            token_ids = np.zeros((BATCH, cfg.INPUT.MAX_TEXT_LENGTH), np.int32)
            for i, n in enumerate(n_tok):
                token_ids[i, :n] = rng.randint(1, VOCAB_ROWS, size=n)
            batches.append({
                "pixels": rng.randn(BATCH, cfg.INPUT.HEIGHT,
                                    cfg.INPUT.WIDTH, 3).astype(np.float32),
                "token_ids": token_ids,
                "lengths": n_tok.astype(np.int32),
                "pids": rng.randint(0, N_IDS, size=BATCH).astype(np.int32),
            })

        ref_model.train()
        optimizer = ref_make_optimizer(cfg, ref_model)
        ref_make_lr_scheduler(cfg, optimizer)
        ref_losses = []
        for b in batches:
            images = torch.from_numpy(
                np.transpose(b["pixels"], (0, 3, 1, 2))).contiguous()
            captions = reference_caption_batch(
                [row[:n] for row, n in zip(b["token_ids"], b["lengths"])],
                cfg.INPUT.MAX_TEXT_LENGTH,
            )
            for cap, pid in zip(captions, b["pids"]):
                cap.add_field("id", torch.tensor(int(pid)))
            loss_dict = ref_model(images, captions)
            total = sum(loss_dict.values())
            optimizer.zero_grad()
            total.backward()
            optimizer.step()
            ref_losses.append({k: float(v) for k, v in loss_dict.items()})

        model, tx, state = our_state_from_reference(
            cfg, simple_env["ref_model"])
        lr0 = make_lr_schedule(cfg)(0)
        state = state.replace(opt_state=set_learning_rate(state.opt_state, lr0))
        step_fn = jax.jit(make_train_step(model, tx, cfg))
        step_rtol = [1.5e-3, 8e-3, 2.5e-2]
        for i, b in enumerate(batches):
            state, metrics = step_fn(state, b)
            for k in ("instance_loss", "global_align_loss"):
                np.testing.assert_allclose(
                    float(metrics[k]), ref_losses[i][k],
                    rtol=step_rtol[i], atol=1e-3,
                    err_msg=f"step {i} {k}")
