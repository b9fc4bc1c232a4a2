"""Training harness tests: native loader parity, exact resume, loss goes
down, checkpoint round-trip, mesh training (≙ reference training/tests +
the fault-tolerant sampler and ZeRO state save/load behaviors)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xhy_flash_attention_tpu.training.config import (
    DataConfig,
    OptimizerConfig,
    SchedulerConfig,
    TrainConfig,
)
from xhy_flash_attention_tpu.training.data import LMDataModule, TokenDataset
from xhy_flash_attention_tpu.training.train import Trainer


@pytest.fixture(scope="module")
def token_file():
    # deterministic pattern => the LM can actually learn it (loss drops)
    toks = (np.arange(200_000) % 251).astype(np.uint16)
    f = tempfile.NamedTemporaryFile(suffix=".bin", delete=False)
    toks.tofile(f)
    f.close()
    yield f.name
    os.unlink(f.name)


def test_native_loader_matches_python(token_file):
    ds_p = TokenDataset(token_file, seqlen=127, seed=3, use_native=False)
    try:
        ds_n = TokenDataset(token_file, seqlen=127, seed=3, use_native=True)
    except RuntimeError:
        pytest.skip("g++ unavailable")
    a = ds_n.fetch(17, 32, threads=4)
    b = ds_p.fetch(17, 32)
    np.testing.assert_array_equal(a, b)
    # epoch 2 reshuffles but stays native/python-consistent
    n = ds_p.num_sequences
    np.testing.assert_array_equal(ds_n.fetch(2 * n + 5, 16),
                                  ds_p.fetch(2 * n + 5, 16))
    # one epoch is a permutation of [0, n)
    from xhy_flash_attention_tpu.training.data import _feistel_perm_np
    outs = {_feistel_perm_np(i, n, 3) for i in range(n)}
    assert outs == set(range(n))


def test_datamodule_exact_resume(token_file):
    dm = LMDataModule(token_file, 127, 4, seed=7)
    it = iter(dm)
    batches = [next(it) for _ in range(5)]
    state = {"step": 3, "seed": 7}
    dm2 = LMDataModule(token_file, 127, 4, seed=7)
    dm2.load_state_dict(state)
    x, y = next(iter(dm2))
    np.testing.assert_array_equal(x, batches[3][0])
    np.testing.assert_array_equal(y, batches[3][1])


def _tiny_cfg(token_file, tmpdir, **kw):
    return TrainConfig(
        model=dict(
            vocab_size=256, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=128,
        ),
        optimizer=OptimizerConfig(lr=1e-3, weight_decay=0.01, grad_clip=1.0),
        scheduler=SchedulerConfig(warmup_steps=2, total_steps=40),
        data=DataConfig(path=token_file, seqlen=127, batch_size=4),
        max_steps=kw.pop("max_steps", 20),
        log_every=100,
        ckpt_every=kw.pop("ckpt_every", 0),
        ckpt_dir=str(tmpdir),
        dtype="float32",
        **kw,
    )


def test_train_loss_decreases(token_file, tmp_path):
    t = Trainer(_tiny_cfg(token_file, tmp_path))
    t.init_params()
    losses = []
    t.fit(max_steps=1, log=lambda *_: None)
    first = float(t.ppl.total_nll / max(t.ppl.total_tokens, 1))
    t.fit(max_steps=20, log=lambda *_: None)
    # loss after 20 steps well below the ~log(256) start
    last = float(t.ppl.total_nll / t.ppl.total_tokens)
    assert t.step == 20
    assert last < np.log(256), (first, last)


def test_checkpoint_resume_bitwise(token_file, tmp_path):
    cfg = _tiny_cfg(token_file, tmp_path, ckpt_every=5, max_steps=10)
    t1 = Trainer(cfg)
    t1.fit(log=lambda *_: None)
    ref_params = jax.device_get(t1.params)

    # fresh trainer resumes from step-5 checkpoint and must land bitwise
    # on the same params at step 10 (exact data order via the step cursor)
    t2 = Trainer(_tiny_cfg(token_file, tmp_path, ckpt_every=0, max_steps=10))
    assert t2.maybe_resume()
    assert t2.step == 10  # last.ckpt is step 10
    t3 = Trainer(_tiny_cfg(token_file, tmp_path, ckpt_every=0, max_steps=10))
    t3.load_checkpoint(os.path.join(str(tmp_path), "step_5.ckpt"))
    assert t3.step == 5
    t3.fit(log=lambda *_: None)
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(jax.device_get(t3.params))):
        np.testing.assert_array_equal(a, b)


def test_train_mesh_dp_tp(token_file, tmp_path):
    cfg = _tiny_cfg(token_file, tmp_path, max_steps=3)
    # SP shards the sequence over tp: seqlen must divide evenly
    cfg.data = DataConfig(path=token_file, seqlen=128, batch_size=4)
    cfg = TrainConfig(**{**cfg.__dict__, "mesh": (2, 4),
                         "sequence_parallel": True})
    t = Trainer(cfg)
    t.init_params()
    loss = t.fit(max_steps=3, log=lambda *_: None)
    assert np.isfinite(loss)
    # ZeRO-1: Adam moments must be sharded over the dp axis (unlike the
    # dp-replicated params) — ≙ reference ddp_zero1.py per-rank shards
    import jax

    def dp_sharded(x):
        return any(
            "dp" in (e if isinstance(e, tuple) else (e,))
            for e in x.sharding.spec if e is not None
        )

    def find_mu(node):
        if hasattr(node, "mu"):
            return node.mu
        if isinstance(node, (tuple, list)):
            for c in node:
                r = find_mu(c)
                if r is not None:
                    return r
        return None

    moments = find_mu(t.opt_state)
    assert moments is not None
    n_leaves = 0
    n_dp = 0
    for leaf in jax.tree.leaves(moments):
        n_leaves += 1
        n_dp += bool(dp_sharded(leaf))
    assert n_dp > 0 and n_dp >= n_leaves // 2, (n_dp, n_leaves)
    for leaf in jax.tree.leaves(t.params):
        assert not dp_sharded(leaf)


def test_train_mesh_zero2_matches_zero1(token_file, tmp_path):
    """ZeRO-2 (reduce-scattered grads) must train to the same params as
    ZeRO-1 (all-reduced grads) — the sharding changes dataflow, not math —
    and the grads it feeds the optimizer must actually be dp-sharded
    (≙ reference ddp_zero2.py grad sharding)."""

    def run(stage):
        cfg = _tiny_cfg(token_file, str(tmp_path / f"z{stage}"), max_steps=3)
        cfg.data = DataConfig(path=token_file, seqlen=128, batch_size=4)
        cfg = TrainConfig(**{**cfg.__dict__, "mesh": (2, 4),
                             "sequence_parallel": True,
                             "zero_stage": stage})
        t = Trainer(cfg)
        t.init_params()
        loss = t.fit(max_steps=3, log=lambda *_: None)
        assert np.isfinite(loss)
        return t

    t1 = run(1)
    t2 = run(2)
    for a, b in zip(jax.tree.leaves(jax.device_get(t1.params)),
                    jax.tree.leaves(jax.device_get(t2.params))):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=1e-5, rtol=1e-5)


def test_load_config_interpolation(tmp_path):
    from xhy_flash_attention_tpu.training.config import load_config

    base = tmp_path / "base.yaml"
    base.write_text("optimizer:\n  lr: 1.0e-3\nmax_steps: 50\n")
    cfg_file = tmp_path / "exp.yaml"
    cfg_file.write_text(
        "defaults:\n  - base\n"
        "data:\n  path: x.bin\n  seqlen: 256\n  batch_size: 8\n"
        "scheduler:\n  total_steps: ${max_steps}\n"
        "  warmup_steps: ${div_up:${max_steps}, 10}\n"
        "model:\n  hidden_size: 64\n"
        "  max_position_embeddings: ${data.seqlen}\n"
    )
    cfg = load_config(cfg_file, {"max_steps": 100})
    assert cfg.max_steps == 100
    assert cfg.scheduler.total_steps == 100
    assert cfg.scheduler.warmup_steps == 10
    assert cfg.model["max_position_embeddings"] == 256
    assert cfg.optimizer.lr == 1e-3


def test_evaluate_and_loggers(token_file, tmp_path):
    from xhy_flash_attention_tpu.training.loggers import JSONLLogger

    t = Trainer(_tiny_cfg(token_file, tmp_path, max_steps=5))
    t.init_params()
    t.fit(log=lambda *_: None)
    metrics = t.evaluate(max_batches=3)
    assert np.isfinite(metrics["eval_ppl"]) and metrics["eval_ppl"] > 1

    lg = JSONLLogger(tmp_path / "log.jsonl")
    lg.log({"loss": 1.0}, step=1)
    lg.log(metrics, step=5)
    lg.close()
    import json
    lines = [json.loads(ln) for ln in open(tmp_path / "log.jsonl")]
    assert lines[0]["loss"] == 1.0 and lines[1]["step"] == 5


def test_config_ladder_loads():
    """Every experiment YAML in the ladder (≙ reference
    training/configs/experiment/{owt,pile}) composes, interpolates, and
    builds a valid GPTConfig."""
    from pathlib import Path

    from xhy_flash_attention_tpu.models.gpt import GPTConfig
    from xhy_flash_attention_tpu.training.config import load_config

    root = Path("xhy_flash_attention_tpu/training/configs/experiment")
    files = sorted(root.rglob("*.yaml"))
    assert len(files) >= 11, files
    for f in files:
        cfg = load_config(f)
        mc = GPTConfig(**cfg.model)
        assert mc.hidden_size % mc.num_attention_heads == 0, f
        assert cfg.model["max_position_embeddings"] in (0, cfg.data.seqlen), f
        dp, tp = cfg.mesh
        assert mc.num_attention_heads % tp == 0, f


def test_train_pipeline_matches_single_device(token_file, tmp_path):
    """dp×pp pipeline training lands on the single-device params (fp32
    reorder tolerance): same blocks, same microbatch math, GPipe schedule."""
    cfg0 = _tiny_cfg(token_file, str(tmp_path / "seq"), max_steps=3)
    cfg0.model["num_hidden_layers"] = 4
    t0 = Trainer(cfg0)
    t0.init_params()
    loss0 = t0.fit(max_steps=3, log=lambda *_: None)

    cfgp = _tiny_cfg(token_file, str(tmp_path / "pp"), max_steps=3)
    cfgp.model["num_hidden_layers"] = 4
    cfgp = TrainConfig(**{**cfgp.__dict__, "mesh": (2, 1),
                          "pipeline_parallel": 4,
                          "pipeline_microbatches": 2})
    tp_ = Trainer(cfgp)
    tp_.init_params()
    # same init as the single-device run (init_params uses the same seed)
    lossp = tp_.fit(max_steps=3, log=lambda *_: None)
    assert np.isfinite(lossp)
    assert np.isclose(loss0, lossp, atol=1e-4), (loss0, lossp)

    # stage grads live sharded over pp; canonical view must match
    merged = jax.device_get(tp_._canonical_params())
    ref = jax.device_get(t0.params)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref)[0],
        jax.tree_util.tree_flatten_with_path(merged)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(
            a, b, atol=2e-5, rtol=1e-5,
            err_msg=jax.tree_util.keystr(pa),
        )

    # checkpoints store the canonical tree: resume round-trips
    tp_.save_checkpoint()
    cfgr = _tiny_cfg(token_file, str(tmp_path / "pp"), max_steps=3)
    cfgr.model["num_hidden_layers"] = 4
    cfgr = TrainConfig(**{**cfgr.__dict__, "mesh": (2, 1),
                          "pipeline_parallel": 4,
                          "pipeline_microbatches": 2})
    tr = Trainer(cfgr)
    assert tr.maybe_resume()
    for a, b in zip(jax.tree.leaves(jax.device_get(tr.params)),
                    jax.tree.leaves(merged)):
        np.testing.assert_array_equal(a, b)


# ---- vision task (≙ reference training/src/datamodules/imagenet.py +
# timm_mixup.py + SequenceModel's vision sibling) ---------------------------

def _vit_cfg(tmpdir, **kw):
    return TrainConfig(
        model=dict(
            img_size=16, patch_size=4, num_classes=10, embed_dim=64,
            depth=2, num_heads=4, mlp_ratio=2.0,
        ),
        optimizer=OptimizerConfig(lr=3e-3, weight_decay=0.01, grad_clip=1.0),
        scheduler=SchedulerConfig(warmup_steps=2, total_steps=60),
        data=DataConfig(path="", batch_size=16),
        max_steps=kw.pop("max_steps", 30),
        log_every=100,
        ckpt_every=kw.pop("ckpt_every", 0),
        ckpt_dir=str(tmpdir),
        dtype="float32",
        **kw,
    )


def test_vit_train_loss_decreases(tmp_path):
    from xhy_flash_attention_tpu.training.vision import ViTTrainer

    t = ViTTrainer(_vit_cfg(tmp_path, max_steps=60))
    t.init_params()
    t.fit(max_steps=2, log=lambda *_: None)
    first = t.avg_loss.total_nll / max(t.avg_loss.total_tokens, 1)
    t.fit(max_steps=60, log=lambda *_: None)
    last_avg = t.avg_loss.total_nll / t.avg_loss.total_tokens
    assert t.step == 60
    # synthetic classes are learnable: the running mean falls (mixup keeps
    # per-step loss noisy and floors it above plain CE, so the eval acc —
    # measured without mixup — is the sharp check: 0.55+ at 60 steps,
    # asserted with margin vs the 0.1 chance level)
    assert last_avg < first, (first, last_avg)
    metrics = t.evaluate(n_batches=4)
    assert metrics["eval_acc"] > 0.3, metrics


def test_vit_checkpoint_resume_bitwise(tmp_path):
    from xhy_flash_attention_tpu.training.vision import ViTTrainer

    cfg = _vit_cfg(tmp_path, ckpt_every=4, max_steps=8)
    t1 = ViTTrainer(cfg)
    t1.fit(log=lambda *_: None)
    ref = jax.device_get(t1.params)

    t2 = ViTTrainer(_vit_cfg(tmp_path, ckpt_every=0, max_steps=8))
    t2.load_checkpoint(os.path.join(str(tmp_path), "step_4.ckpt"))
    assert t2.step == 4 and t2.data.step == 4
    t2.fit(log=lambda *_: None)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        ref, jax.device_get(t2.params),
    )


def test_image_datamodule_exact_resume():
    from xhy_flash_attention_tpu.training.vision import ImageDataModule

    dm = ImageDataModule("", 8, img_size=16, seed=5)
    it = iter(dm)
    batches = [next(it) for _ in range(4)]
    dm2 = ImageDataModule("", 8, img_size=16, seed=5)
    dm2.load_state_dict({"step": 2, "seed": 5})
    x, y = next(iter(dm2))
    np.testing.assert_array_equal(x, batches[2][0])
    np.testing.assert_array_equal(y, batches[2][1])


def test_mixup_cutmix_targets_sum_to_one():
    from xhy_flash_attention_tpu.training.vision import mixup_cutmix

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 10, 8)
    for _ in range(8):  # hits both the mixup and cutmix branches
        mixed, tgt = mixup_cutmix(rng, imgs, labels, 10)
        assert mixed.shape == imgs.shape and tgt.shape == (8, 10)
        np.testing.assert_allclose(tgt.sum(-1), 1.0, rtol=1e-5)
        assert (tgt >= 0).all()


def test_image_datamodule_from_npy(tmp_path):
    """File-backed path: memmapped images.npy/labels.npy (≙ the reference's
    preprocessed-ImageFolder cache)."""
    from xhy_flash_attention_tpu.training.vision import ImageDataModule

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (64, 16, 16, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, 64).astype(np.int64)
    np.save(tmp_path / "images.npy", imgs)
    np.save(tmp_path / "labels.npy", labels)
    dm = ImageDataModule(str(tmp_path), 8, num_classes=10, seed=0)
    assert dm.img_size == 16 and dm.num_samples == 64
    x, y = next(iter(dm))
    assert x.shape == (8, 16, 16, 3) and y.shape == (8, 10)


def test_vit_config_task_dispatch(tmp_path):
    """train() routes task: image configs to ViTTrainer (≙ the reference's
    Hydra task-group selection)."""
    from xhy_flash_attention_tpu.training.train import train
    from xhy_flash_attention_tpu.training.vision import ViTTrainer

    t = train(
        "xhy_flash_attention_tpu/training/configs/vit-synthetic.yaml",
        **{"max_steps": 2, "ckpt_every": 0, "ckpt_dir": str(tmp_path),
           "model.img_size": 16, "model.depth": 1, "model.embed_dim": 64,
           "data.batch_size": 8},
    )
    assert isinstance(t, ViTTrainer) and t.step == 2
