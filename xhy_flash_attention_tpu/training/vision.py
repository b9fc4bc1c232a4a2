"""Image-classification datamodule with mixup/cutmix (≙ reference
training/src/datamodules/imagenet.py + timm_mixup.py).

The reference serves ImageFolder batches through torch DataLoader workers
with RandomResizedCrop/flip transforms and a timm ``Mixup`` collate that
mixes images and produces smoothed soft targets. Here the cache format is
an imagenet-style preprocessed pair ``images.npy`` (N, H, W, C) uint8 +
``labels.npy`` (N,) — memmapped, so epochs never load the dataset — and
the augmentation pipeline (pad-crop, horizontal flip, batch mixup OR
cutmix with label smoothing) runs host-side in numpy exactly like the
reference's collate_fn. ``path=""`` generates a deterministic synthetic
dataset so the harness tests stay hermetic (≙ the reference's datamodule
test fixtures).

Exact resume matches the LM datamodule contract: batch i is a pure
function of (seed, i) — both the sample permutation and every stochastic
augmentation draw come from a per-step counter RNG — so restoring the
integer ``step`` reproduces the stream bitwise.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["ImageDataModule", "ViTTrainer", "mixup_cutmix",
           "soft_target_cross_entropy"]


def mixup_cutmix(
    rng: np.random.Generator,
    images: np.ndarray,
    labels: np.ndarray,
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    switch_prob: float = 0.5,
    label_smoothing: float = 0.1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batch-mode mixup/cutmix (≙ timm Mixup._mix_batch wrapped by the
    reference's TimmMixup): one lambda per batch, partner = flipped batch,
    targets = lam-weighted smoothed one-hots.

    images: (b, h, w, c) float32; labels: (b,) int. Returns (mixed images,
    soft targets (b, num_classes) float32).
    """
    b, h, w, _ = images.shape
    off = label_smoothing / num_classes
    on = 1.0 - label_smoothing + off
    y = np.full((b, num_classes), off, np.float32)
    y[np.arange(b), labels] = on
    y_flip = y[::-1].copy()

    use_cutmix = (cutmix_alpha > 0.0 and
                  (mixup_alpha <= 0.0 or rng.random() < switch_prob))
    if use_cutmix:
        lam = float(rng.beta(cutmix_alpha, cutmix_alpha))
        # rectangular patch with area ratio (1 - lam), clipped to the image
        ratio = np.sqrt(1.0 - lam)
        cut_h, cut_w = int(h * ratio), int(w * ratio)
        cy = int(rng.integers(0, h + 1 - cut_h)) if cut_h < h else 0
        cx = int(rng.integers(0, w + 1 - cut_w)) if cut_w < w else 0
        mixed = images.copy()
        mixed[:, cy:cy + cut_h, cx:cx + cut_w] = \
            images[::-1, cy:cy + cut_h, cx:cx + cut_w]
        # corrected lambda from the actual clipped patch area (timm's
        # correct_lam behavior)
        lam = 1.0 - cut_h * cut_w / float(h * w)
    elif mixup_alpha > 0.0:
        lam = float(rng.beta(mixup_alpha, mixup_alpha))
        mixed = lam * images + (1.0 - lam) * images[::-1]
    else:
        return images, y
    targets = lam * y + (1.0 - lam) * y_flip
    return mixed.astype(np.float32), targets.astype(np.float32)


def soft_target_cross_entropy(logits, soft_targets):
    """Mean cross-entropy against soft targets (≙ timm
    SoftTargetCrossEntropy, the loss the reference pairs with Mixup)."""
    import jax
    import jax.numpy as jnp

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -(soft_targets * logp).sum(axis=-1).mean()


@dataclasses.dataclass
class ImageDataModule:
    """Batched (images, soft_targets) iterator with exact-resume state.

    path: directory holding ``images.npy`` (N, H, W, C) uint8 and
    ``labels.npy`` (N,) int — or "" for a deterministic synthetic set
    (class-dependent gaussian blobs, learnable by a tiny ViT).
    """

    path: str
    batch_size: int
    img_size: int = 32
    num_classes: int = 10
    seed: int = 0
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    label_smoothing: float = 0.1
    crop_pad: int = 4            # pad-and-crop augmentation margin
    synthetic_size: int = 512    # N for the synthetic dataset
    step: int = 0                # resumable cursor: batches served so far

    def __post_init__(self):
        if self.path:
            root = Path(self.path)
            self.images = np.load(root / "images.npy", mmap_mode="r")
            self.labels = np.load(root / "labels.npy", mmap_mode="r")
            self.img_size = int(self.images.shape[1])
        else:
            rng = np.random.default_rng(self.seed + 7)
            n, s = self.synthetic_size, self.img_size
            self.labels = rng.integers(0, self.num_classes, n)
            # class-keyed low-frequency patterns + noise: linearly
            # separable enough that a few ViT steps visibly reduce loss
            yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
            feats = np.stack([
                np.sin(2 * np.pi * ((k % 4 + 1) * xx + (k // 4) * yy))
                for k in range(self.num_classes)
            ])
            base = feats[self.labels][..., None]          # (n, s, s, 1)
            noise = rng.standard_normal((n, s, s, 3)).astype(np.float32)
            self.images = np.clip(
                (base * 0.5 + 0.5) * 160 + noise * 24, 0, 255
            ).astype(np.uint8)
        assert len(self.images) == len(self.labels)
        self.num_samples = len(self.images)

    # -- exact-resume contract (same as LMDataModule) ---------------------
    def state_dict(self) -> dict:
        return {"step": self.step, "seed": self.seed}

    def load_state_dict(self, state: dict):
        self.step = int(state["step"])
        assert int(state["seed"]) == self.seed, "seed mismatch on resume"

    # ----------------------------------------------------------------------
    def _fetch(self, step: int) -> Tuple[np.ndarray, np.ndarray]:
        """Batch for `step`: pure function of (seed, step)."""
        rng = np.random.default_rng((self.seed, step))
        idx = rng.integers(0, self.num_samples, self.batch_size)
        imgs = np.asarray(self.images[idx], np.float32) / 255.0
        labels = np.asarray(self.labels[idx], np.int64)
        # pad-crop + horizontal flip (≙ reference train_transform)
        p, s = self.crop_pad, self.img_size
        if p > 0:
            padded = np.pad(imgs, ((0, 0), (p, p), (p, p), (0, 0)),
                            mode="reflect")
            oy, ox = rng.integers(0, 2 * p + 1, 2)
            imgs = padded[:, oy:oy + s, ox:ox + s]
        flip = rng.random(self.batch_size) < 0.5
        imgs[flip] = imgs[flip, :, ::-1]
        imgs = (imgs - 0.45) / 0.25  # imagenet-style normalization
        return mixup_cutmix(
            rng, imgs, labels, self.num_classes,
            self.mixup_alpha, self.cutmix_alpha,
            label_smoothing=self.label_smoothing,
        )

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            batch = self._fetch(self.step)
            self.step += 1
            yield batch

    def eval_batches(self, n_batches: int, seed_offset: int = 10_000_000):
        """Deterministic held-out batches (no mixup) for evaluation."""
        for i in range(n_batches):
            rng = np.random.default_rng((self.seed, seed_offset + i))
            idx = rng.integers(0, self.num_samples, self.batch_size)
            imgs = np.asarray(self.images[idx], np.float32) / 255.0
            imgs = (imgs - 0.45) / 0.25
            yield imgs, np.asarray(self.labels[idx], np.int64)


class ViTTrainer:
    """Image-classification training task (≙ reference
    training/src/tasks/seq.py SequenceModel driving a timm/flash ViT with
    the imagenet datamodule + TimmMixup + SoftTargetCrossEntropy).

    Shares the LM Trainer's conventions: TrainConfig (``model`` holds
    ViTConfig fields), optimizer/scheduler from training/optim.py, atomic
    checkpoints with a ``last.ckpt`` symlink, exact data resume through the
    datamodule's integer step cursor, and an optional pure-dp mesh (grads
    pmean inside shard_map — the reference's DDP strategy).
    """

    def __init__(self, cfg):
        import jax
        import numpy as np

        from ..models.vit import ViTConfig, VisionTransformer
        from .callbacks import NumTokens, Perplexity
        from .config import model_dtype
        from .optim import make_optimizer

        self.cfg = cfg
        self.dtype = model_dtype(cfg)
        self.model_cfg = ViTConfig(**{**cfg.model, "dtype": self.dtype})
        self.model = VisionTransformer(self.model_cfg)
        self.data = ImageDataModule(
            cfg.data.path, cfg.data.batch_size, seed=cfg.data.seed,
            img_size=self.model_cfg.img_size,
            num_classes=self.model_cfg.num_classes,
        )
        self.opt = make_optimizer(cfg.optimizer, cfg.scheduler)
        self.step = 0
        self.num_samples = NumTokens()  # same accumulator, sample units
        self.avg_loss = Perplexity()    # reused as a running-mean tracker
        self.params = None
        self.opt_state = None
        dp, tp = cfg.mesh
        if tp != 1 or getattr(cfg, "pipeline_parallel", 1) != 1:
            raise ValueError("ViTTrainer supports dp-only meshes")
        self.mesh = None
        if dp > 1:
            from ..parallel import make_mesh

            self.mesh = make_mesh(dp=dp, tp=1)
        self._step_fn = None

    # ---- setup -----------------------------------------------------------
    def init_params(self, rng=None):
        import jax
        import jax.numpy as jnp

        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        s = self.model_cfg.img_size
        px = jnp.zeros((1, self.model_cfg.in_chans, s, s), self.dtype)
        self.params = self.model.init(rng, px)
        self.opt_state = self.opt.init(self.params)

    def _loss_fn(self, params, pixels, soft_targets):
        logits = self.model.apply(params, pixels)
        return soft_target_cross_entropy(logits, soft_targets)

    def _build_step(self):
        import jax
        import optax

        from .callbacks import grad_norm

        if self.mesh is None:
            def step_fn(params, opt_state, pixels, targets):
                loss, grads = jax.value_and_grad(self._loss_fn)(
                    params, pixels, targets
                )
                gnorm = grad_norm(grads)
                updates, opt_state = self.opt.update(
                    grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss, gnorm

            return jax.jit(step_fn, donate_argnums=(0, 1))

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def local_grads(p, pixels, targets):
            loss, grads = jax.value_and_grad(self._loss_fn)(
                p, pixels, targets)
            loss = jax.lax.pmean(loss, "dp")
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, "dp"), grads)
            return loss, grads

        grad_fn = shard_map(
            local_grads, mesh=self.mesh,
            in_specs=(P(), P("dp"), P("dp")), out_specs=(P(), P()),
            check_vma=False,
        )

        def step_fn(params, opt_state, pixels, targets):
            loss, grads = grad_fn(params, pixels, targets)
            gnorm = grad_norm(grads)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, gnorm

        return jax.jit(step_fn, donate_argnums=(0, 1))

    # ---- checkpointing (same on-disk contract as the LM Trainer) ----------
    def save_checkpoint(self, path: Optional[str] = None):
        import pickle

        import jax

        path = path or os.path.join(
            self.cfg.ckpt_dir, f"step_{self.step}.ckpt")
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        payload = {
            "step": self.step,
            "params": jax.device_get(self.params),
            "opt_state": jax.device_get(self.opt_state),
            "data": self.data.state_dict(),
            "num_samples": self.num_samples.state_dict(),
        }
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)
        last = os.path.join(os.path.dirname(path), "last.ckpt")
        try:
            if os.path.islink(last) or os.path.exists(last):
                os.remove(last)
            os.symlink(os.path.basename(path), last)
        except OSError:
            pass
        return path

    def load_checkpoint(self, path: str):
        import pickle

        import jax.numpy as jnp
        import jax

        with open(path, "rb") as f:
            payload = pickle.load(f)
        self.step = payload["step"]
        self.params = jax.tree.map(jnp.asarray, payload["params"])
        self.opt_state = jax.tree.map(jnp.asarray, payload["opt_state"])
        self.data.load_state_dict(payload["data"])
        self.num_samples.load_state_dict(payload["num_samples"])

    def maybe_resume(self) -> bool:
        last = os.path.join(self.cfg.ckpt_dir, "last.ckpt")
        if self.cfg.resume and os.path.exists(last):
            self.load_checkpoint(os.path.realpath(last))
            return True
        return False

    # ---- loop --------------------------------------------------------------
    def fit(self, max_steps: Optional[int] = None, log=print):
        import jax.numpy as jnp

        cfg = self.cfg
        max_steps = max_steps or cfg.max_steps
        if self.params is None and not self.maybe_resume():
            self.init_params()
        if self._step_fn is None:
            self._step_fn = self._build_step()
        it = iter(self.data)
        bsz = cfg.data.batch_size
        loss = float("nan")
        while self.step < max_steps:
            pixels, targets = next(it)
            # model wants (b, c, h, w); the datamodule serves (b, h, w, c)
            px = jnp.asarray(pixels.transpose(0, 3, 1, 2), self.dtype)
            self.params, self.opt_state, loss, gnorm = self._step_fn(
                self.params, self.opt_state, px, jnp.asarray(targets)
            )
            self.step += 1
            self.num_samples.update(bsz)
            loss_f = float(loss)
            self.avg_loss.update(loss_f * bsz, bsz)
            if self.step % cfg.log_every == 0:
                log(f"step {self.step} loss {loss_f:.4f} "
                    f"gnorm {float(gnorm):.3f}")
            if cfg.ckpt_every and self.step % cfg.ckpt_every == 0:
                self.save_checkpoint()
        return float(loss)

    def evaluate(self, n_batches: int = 10) -> dict:
        """Top-1 accuracy + mean CE on deterministic held-out batches
        (no mixup), ≙ the reference's validation epoch."""
        import jax
        import jax.numpy as jnp

        if self.params is None and not self.maybe_resume():
            self.init_params()

        @jax.jit
        def fwd(params, pixels):
            return self.model.apply(params, pixels)

        correct = total = 0
        ce_sum = 0.0
        for imgs, labels in self.data.eval_batches(n_batches):
            px = jnp.asarray(imgs.transpose(0, 3, 1, 2), self.dtype)
            logits = fwd(self.params, px).astype(jnp.float32)
            pred = np.asarray(jnp.argmax(logits, -1))
            correct += int((pred == labels).sum())
            total += len(labels)
            logp = jax.nn.log_softmax(logits, -1)
            ce_sum += float(-jnp.take_along_axis(
                logp, jnp.asarray(labels)[:, None], -1).mean()) * len(labels)
        return {"eval_acc": correct / max(total, 1),
                "eval_ce": ce_sum / max(total, 1)}
