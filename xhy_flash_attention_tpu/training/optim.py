"""Optimizer construction: param grouping + LR schedules.

≙ reference training/src/optim/param_grouping.py (no-weight-decay lists for
biases/norms/embeddings) and timm_lr_scheduler.py (cosine/linear warmup
adapters). optax is the TPU-native substrate; ZeRO-1 sharding of optimizer
state (≙ ddp_zero1.py) falls out of jax.sharding in train.py — optax states
are pytrees that shard like their parameters.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import optax

from .config import OptimizerConfig, SchedulerConfig

__all__ = ["make_optimizer", "make_schedule", "decay_mask"]


def decay_mask(params, stacked_dims: int = 0) -> Any:
    """True where weight decay applies: 2D+ kernels / embeddings; biases
    and norm scales are excluded (≙ param_grouping.py no-decay lists).

    stacked_dims: leading axes that are stacking, not parameter shape —
    pipeline-parallel stage params carry a (pp, layers_per_stage, ...)
    prefix; the decay decision must see the per-layer rank."""
    import jax

    def is_decay(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        nd = jnp.ndim(leaf) - stacked_dims
        if name in ("bias",):
            return False
        if name in ("weight", "scale") and nd <= 1:
            return False  # norm params
        return nd >= 2

    return jax.tree_util.tree_map_with_path(is_decay, params)


def make_schedule(cfg: SchedulerConfig) -> optax.Schedule:
    if cfg.name == "constant":
        return lambda step: 1.0
    warmup = optax.linear_schedule(0.0, 1.0, max(cfg.warmup_steps, 1))
    rest_steps = max(cfg.total_steps - cfg.warmup_steps, 1)
    if cfg.name == "cosine_warmup":
        rest = optax.cosine_decay_schedule(
            1.0, rest_steps, alpha=cfg.min_lr_ratio
        )
    elif cfg.name == "linear_warmup":
        rest = optax.linear_schedule(1.0, cfg.min_lr_ratio, rest_steps)
    else:
        raise ValueError(cfg.name)
    return optax.join_schedules([warmup, rest], [cfg.warmup_steps])


def make_optimizer(opt_cfg: OptimizerConfig, sched_cfg: SchedulerConfig,
                   params=None, mask=None) -> optax.GradientTransformation:
    sched = make_schedule(sched_cfg)
    lr = lambda step: opt_cfg.lr * sched(step)
    chain = []
    if opt_cfg.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(opt_cfg.grad_clip))
    if opt_cfg.name == "adamw":
        chain.append(optax.adamw(
            lr, b1=opt_cfg.betas[0], b2=opt_cfg.betas[1], eps=opt_cfg.eps,
            weight_decay=opt_cfg.weight_decay,
            mask=(mask or decay_mask) if opt_cfg.weight_decay > 0 else None,
        ))
    elif opt_cfg.name == "sgd":
        chain.append(optax.sgd(lr, momentum=0.9))
    else:
        raise ValueError(opt_cfg.name)
    return optax.chain(*chain)
