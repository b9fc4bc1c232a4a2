"""Config system for the training harness.

≙ reference Hydra tree (training/configs/ + run.py:11-15 custom resolvers).
Hydra's features used by the reference reduce to: a YAML tree with defaults
composition, `${...}` interpolation, and two resolvers (`eval`, `div_up`).
Plain dataclasses + a small resolver keep the same ergonomics without the
dependency.
"""

from __future__ import annotations

import dataclasses
import math
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

__all__ = ["TrainConfig", "load_config", "resolve"]


@dataclasses.dataclass
class OptimizerConfig:
    name: str = "adamw"
    lr: float = 6e-4
    weight_decay: float = 0.1
    betas: Tuple[float, float] = (0.9, 0.95)
    eps: float = 1e-8
    grad_clip: float = 1.0


@dataclasses.dataclass
class SchedulerConfig:
    name: str = "cosine_warmup"  # cosine_warmup | linear_warmup | constant
    warmup_steps: int = 100
    total_steps: int = 1000
    min_lr_ratio: float = 0.1


@dataclasses.dataclass
class DataConfig:
    path: str = ""
    seqlen: int = 1024
    batch_size: int = 8
    seed: int = 0
    dtype: str = "uint16"


@dataclasses.dataclass
class TrainConfig:
    # task selects the training target (≙ the reference's Hydra task
    # group: src/tasks/seq.py SequenceLMModel vs the vision task):
    # "lm" -> Trainer(GPTLMHeadModel + LMDataModule), "image" ->
    # ViTTrainer(VisionTransformer + ImageDataModule)
    task: str = "lm"
    model: Dict[str, Any] = dataclasses.field(default_factory=dict)
    optimizer: OptimizerConfig = dataclasses.field(
        default_factory=OptimizerConfig)
    scheduler: SchedulerConfig = dataclasses.field(
        default_factory=SchedulerConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    max_steps: int = 1000
    log_every: int = 10
    ckpt_every: int = 500
    ckpt_dir: str = "checkpoints"
    resume: bool = True
    seed: int = 0
    dtype: str = "bfloat16"
    # mesh axes (dp, tp); (1, 1) = single chip
    mesh: Tuple[int, int] = (1, 1)
    sequence_parallel: bool = False
    # optimizer-state partitioning over dp (≙ reference ddp_zero1/ddp_zero2):
    # 1 = dp-sharded Adam moments; 2 = additionally reduce-scatter grads
    # onto the moment shards instead of all-reducing them
    zero_stage: int = 1
    # pipeline parallelism (parallel/pipeline.py GPipe ring): stages over a
    # 'pp' mesh axis orthogonal to dp; composes as (dp, pp), tp must be 1
    pipeline_parallel: int = 1
    # microbatches per step (0 = 4*pp, a <=20% bubble); must divide the
    # per-dp-rank batch
    pipeline_microbatches: int = 0


_RESOLVERS = {
    "eval": lambda expr: eval(expr, {"math": math}),  # noqa: S307 (≙ Hydra eval resolver)
    "div_up": lambda a, b: (int(a) + int(b) - 1) // int(b),
}


def resolve(tree: Any, root: Optional[dict] = None) -> Any:
    """Resolve ${path.to.key} interpolations and ${resolver:args} calls
    (≙ OmegaConf interpolation + run.py custom resolvers)."""
    if root is None:
        root = tree

    def lookup(path: str):
        node = root
        for part in path.split("."):
            node = node[part]
        return node

    inner_re = re.compile(r"\$\{([^${}]+)\}")

    def eval_expr(expr: str):
        if ":" in expr:
            name, arg = expr.split(":", 1)
            return _RESOLVERS[name](*[a.strip() for a in arg.split(",")])
        return resolve(lookup(expr), root)

    def resolve_str(s: str):
        # innermost-first so nested ${...:${...}} compose
        while True:
            m = inner_re.fullmatch(s)
            if m:
                return eval_expr(m.group(1))
            m = inner_re.search(s)
            if not m:
                return s
            s = s[:m.start()] + str(eval_expr(m.group(1))) + s[m.end():]

    if isinstance(tree, dict):
        return {k: resolve(v, root) for k, v in tree.items()}
    if isinstance(tree, list):
        return [resolve(v, root) for v in tree]
    if isinstance(tree, str):
        return resolve_str(tree)
    return tree


def load_config(path: str | Path, overrides: Optional[Dict[str, Any]] = None
                ) -> TrainConfig:
    """Load a YAML config with `defaults:` composition, interpolation, and
    dotted-key overrides (≙ Hydra CLI overrides)."""
    import yaml

    path = Path(path)

    def load_tree(p: Path) -> dict:
        with open(p) as f:
            tree = yaml.safe_load(f) or {}
        base = {}
        for default in tree.pop("defaults", []):
            if isinstance(default, dict):
                (group, name), = default.items()
                sub = load_tree(p.parent / group / f"{name}.yaml")
                base[group] = _merge(base.get(group, {}), sub)
            else:
                base = _merge(base, load_tree(p.parent / f"{default}.yaml"))
        return _merge(base, tree)

    tree = load_tree(path)
    for key, val in (overrides or {}).items():
        node = tree
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = val
    tree = resolve(tree)

    return TrainConfig(
        model=tree.get("model", {}),
        optimizer=OptimizerConfig(**tree.get("optimizer", {})),
        scheduler=SchedulerConfig(**tree.get("scheduler", {})),
        data=DataConfig(**tree.get("data", {})),
        **{k: v for k, v in tree.items()
           if k in {"task", "max_steps", "log_every", "ckpt_every",
                    "ckpt_dir", "resume", "seed", "dtype",
                    "sequence_parallel", "zero_stage", "pipeline_parallel",
                    "pipeline_microbatches"}},
        mesh=tuple(tree.get("mesh", (1, 1))),
    )


def _merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def model_dtype(cfg: TrainConfig):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]
