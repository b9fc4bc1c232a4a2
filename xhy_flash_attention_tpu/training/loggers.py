"""Metric loggers (≙ reference W&B loggers + rich config printing,
training/src/callbacks/wandb_callbacks.py, run.py:55-56).

JSONLLogger is the durable default (one JSON object per step, trivially
machine-readable); WandbLogger activates only when wandb is importable and
configured — the reference hard-depends on wandb, here it's optional.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Any, Dict, Optional

__all__ = ["JSONLLogger", "WandbLogger", "MultiLogger"]


class JSONLLogger:
    def __init__(self, path: str | os.PathLike):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        rec = {"ts": time.time(), **({"step": step} if step is not None
                                     else {}), **metrics}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class WandbLogger:
    def __init__(self, project: str, config: Optional[dict] = None, **kw):
        import wandb  # optional dependency

        self.run = wandb.init(project=project, config=config, **kw)

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        self.run.log(metrics, step=step)

    def close(self):
        self.run.finish()


class MultiLogger:
    def __init__(self, *loggers):
        self.loggers = [lg for lg in loggers if lg is not None]

    def log(self, metrics, step=None):
        for lg in self.loggers:
            lg.log(metrics, step=step)

    def close(self):
        for lg in self.loggers:
            lg.close()
