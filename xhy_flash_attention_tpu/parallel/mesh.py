"""Device-mesh helpers (≙ reference apex parallel_state process-group setup,
tests/modules/test_mha_parallel.py:12-39 — on TPU a named Mesh replaces NCCL
process groups; axes: data / tensor (/ later: context, expert)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              axis_names: Sequence[str] = ("dp", "tp"),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp <= n, (dp, tp, n)
    arr = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names)
