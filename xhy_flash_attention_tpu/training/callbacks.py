"""Monitors & metrics for the train loop.

≙ reference training/src/callbacks/speed_monitor.py (inter/intra-step ms,
tokens/s), flop_count.py (FLOPs → MFU), norm-monitor, and
training/src/metrics/{perplexity,num_tokens}.py (NumTokens survives
restarts by living in the checkpointed state).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SpeedMonitor", "gpt_flops_per_token", "Perplexity", "NumTokens",
           "grad_norm"]


class SpeedMonitor:
    """Rolling tokens/s, step time, and MFU (analytic FLOPs / peak)."""

    def __init__(self, tokens_per_step: int, flops_per_token: float = 0.0,
                 peak_flops: Optional[float] = None, window: int = 20):
        self.tokens_per_step = tokens_per_step
        self.flops_per_token = flops_per_token
        self.peak_flops = peak_flops or _chip_peak_flops()
        self.window = window
        self._times = []
        self._last = None

    def step(self) -> Dict[str, float]:
        now = time.perf_counter()
        out = {}
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            self._times = self._times[-self.window:]
            mean_dt = float(np.mean(self._times))
            out["step_ms"] = mean_dt * 1e3
            out["tokens_per_s"] = self.tokens_per_step / mean_dt
            if self.flops_per_token:
                flops_s = self.flops_per_token * out["tokens_per_s"]
                out["tflops_per_s"] = flops_s / 1e12
                out["mfu"] = flops_s / self.peak_flops
        self._last = now
        return out


def _chip_peak_flops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in {"v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12,
                      "v4": 275e12, "v6": 918e12}.items():
        if key in kind:
            return peak
    return 197e12


def gpt_flops_per_token(num_layers: int, hidden: int, seqlen: int,
                        vocab: int, intermediate: Optional[int] = None,
                        causal: bool = True) -> float:
    """Model FLOPs per token, fwd+bwd (≙ training/src/utils/flops.py and the
    attention accounting of benchmarks/benchmark_flash_attention.py:27-33:
    fwd = 4·s·h·d per token pair, ÷2 causal; bwd = 2× fwd matmul FLOPs)."""
    inner = intermediate or 4 * hidden
    # per-token fwd matmul FLOPs
    qkvo = 2 * 4 * hidden * hidden
    mlp = 2 * 2 * hidden * inner
    attn = 2 * 2 * seqlen * hidden * (0.5 if causal else 1.0)
    head = 2 * hidden * vocab / 1.0
    per_layer = qkvo + mlp + attn
    fwd = num_layers * per_layer + head
    return 3.0 * fwd  # fwd + bwd(2x)


@dataclasses.dataclass
class Perplexity:
    """Streaming perplexity over summed token NLL (≙ metrics/perplexity.py)."""

    total_nll: float = 0.0
    total_tokens: int = 0

    def update(self, loss_sum: float, num_tokens: int):
        self.total_nll += float(loss_sum)
        self.total_tokens += int(num_tokens)

    def compute(self) -> float:
        if self.total_tokens == 0:
            return float("inf")
        return float(np.exp(self.total_nll / self.total_tokens))


@dataclasses.dataclass
class NumTokens:
    """Monotonic token counter that survives restarts via state_dict
    (≙ metrics/num_tokens.py)."""

    count: int = 0

    def update(self, n: int):
        self.count += int(n)

    def state_dict(self):
        return {"count": self.count}

    def load_state_dict(self, s):
        self.count = int(s["count"])


class EMA:
    """Exponential moving average of params (≙ callbacks/ema.py).

    Functional: `update` is jittable; `state` holds the averaged pytree.
    """

    def __init__(self, params, decay: float = 0.9999):
        self.decay = float(decay)
        self.state = jax.tree.map(
            lambda p: p.astype(jnp.float32) if hasattr(p, "astype") else p,
            params,
        )

    def update(self, params):
        d = self.decay
        self.state = jax.tree.map(
            lambda e, p: e * d + p.astype(jnp.float32) * (1.0 - d),
            self.state, params,
        )
        return self.state

    def state_dict(self):
        return {"decay": self.decay, "state": jax.device_get(self.state)}

    def load_state_dict(self, s):
        self.decay = s["decay"]
        self.state = jax.tree.map(jnp.asarray, s["state"])


def grad_norm(grads) -> jnp.ndarray:
    """Global L2 norm (≙ norm-monitor callback)."""
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in leaves))
