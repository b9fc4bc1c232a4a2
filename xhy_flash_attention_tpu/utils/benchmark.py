"""Timing helpers (≙ reference flash_attn/utils/benchmark.py — CUDA-event
benchmark_forward/backward/all/fwd_bwd + pytorch_profiler).

On TPU the equivalents are wall-clock around block_until_ready with a
scan-chained variant that cancels fixed dispatch latency (the axon tunnel
adds ~30 ms per dispatch, and even locally one-shot timing underestimates
short kernels), plus jax.profiler traces in place of the torch profiler.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "benchmark_forward",
    "benchmark_backward",
    "benchmark_fwd_bwd",
    "benchmark_chained",
    "pytorch_profiler",
    "profile_trace",
]


def _sync(x):
    jax.block_until_ready(x)
    return x


def benchmark_forward(fn: Callable, *args, repeats: int = 10,
                      desc: str = "", verbose: bool = False, **kw
                      ) -> Tuple[float, float]:
    """Median wall time of fn(*args) under jit. Returns (mean_s, best_s)."""
    f = jax.jit(lambda *a: fn(*a, **kw)) if kw else jax.jit(fn)
    _sync(f(*args))  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(f(*args))
        times.append(time.perf_counter() - t0)
    mean = sum(times) / len(times)
    if verbose:
        print(f"{desc}: {mean * 1e3:.3f} ms (best {min(times) * 1e3:.3f})")
    return mean, min(times)


def benchmark_backward(fn: Callable, *args, repeats: int = 10,
                       desc: str = "", verbose: bool = False, **kw):
    """Times grad of sum(fn(*args)) wrt all array args."""
    idx = tuple(i for i, a in enumerate(args) if isinstance(a, jax.Array))

    def loss(*a):
        return fn(*a, **kw).astype(jnp.float32).sum()

    g = jax.jit(jax.grad(loss, argnums=idx))
    return benchmark_forward(lambda *a: g(*a), *args, repeats=repeats,
                             desc=desc or "backward", verbose=verbose)


def benchmark_fwd_bwd(fn: Callable, *args, repeats: int = 10,
                      desc: str = "", verbose: bool = False, **kw):
    idx = tuple(i for i, a in enumerate(args) if isinstance(a, jax.Array))

    def loss(*a):
        return fn(*a, **kw).astype(jnp.float32).sum()

    vg = jax.jit(jax.value_and_grad(loss, argnums=idx))
    return benchmark_forward(lambda *a: vg(*a), *args, repeats=repeats,
                             desc=desc or "fwd_bwd", verbose=verbose)


def benchmark_chained(step_fn: Callable, init, n: int = 24,
                      repeats: int = 5) -> float:
    """Marginal per-iteration seconds of step_fn chained inside one jit via
    lax.scan, differencing two chain lengths to cancel dispatch overhead
    (the method bench.py uses).

    Robustness: dispatch latency over the axon tunnel is noisy (~ms spikes),
    and min-of-differences is biased fast by one lucky pair. Medians of each
    chain's times are taken independently before differencing.
    """
    import statistics

    def chained(x, length):
        out, _ = jax.lax.scan(lambda c, _: (step_fn(c), None), x, None,
                              length=length)
        return jnp.float32(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])

    n1, n2 = max(1, n // 6), n
    f1 = jax.jit(lambda x: chained(x, n1))
    f2 = jax.jit(lambda x: chained(x, n2))
    float(f1(init))
    float(f2(init))
    t1s, t2s = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(f1(init))
        t1 = time.perf_counter()
        float(f2(init))
        t2 = time.perf_counter()
        t1s.append(t1 - t0)
        t2s.append(t2 - t1)
    return max(
        (statistics.median(t2s) - statistics.median(t1s)) / (n2 - n1),
        1e-9,
    )


def profile_trace(fn: Callable, *args, trace_dir: str = "/tmp/xfa_trace"):
    """Capture a jax profiler trace (view with tensorboard/xprof;
    ≙ pytorch_profiler in the reference)."""
    f = jax.jit(fn)
    _sync(f(*args))
    with jax.profiler.trace(trace_dir):
        _sync(f(*args))
    return trace_dir


# reference-name alias
pytorch_profiler = profile_trace
