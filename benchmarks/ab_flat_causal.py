"""A/B: flat lower-triangle causal iteration vs rectangular grid (fwd.py).

Back-to-back chained timings (same session, medians) per CLAUDE.md; sweeps
the grid structure x tile size at the headline causal shape. FLOPs use the
reference accounting (4*b*s^2*h*d / 2 for causal).

Run: PYTHONPATH=. python benchmarks/ab_flat_causal.py
"""

import statistics

import jax.numpy as jnp
import numpy as np

import xhy_flash_attention_tpu.ops.flash_attention.fwd as F
from xhy_flash_attention_tpu.ops.flash_attention.common import BlockSizes
from xhy_flash_attention_tpu.utils.benchmark import benchmark_chained


def main():
    b, h, s, d = 4, 16, 4096, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    fl = 4 * b * s * s * h * d / 2

    configs = [
        ("rect-1024", False, 1024),
        ("flat-1024", True, 1024),
        ("flat-512", True, 512),
        ("rect-512", False, 512),
    ]
    results = {}
    for name, flat, blk in configs:
        F.FLAT_CAUSAL = flat
        bs = BlockSizes(block_q=blk, block_k=blk)

        def step(c):
            x, kk, vv = c
            o, _ = F.flash_attention_fwd(
                x, kk, vv, sm_scale=d ** -0.5, causal=True,
                block_sizes=bs, need_lse=False,
            )
            return o, kk, vv

        dts = [benchmark_chained(step, (q, k, v), n=48) for _ in range(3)]
        dt = statistics.median(dts)
        results[name] = fl / dt / 1e12
        print(f"{name}: {fl / dt / 1e12:.2f} TFLOP/s  "
              f"(all: {[f'{fl / x / 1e12:.2f}' for x in dts]})", flush=True)
    return results


def main_bwd():
    """fwd+bwd at the causal headline shape, flat vs rectangular merged
    backward (3.5x FLOPs accounting)."""
    import jax

    import xhy_flash_attention_tpu.ops.flash_attention.bwd as B
    from xhy_flash_attention_tpu.ops.flash_attention.interface import (
        flash_attention,
    )

    b, h, s, d = 4, 16, 4096, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    fl = 3.5 * 4 * b * s * s * h * d / 2

    for name, flat in [("rect", False), ("flat", True)]:
        F.FLAT_CAUSAL = flat
        B.FLAT_CAUSAL = flat

        def loss(q, k, v):
            return flash_attention(
                q, k, v, causal=True).astype(jnp.float32).sum()

        g = jax.grad(loss, argnums=(0, 1, 2))

        def step(c):
            x, kk, vv = c
            dq, dk, dv = g(x, kk, vv)
            # depend on ALL grads or XLA dead-codes backward kernels
            return dq + x * 1e-6, dk + kk * 1e-6, dv + vv * 1e-6

        dts = [benchmark_chained(step, (q, k, v), n=24) for _ in range(3)]
        dt = statistics.median(dts)
        print(f"fwd+bwd {name}: {fl / dt / 1e12:.2f} TFLOP/s  "
              f"(all: {[f'{fl / x / 1e12:.2f}' for x in dts]})", flush=True)


if __name__ == "__main__":
    import sys
    if "--bwd" in sys.argv:
        main_bwd()
    else:
        main()
