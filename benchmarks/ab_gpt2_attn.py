"""A/B: attention tile sizes at the GPT-2 training shape (s=1024, d=64).

`BlockSizes.for_shape` picks 1024x1024 tiles, which at s=1024 is a single
block per head: the flat lower-triangle grid degenerates to one step and
the causal mask throws away ~50% of the MXU work (plus d=64 doubles the
VPU-softmax : MXU ratio vs d=128). Smaller tiles re-enable the flat grid's
dead-step skipping at these shapes. Back-to-back chained medians per
CLAUDE.md; 3.5x FLOPs accounting for fwd+bwd.

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/ab_gpt2_attn.py
"""

import statistics

import jax
import jax.numpy as jnp
import numpy as np

from xhy_flash_attention_tpu.ops.flash_attention import flash_attention
from xhy_flash_attention_tpu.ops.flash_attention.common import BlockSizes
from xhy_flash_attention_tpu.utils.benchmark import benchmark_chained


def run(b=4, h=16, s=1024, d=64):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    fl_fwd = 4 * b * s * s * h * d / 2
    fl_fb = 3.5 * fl_fwd

    configs = [
        ("1024x1024 (current default)", 1024, 1024),
        ("512x512", 512, 512),
        ("256x512", 256, 512),
        ("512x256", 512, 256),
        ("256x256", 256, 256),
        ("1024x512", 1024, 512),
        ("512x1024", 512, 1024),
    ]

    def make_bs(bq, bk):
        return BlockSizes(block_q=bq, block_k=bk, block_q_dkv=bq,
                          block_k_dkv=bk, block_q_dq=bq, block_k_dq=bk)

    print(f"fwd+bwd causal b{b} h{h} s{s} d{d} (3.5x accounting):",
          flush=True)
    for name, bq, bk in configs:
        bs = make_bs(bq, bk)

        def loss(x, kk, vv):
            o = flash_attention(x, kk, vv, causal=True, block_sizes=bs)
            return (o.astype(jnp.float32) * 1e-3).sum()

        g = jax.grad(loss, argnums=(0, 1, 2))

        def step(c):
            x, kk, vv = c
            dq, dk, dv = g(x, kk, vv)
            # depend on ALL grads or XLA dead-codes backward kernels
            return (x + dq.astype(x.dtype) * 0,
                    kk + dk.astype(kk.dtype) * 0,
                    vv + dv.astype(vv.dtype) * 0)

        dts = [benchmark_chained(step, (q, k, v), n=192) for _ in range(3)]
        dt = statistics.median(dts)
        print(f"  {name}: {fl_fb / dt / 1e12:6.2f} TFLOP/s  "
              f"(all: {[f'{fl_fb / x / 1e12:.2f}' for x in dts]})",
              flush=True)

    print(f"fwd-only causal b{b} h{h} s{s} d{d}:", flush=True)
    for name, bq, bk in configs:
        bs = make_bs(bq, bk)

        def stepf(c):
            x, kk, vv = c
            o = flash_attention(x, kk, vv, causal=True, block_sizes=bs)
            return o.astype(jnp.bfloat16), kk, vv

        dts = [benchmark_chained(stepf, (q, k, v), n=384) for _ in range(3)]
        dt = statistics.median(dts)
        print(f"  {name}: {fl_fwd / dt / 1e12:6.2f} TFLOP/s  "
              f"(all: {[f'{fl_fwd / x / 1e12:.2f}' for x in dts]})",
              flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--s", type=int, default=1024)
    ap.add_argument("--d", type=int, default=64)
    a = ap.parse_args()
    run(a.b, a.h, a.s, a.d)
