"""Tile A/B at the 8k training attention shapes (VERDICT r4 items 2/5).

Two shapes: the gpt2s-8k training shape (b2 h12 s8192 d64 — where the
step profile shows attention at 56% of device time) and the headline
bench shape (b4 h16 s4096 d128). Under the flat causal grid the lse
output rides a (bq/128, 128) block, so bq >= 1024 is required; smaller
tiles are swept with XFA_FLAT_CAUSAL=0 (rectangular grid) for
comparison. Back-to-back chained medians per CLAUDE.md; 3.5x FLOPs
accounting for fwd+bwd.

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/ab_8k_attn.py \
        [--b 2 --h 12 --s 8192 --d 64]
"""

import statistics

import jax
import jax.numpy as jnp
import numpy as np

from xhy_flash_attention_tpu.ops.flash_attention import flash_attention
from xhy_flash_attention_tpu.ops.flash_attention import bwd as bwd_mod
from xhy_flash_attention_tpu.ops.flash_attention import fwd as fwd_mod
from xhy_flash_attention_tpu.ops.flash_attention.common import BlockSizes
from xhy_flash_attention_tpu.utils.benchmark import benchmark_chained


def make_bs(bq, bk, bq_b=None, bk_b=None):
    bq_b, bk_b = bq_b or bq, bk_b or bk
    return BlockSizes(block_q=bq, block_k=bk, block_q_dkv=bq_b,
                      block_k_dkv=bk_b, block_q_dq=bq_b, block_k_dq=bk_b)


def run(b=2, h=12, s=8192, d=64):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    fl_fwd = 4 * b * s * s * h * d / 2
    fl_fb = 3.5 * fl_fwd

    # (label, flat?, fwd tiles, bwd tiles)
    configs = [
        ("1024x1024 flat (default)", True, (1024, 1024), None),
        ("1024x2048 flat", True, (1024, 2048), None),
        ("2048x1024 flat", True, (2048, 1024), None),
        ("1024x512 fwd / 1024x1024 bwd flat", True, (1024, 512),
         (1024, 1024)),
        ("fwd 1024x1024 / bwd 1024x2048 flat", True, (1024, 1024),
         (1024, 2048)),
        ("1024x1024 rect", False, (1024, 1024), None),
        ("512x1024 rect", False, (512, 1024), None),
        ("512x2048 rect", False, (512, 2048), None),
    ]

    def measure(flat, fwd_t, bwd_t, what):
        # FLAT_CAUSAL is read at import time — patch the module constants
        fwd_mod.FLAT_CAUSAL = flat
        bwd_mod.FLAT_CAUSAL = flat
        bwd_t = bwd_t or fwd_t
        bs = make_bs(fwd_t[0], fwd_t[1], bwd_t[0], bwd_t[1])

        if what == "fb":
            def loss(x, kk, vv):
                o = flash_attention(x, kk, vv, causal=True, block_sizes=bs)
                return (o.astype(jnp.float32) * 1e-3).sum()

            g = jax.grad(loss, argnums=(0, 1, 2))

            def step(c):
                x, kk, vv = c
                dq, dk, dv = g(x, kk, vv)
                return (x + dq.astype(x.dtype) * 0,
                        kk + dk.astype(kk.dtype) * 0,
                        vv + dv.astype(vv.dtype) * 0)
            n = 24
        else:
            def step(c):
                x, kk, vv = c
                o = flash_attention(x, kk, vv, causal=True, block_sizes=bs)
                return o.astype(jnp.bfloat16), kk, vv
            n = 64
        dts = [benchmark_chained(step, (q, k, v), n=n) for _ in range(3)]
        return statistics.median(dts)

    print(f"fwd+bwd causal b{b} h{h} s{s} d{d} (3.5x accounting):",
          flush=True)
    for name, flat, ft, bt in configs:
        try:
            dt = measure(flat, ft, bt, "fb")
            print(f"  {name}: {fl_fb / dt / 1e12:6.2f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"  {name}: FAILED {repr(e)[:120]}", flush=True)
    print(f"fwd-only causal b{b} h{h} s{s} d{d}:", flush=True)
    for name, flat, ft, bt in configs:
        if bt is not None:
            continue  # bwd-only variations are redundant for fwd
        try:
            dt = measure(flat, ft, None, "f")
            print(f"  {name}: {fl_fwd / dt / 1e12:6.2f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"  {name}: FAILED {repr(e)[:120]}", flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--h", type=int, default=12)
    ap.add_argument("--s", type=int, default=8192)
    ap.add_argument("--d", type=int, default=64)
    a = ap.parse_args()
    run(a.b, a.h, a.s, a.d)
