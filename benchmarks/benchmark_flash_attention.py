"""Attention benchmark (≙ reference benchmarks/benchmark_flash_attention.py).

Uses the reference's FLOPs accounting (:27-33): fwd = 4·b·s²·h·d (halved
for causal); bwd = 2.5× fwd; fwd+bwd = 3.5× fwd. Sweeps seqlen × head-dim ×
causal and prints TFLOP/s for the Pallas kernels and, for comparison, an
XLA-native softmax attention baseline (the "PyTorch standard attention" of
the reference's headline 2-4× plots).

Run: python benchmarks/benchmark_flash_attention.py [--quick]
"""

import argparse
import math

import jax
import jax.numpy as jnp
import numpy as np

from xhy_flash_attention_tpu.ops.flash_attention.interface import flash_attention
from xhy_flash_attention_tpu.utils.benchmark import benchmark_chained


def flops(batch, seqlen, headdim, nheads, causal, mode="fwd"):
    """≙ reference benchmark_flash_attention.py:27-33."""
    f = 4 * batch * seqlen ** 2 * nheads * headdim // (2 if causal else 1)
    return f if mode == "fwd" else (2.5 * f if mode == "bwd" else 3.5 * f)


def std_attention(q, k, v, causal):
    """XLA softmax attention baseline (materializes the s×s matrix)."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * d ** -0.5
    if causal:
        sq, sk = s.shape[-2], s.shape[-1]
        mask = jnp.tril(jnp.ones((sq, sk), bool))
        s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def run(quick=False):
    dim = 2048
    dropout_p = 0.0
    results = {}
    seqlens = [512, 1024, 2048, 4096] if quick else \
        [512, 1024, 2048, 4096, 8192, 16384]
    for headdim in ([64, 128] if not quick else [128]):
        for causal in [False, True]:
            for seqlen in seqlens:
                batch = max(1, 16384 // seqlen)  # ≙ reference batch rule
                nheads = dim // headdim
                rng = np.random.default_rng(0)
                q = jnp.asarray(
                    rng.standard_normal((batch, nheads, seqlen, headdim)),
                    jnp.bfloat16,
                )

                def fwd(x):
                    return flash_attention(x, x, x, causal=causal)

                t = benchmark_chained(fwd, q, n=12)
                tf = flops(batch, seqlen, headdim, nheads, causal) / t / 1e12

                def fwd_bwd(x):
                    return jax.grad(lambda x: fwd(x).astype(
                        jnp.float32).sum())(x)

                t2 = benchmark_chained(fwd_bwd, q, n=6)
                tf2 = flops(batch, seqlen, headdim, nheads, causal,
                            "fwd_bwd") / t2 / 1e12

                # XLA baseline (skip very long: O(s^2) memory)
                tf_std = float("nan")
                if seqlen <= 4096:
                    t3 = benchmark_chained(
                        lambda x: std_attention(x, x, x, causal), q, n=6
                    )
                    tf_std = flops(batch, seqlen, headdim, nheads,
                                   causal) / t3 / 1e12
                key = (headdim, causal, seqlen)
                results[key] = (tf, tf2, tf_std)
                speedup = tf / tf_std if tf_std == tf_std else float("nan")
                print(f"d={headdim} causal={causal} s={seqlen} b={batch}: "
                      f"fwd {tf:.1f} TF/s | fwd+bwd {tf2:.1f} TF/s | "
                      f"xla-std {tf_std:.1f} TF/s | speedup {speedup:.2f}x",
                      flush=True)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    run(quick=ap.parse_args().quick)
