"""A/B the merged-backward dQ variants on the real chip.

Variants:
  scratch   — persistent VMEM dq accumulator (new; O(g·sq·d) VMEM)
  workspace — fp32 (b,h,nkv,sq,d) HBM partials + XLA reduce (old)
  split     — two-kernel dKV/dQ fallback

Run: PYTHONPATH=. python benchmarks/ab_merged_dq.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from xhy_flash_attention_tpu.ops.flash_attention import bwd as bwd_mod
from xhy_flash_attention_tpu.ops.flash_attention.interface import flash_attention
from xhy_flash_attention_tpu.utils.benchmark import benchmark_chained


def bwd_flops(b, s, h, d, causal):
    return 2.5 * 4 * b * s * s * h * d / (2 if causal else 1)


def run_case(name, b, s, h, hk, d, causal, variants):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, hk, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, hk, s, d)), jnp.bfloat16)

    def fwd_bwd(q, k, v):
        def loss(q, k, v):
            return flash_attention(q, k, v, causal=causal).astype(
                jnp.float32).sum()
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    for variant in variants:
        # cap=0 disables the scratch variant; shapes whose workspace fits
        # 2 GiB then take the old workspace path, larger ones the split
        # path — i.e. exactly the pre-change behavior ("old").
        bwd_mod.MERGED_DQ_SCRATCH_CAP = (
            40 * 2**20 if variant == "scratch" else 0
        )
        t = benchmark_chained(fwd_bwd, q, k, v, n=4)
        tf = bwd_flops(b, s, h, d, causal) / t / 1e12
        print(f"{name} {variant:9s} causal={causal} "
              f"t={t*1e3:7.2f} ms  {tf:6.1f} TFLOP/s (bwd-accounted)")


if __name__ == "__main__":
    print(jax.devices())
    # Case 1: shape where the old workspace path engaged (h=hk, moderate s)
    for causal in (False, True):
        run_case("mha-4k ", 2, 4096, 16, 16, 128, causal,
                 ["old", "scratch"])
    # Case 2: Llama-8B training geometry — old path fell back to split
    # (workspace 17 GiB > 2 GiB cap); new scratch path engages (16 MiB).
    for causal in (False, True):
        run_case("llama8k", 4, 8192, 32, 8, 128, causal,
                 ["old", "scratch"])
