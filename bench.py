"""Benchmark driver: prints ONE JSON line for the round log.

Headline metric: causal flash-attention forward TFLOP/s on the local TPU
chip, measured with the reference's FLOPs accounting
(benchmarks/benchmark_flash_attention.py:27-33: fwd = 4*b*s^2*h*d, halved
for causal). ``vs_baseline`` is the fraction of the BASELINE.json target
(>= 85% of the chip's bf16 matmul roofline); 1.0 = target met.
"""

import json
import time

import jax
import jax.numpy as jnp

# bf16 matmul peak per chip
_PEAKS = {
    "v5 lite": 197e12,   # TPU v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6": 918e12,
}


def _chip_peak() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in _PEAKS.items():
        if key in kind:
            return peak
    return 197e12


def _timed_chain(step_fn, init, n, repeats=5):
    """Marginal per-iteration time of a scan-chained computation.

    The axon tunnel makes block_until_ready a no-op and adds ~30ms fixed
    latency per dispatch, so we chain the op inside one jit via lax.scan,
    force sync with a scalar host transfer, and difference two chain
    lengths to cancel the fixed overhead. Medians of each chain's repeats
    are differenced (min-of-differences is biased fast by latency spikes).
    """
    import statistics

    def chained(init, length):
        out, _ = jax.lax.scan(lambda c, _: (step_fn(c), None), init,
                              None, length=length)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.float32(leaf.reshape(-1)[0])

    n1, n2 = max(1, n // 6), n
    f1 = jax.jit(lambda x: chained(x, n1))
    f2 = jax.jit(lambda x: chained(x, n2))
    float(f1(init)); float(f2(init))  # compile + warm
    t1s, t2s = [], []
    for _ in range(repeats):
        t0 = time.perf_counter(); float(f1(init)); t1 = time.perf_counter()
        float(f2(init)); t2 = time.perf_counter()
        t1s.append(t1 - t0)
        t2s.append(t2 - t1)
    return max(
        (statistics.median(t2s) - statistics.median(t1s)) / (n2 - n1), 1e-9
    )


def bench_attention_fwd(b=4, s=4096, h=16, d=128, causal=True, n=48,
                        rounds=3):
    from xhy_flash_attention_tpu import flash_attn_func

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.bfloat16)

    def step(q):
        # feed the output back as q: keeps the chain data-dependent so XLA
        # cannot CSE iterations away; attention output stays bounded.
        return flash_attn_func(q, k, v, causal=causal)

    # best sustained rate over a few independent median-differenced
    # measurements (tunnel latency spikes only ever slow a measurement)
    dt = min(_timed_chain(step, q, n) for _ in range(rounds))
    flops = 4 * b * s * s * h * d * (0.5 if causal else 1.0)
    return flops / dt


def main():
    tflops = bench_attention_fwd() / 1e12
    target = 0.85 * _chip_peak() / 1e12
    print(json.dumps({
        "metric": "flash_attn_fwd_causal_bf16_b4_s4096_h16_d128",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / target, 4),
    }))


if __name__ == "__main__":
    main()
