"""Benchmark driver: prints ONE JSON line for the round log.

Headline metric (aligned with BASELINE.json: "Llama-3-8B decode with
quantized KV at >=85% of attention roofline per chip"): the INT8-KV
flash-decode kernel at Llama-3-8B attention geometry (32/8 GQA heads,
d=128) as a fraction of its roofline. Decode attention is bandwidth-bound,
so the roofline is the chip's HBM bandwidth over the quantized cache
bytes; ``vs_baseline`` = achieved_fraction / 0.85 (1.0 = target met).

The ``extra`` field carries the training-side number: causal prefill
attention forward TFLOP/s with the reference's FLOPs accounting
(benchmarks/benchmark_flash_attention.py:27-33) and its fraction of the
bf16 matmul peak.
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
    Chains must be long enough that chip time dominates the multi-ms
    tunnel jitter: short decode chains (n=64, ~10ms of chip time) read
    3-5% low and swing ±10% between rounds; n=512 (~100ms) is stable ±1%.
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

    import statistics

    dt = statistics.median(_timed_chain(step, q, n) for _ in range(rounds))
    flops = 4 * b * s * s * h * d * (0.5 if causal else 1.0)
    return flops / dt


def bench_attention_fwd_fp8(b=4, s=4096, h=16, d=128, n=48, rounds=3):
    """FP8 e4m3 causal prefill forward with per-head descale (≙ FA3 fp8,
    the BASELINE hopper capability) at the same shape/accounting as the
    bf16 headline. The descale operand is perturbed by the carried
    accumulator so the loop-invariant pallas call cannot be hoisted out
    of the chain (chip A/B: fp8 measures ~5% ABOVE bf16 — half the input
    HBM bytes beat the in-kernel integer-reconstruction dequant)."""
    from xhy_flash_attention_tpu import flash_attn_fp8_func
    from xhy_flash_attention_tpu.ops.quant import quantize_fp8_per_head

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q8, qd = quantize_fp8_per_head(
        jax.random.normal(ks[0], (b, s, h, d), jnp.float32))
    k8, kd = quantize_fp8_per_head(
        jax.random.normal(ks[1], (b, s, h, d), jnp.float32))
    v8, vd = quantize_fp8_per_head(
        jax.random.normal(ks[2], (b, s, h, d), jnp.float32))

    def step(c):
        acc = c[0]
        o = flash_attn_fp8_func(q8, k8, v8, qd + acc * 1e-38, kd, vd,
                                causal=True)
        return (acc + o[0, 0, 0, :1].astype(jnp.float32).sum(),)

    import statistics

    dt = statistics.median(
        _timed_chain(step, (jnp.float32(0),), n) for _ in range(rounds))
    return 4 * b * s * s * h * d * 0.5 / dt


_HBM_BW = {"v5 lite": 819e9, "v5e": 819e9, "v5p": 2765e9, "v4": 1228e9,
           "v6": 1640e9}


def _chip_bw() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, bw in _HBM_BW.items():
        if key in kind:
            return bw
    return 819e9


def bench_decode_int8_roofline(b=8, h=32, hk=8, d=128, S=8192, n=512,
                               rounds=4, kv_dtype=jnp.int8):
    """Quantized-KV flash decode at Llama-3-8B attention geometry: achieved
    fraction of the HBM-bandwidth roofline (the binding roofline for
    decode attention). kv_dtype selects the cache payload — int8 or
    float8_e4m3fn (the BASELINE.json metric names FP8 KV; both are
    1 byte/elem, so they share the same roofline). On v5e the fp8 path
    dequantizes via the integer bit-reconstruction
    (common.fp8_to_f32_tiny, rebias folded into the per-token scales):
    chip-measured 0.87 of roofline (>= the 0.85 target) vs int8's 0.90
    native-convert floor (Mosaic's emulated astype managed 0.09); v6e+
    has the native fp8 convert."""
    import numpy as np

    from xhy_flash_attention_tpu.ops.flash_attention.decode_kernel import (
        flash_decode,
    )
    from xhy_flash_attention_tpu.ops.quant import quantize_kv

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
    k = quantize_kv(
        jnp.asarray(rng.standard_normal((b, hk, S, d)), jnp.bfloat16),
        kv_dtype,
    )
    v = quantize_kv(
        jnp.asarray(rng.standard_normal((b, hk, S, d)), jnp.bfloat16),
        kv_dtype,
    )
    lengths = jnp.full((b,), S, jnp.int32)

    def step(c):
        x, k, v = c
        o = flash_decode(x, k, v, lengths, softmax_scale=d ** -0.5)
        return o.reshape(x.shape), k, v

    import statistics

    # median across rounds: min compounds the optimism of noisy
    # differenced timings (a >100% roofline reading is a measurement bug)
    dt = statistics.median(
        _timed_chain(step, (q, k, v), n) for _ in range(rounds)
    )
    bytes_read = 2 * b * hk * S * d * 1 + 2 * b * hk * S * 4  # int8 + scales
    achieved = bytes_read / dt
    return min(achieved / _chip_bw(), 1.0)


def bench_paged_decode_int8_roofline(b=8, h=32, hk=8, d=128, S=8192,
                                     page_size=512, n=512, rounds=4):
    """Same geometry as the contiguous bench but against a PAGED int8
    cache (BASELINE config #3's actual serving path): pages are gathered
    multiple-per-grid-step with explicit double-buffered DMA."""
    import statistics

    import numpy as np

    from xhy_flash_attention_tpu.inference.paged import (
        PagedKVCache,
        paged_flash_decode,
    )
    from xhy_flash_attention_tpu.ops.quant import quantize_kv

    rng = np.random.default_rng(0)
    npp = S // page_size
    num_pages = b * npp + 2
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
    kq = quantize_kv(
        jnp.asarray(rng.standard_normal((num_pages, hk, page_size, d)),
                    jnp.bfloat16), jnp.int8)
    vq = quantize_kv(
        jnp.asarray(rng.standard_normal((num_pages, hk, page_size, d)),
                    jnp.bfloat16), jnp.int8)
    # scatter the pages across the pool (worst-ish case for locality)
    perm = rng.permutation(b * npp) + 1
    table = jnp.asarray(perm.reshape(b, npp), jnp.int32)
    cache = PagedKVCache.from_kv(
        kq.values, vq.values, table, jnp.full((b,), S, jnp.int32),
        k_scales=kq.scales[..., 0][:, :, None, :],
        v_scales=vq.scales[..., 0][:, :, None, :],
    )

    def step(c):
        x, cache = c
        o = paged_flash_decode(x, cache, softmax_scale=d ** -0.5)
        return o.reshape(x.shape), cache

    dt = statistics.median(
        _timed_chain(step, (q, cache), n) for _ in range(rounds)
    )
    bytes_read = 2 * b * hk * S * d * 1 + 2 * b * hk * S * 4  # int8 + scales
    return min(bytes_read / dt / _chip_bw(), 1.0)


def _retry(fn, attempts=3):
    """The axon tunnel intermittently drops a remote_compile mid-body
    (observed: jax.errors.JaxRuntimeError 'response body closed') — a
    transient that succeeds on re-dispatch. One flake must not zero out
    the round's recorded bench."""
    for i in range(attempts):
        try:
            return fn()
        except Exception:  # noqa: BLE001 — tunnel transport errors
            if i == attempts - 1:
                raise
            time.sleep(20)


def main():
    import functools

    fp8_frac = _retry(functools.partial(
        bench_decode_int8_roofline, kv_dtype=jnp.float8_e4m3fn))
    frac = _retry(bench_decode_int8_roofline)
    paged_frac = _retry(bench_paged_decode_int8_roofline)
    tflops = _retry(bench_attention_fwd) / 1e12
    fp8_tflops = _retry(bench_attention_fwd_fp8) / 1e12
    peak_frac = tflops / (_chip_peak() / 1e12)
    # headline = the BASELINE.json metric verbatim: Llama-3-8B decode with
    # FP8 KV as a fraction of the HBM roofline
    print(json.dumps({
        "metric": "llama3_8b_geometry_fp8kv_decode_attn_roofline_fraction",
        "value": round(fp8_frac, 4),
        "unit": "fraction of HBM-bandwidth roofline (target >= 0.85)",
        "vs_baseline": round(fp8_frac / 0.85, 4),
        "extra": {
            "int8_decode_roofline_fraction": round(frac, 4),
            "paged_int8_decode_roofline_fraction_page512": round(
                paged_frac, 4),
            "attn_fwd_causal_bf16_b4_s4096_h16_d128_tflops": round(tflops, 2),
            "attn_fwd_causal_fp8_same_shape_tflops": round(fp8_tflops, 2),
            "attn_fwd_fraction_of_bf16_peak": round(peak_frac, 4),
        },
    }))


if __name__ == "__main__":
    main()
