"""Decode benchmark: tokens/s and HBM-bandwidth utilization for the decode
kernels across cache lengths, dtypes (bf16 / INT8 / FP8 KV) and paged vs
contiguous layouts.

Decode attention is bandwidth-bound — each step streams the whole KV cache
once — so the score that matters is achieved bytes/s vs the chip's HBM
bandwidth (the BASELINE.json north star counts decode in tokens/s/chip and
roofline %). Quantized KV halves/quarters the bytes per token, which is the
entire point of the INT8/FP8 cache.

Run: python benchmarks/benchmark_decode.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from xhy_flash_attention_tpu.inference import PagedKVCache, paged_flash_decode
from xhy_flash_attention_tpu.ops.flash_attention.decode_kernel import flash_decode
from xhy_flash_attention_tpu.ops.quant import QuantizedKV, quantize_kv
from xhy_flash_attention_tpu.utils.benchmark import benchmark_chained

_HBM_BW = {"v5 lite": 819e9, "v5e": 819e9, "v5p": 2765e9, "v4": 1228e9,
           "v6": 1640e9}


def hbm_bw():
    kind = jax.devices()[0].device_kind.lower()
    for k, v in _HBM_BW.items():
        if k in kind:
            return v
    return 819e9


def run():
    b, h, hk, d = 8, 32, 8, 128  # Llama-3-8B-ish GQA geometry
    bw = hbm_bw()
    rng = np.random.default_rng(0)
    for S in (2048, 8192, 16384):
        q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, hk, S, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, hk, S, d)), jnp.bfloat16)
        lengths = jnp.full((b,), S, jnp.int32)

        for name, kc, vc in [
            ("bf16", k, v),
            ("int8", quantize_kv(k, jnp.int8), quantize_kv(v, jnp.int8)),
            ("fp8", quantize_kv(k, jnp.float8_e4m3fn),
             quantize_kv(v, jnp.float8_e4m3fn)),
        ]:
            # caches ride the carry so they are arguments, not baked-in
            # constants (keeps the executable small)
            def step(c):
                x, kc, vc = c
                o = flash_decode(x, kc, vc, lengths,
                                 softmax_scale=d ** -0.5)
                return (o.reshape(x.shape), kc, vc)

            t = benchmark_chained(step, (q, kc, vc), n=24)
            itemsize = (kc.values.dtype.itemsize
                        if isinstance(kc, QuantizedKV) else kc.dtype.itemsize)
            bytes_read = 2 * b * hk * S * d * itemsize
            if isinstance(kc, QuantizedKV):
                bytes_read += 2 * b * hk * S * 4  # scales
            print(f"S={S} {name}: {1.0 / t:.0f} steps/s "
                  f"({b / t:.0f} tok/s) | {bytes_read / t / 1e9:.0f} GB/s "
                  f"({bytes_read / t / bw:.0%} of HBM)", flush=True)

        # paged layout
        ps = 512
        npp = S // ps
        num_pages = b * npp + 1
        table = jnp.arange(b * npp, dtype=jnp.int32).reshape(b, npp)
        cache = PagedKVCache.from_kv(
            k.transpose(0, 2, 1, 3).reshape(b * npp, ps, hk, d)
            .transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3).reshape(b * npp, ps, hk, d)
            .transpose(0, 2, 1, 3),
            table, lengths,
        )

        def pstep(c):
            x, cache = c
            return paged_flash_decode(x, cache).reshape(x.shape), cache

        t = benchmark_chained(pstep, (q, cache), n=24)
        bytes_read = 2 * b * hk * S * d * 2
        print(f"S={S} paged-bf16 (page={ps}): {b / t:.0f} tok/s | "
              f"{bytes_read / t / 1e9:.0f} GB/s "
              f"({bytes_read / t / bw:.0%} of HBM)", flush=True)


if __name__ == "__main__":
    run()
