"""Descriptor-throughput probe for paged decode (BASELINE config #3).

Hypothesis: at page 512 the chunked paged kernel is bound by DMA
*descriptor issue* on the scalar core (~100 cycles per make_async_copy
start/wait), not by HBM bytes — 32 descriptors/chunk (k, v, k-scales,
v-scales x 8 pages) cost more scalar time than the 1.05 MB chunk costs
DMA time (~1.3 us). Probes, all at b8 hk8 g4 d128 S8192:

  int8-512 / int8-1024: current kernel (32 desc per chunk)
  bf16-512 / bf16-1024: same kernel, no scales (16 desc per chunk,
      2x bytes per desc — the desc:byte ratio a packed-kv+external-scales
      int8 layout would have)
  contiguous int8: the 0.89-roofline reference point

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/ab_paged_descriptors.py
"""

import statistics

import jax.numpy as jnp
import numpy as np

from xhy_flash_attention_tpu.inference.paged import (
    PagedKVCache, paged_flash_decode,
)
from xhy_flash_attention_tpu.ops.quant import quantize_kv
from xhy_flash_attention_tpu.utils.benchmark import benchmark_chained

B, H, HK, D, S = 8, 32, 8, 128, 8192


def _bw():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    return 819e9 if ("v5" in kind and "lite" in kind or "v5e" in kind) else 819e9


def make_cache(page_size, dtype):
    rng = np.random.default_rng(0)
    npp = S // page_size
    num_pages = B * npp + 2
    kw = dict()
    if dtype == jnp.int8:
        kq = quantize_kv(jnp.asarray(
            rng.standard_normal((num_pages, HK, page_size, D)), jnp.bfloat16),
            jnp.int8)
        vq = quantize_kv(jnp.asarray(
            rng.standard_normal((num_pages, HK, page_size, D)), jnp.bfloat16),
            jnp.int8)
        kp, vp = kq.values, vq.values
        kw = dict(k_scales=kq.scales[..., 0][:, :, None, :],
                  v_scales=vq.scales[..., 0][:, :, None, :])
    else:
        kp = jnp.asarray(
            rng.standard_normal((num_pages, HK, page_size, D)), dtype)
        vp = jnp.asarray(
            rng.standard_normal((num_pages, HK, page_size, D)), dtype)
    perm = rng.permutation(B * npp) + 1
    table = jnp.asarray(perm.reshape(B, npp), jnp.int32)
    return PagedKVCache.from_kv(kp, vp, table,
                                jnp.full((B,), S, jnp.int32), **kw)


def probe(page_size, dtype, n=512, rounds=3):
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.bfloat16)
    cache = make_cache(page_size, dtype)

    def step(c):
        x, cache = c
        o = paged_flash_decode(x, cache, softmax_scale=D ** -0.5)
        return o.reshape(x.shape), cache

    dt = statistics.median(
        benchmark_chained(step, (q, cache), n=n) for _ in range(rounds))
    itemsize = 1 if dtype == jnp.int8 else 2
    bytes_read = 2 * B * HK * S * D * itemsize
    if dtype == jnp.int8:
        bytes_read += 2 * B * HK * S * 4
    frac = bytes_read / dt / _bw()
    print(f"page={page_size} {jnp.dtype(dtype).name}: {frac:.4f} of roofline"
          f" ({dt * 1e6:.1f} us/step)", flush=True)
    return frac


def main():
    for page in (512, 1024):
        for dtype in (jnp.int8, jnp.bfloat16):
            probe(page, dtype)


if __name__ == "__main__":
    main()
