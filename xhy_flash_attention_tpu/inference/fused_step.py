"""Fused decode step: rotary + cache append + attention in ONE dispatch.

≙ reference ft_attention (csrc/ft_attention/ft_attention.cpp:226
`masked_multihead_attention`): the CUDA kernel applies rotary to the new
token, writes it into the KV cache, and runs the attention loop in a single
launch. On TPU the same fusion is one jitted region: inside a jit the XLA
scheduler already fuses the (tiny) rotary math and the cache scatter around
the Pallas attention kernel, so "one kernel" becomes "one executable, one
dispatch" — which is what matters on a dispatch-latency-bound serving host
(the axon tunnel adds ~30ms per dispatch; three separate calls for
rotary/append/attend cost ~90ms per token *per layer* when driven eagerly).

The cache is donated, so the append is in-place in HBM (no copy of the
multi-GB cache per step).

Supports the three cache kinds of modules/mha.py:
  * dense (k_cache, v_cache) arrays (b, hk, S, d)
  * QuantizedKV dense caches (INT8/FP8 payload + per-token scales)
  * PagedKVCache (continuous batching), via append_paged_kv +
    paged_flash_decode
with per-sample `lengths` (ragged decode positions, ≙ ft_attention's
per-sequence timestep array).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..layers.rotary import apply_rotary_emb
from ..ops.flash_attention.decode_kernel import flash_decode
from ..ops.quant import QuantizedKV, quantize_kv
from .paged import PagedKVCache, append_paged_kv, paged_flash_decode

__all__ = ["fused_decode_step"]


def _rotary_at(x, lengths, inv_freq, interleaved):
    """Apply rotary to (b, sq, h, d) new tokens at per-sample positions
    lengths[b] + t (traced offsets — gather the cos/sin rows per sample)."""
    sq = x.shape[1]
    pos = lengths[:, None] + jnp.arange(sq, dtype=jnp.int32)[None]  # (b, sq)
    freqs = pos[..., None].astype(jnp.float32) * inv_freq[None, None]
    cos = jnp.cos(freqs).astype(x.dtype)   # (b, sq, rot/2)
    sin = jnp.sin(freqs).astype(x.dtype)
    # apply_rotary_emb broadcasts cos/sin (..., s, ro/2) over heads, so the
    # per-sample leading batch dim rides along
    return apply_rotary_emb(x, cos, sin, interleaved)


def _append_dense(k_cache, v_cache, k_new, v_new, lengths):
    """Scatter sq new tokens per sample at ragged positions into dense
    (b, hk, S, d) caches — one scatter per cache, no per-batch loop."""
    b, hk, sq, d = k_new.shape

    def write(cache, new):
        if sq == 1:
            rows = new[:, :, 0].astype(cache.dtype)  # (b, hk, d)
            return cache.at[jnp.arange(b), :, lengths, :].set(rows)
        bi = jnp.repeat(jnp.arange(b), sq)
        pos = (lengths[:, None] + jnp.arange(sq)[None]).reshape(-1)
        rows = jnp.swapaxes(new, 1, 2).reshape(b * sq, hk, d)
        return cache.at[bi, :, pos, :].set(rows.astype(cache.dtype))

    return write(k_cache, k_new), write(v_cache, v_new)


def _fused_step_impl(q, k_new, v_new, cache, lengths, inv_freq, *,
                     softmax_scale, window_size, softcap, interleaved):
    if lengths is None:
        assert isinstance(cache, PagedKVCache), (
            "lengths may only be omitted for a PagedKVCache (it carries its "
            "own lengths); passing cache.lengths separately would conflict "
            "with the cache donation"
        )
        lengths = cache.lengths
    if inv_freq is not None:
        q = _rotary_at(q, lengths, inv_freq, interleaved)
        kr = _rotary_at(jnp.swapaxes(k_new, 1, 2), lengths, inv_freq,
                        interleaved)
        k_new = jnp.swapaxes(kr, 1, 2)
    sq = q.shape[1]
    if isinstance(cache, PagedKVCache):
        cache = append_paged_kv(cache, k_new, v_new)
        out = paged_flash_decode(
            q, cache, softmax_scale=softmax_scale,
            window_size=window_size, softcap=softcap,
        )
        return out, cache
    k_cache, v_cache = cache
    new_len = lengths + sq
    if isinstance(k_cache, QuantizedKV):
        kq = quantize_kv(k_new, k_cache.values.dtype)
        vq = quantize_kv(v_new, v_cache.values.dtype)
        kv_, ks_ = _append_dense(k_cache.values, k_cache.scales,
                                 kq.values, kq.scales, lengths)
        vv_, vs_ = _append_dense(v_cache.values, v_cache.scales,
                                 vq.values, vq.scales, lengths)
        k_cache = QuantizedKV(kv_, ks_)
        v_cache = QuantizedKV(vv_, vs_)
    else:
        k_cache, v_cache = _append_dense(
            k_cache, v_cache, k_new, v_new, lengths
        )
    out = flash_decode(
        q, k_cache, v_cache, new_len, softmax_scale=softmax_scale,
        window_size=window_size, softcap=softcap,
    )
    return out, (k_cache, v_cache)


@functools.partial(
    jax.jit,
    static_argnames=("softmax_scale", "window_size", "softcap",
                     "interleaved"),
    donate_argnums=(3,),
)
def fused_decode_step(
    q: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    cache,
    lengths: Optional[jax.Array] = None,
    inv_freq: Optional[jax.Array] = None,
    *,
    softmax_scale: float,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    interleaved: bool = False,
):
    """One-dispatch decode step (rotary -> append -> attend).

    q: (b, sq, h, d) new queries (pre-rotary when inv_freq is given);
    k_new/v_new: (b, hk, sq, d) new keys/values (pre-rotary);
    cache: (k_cache, v_cache) dense/QuantizedKV tuple or a PagedKVCache
        (donated: the append happens in place);
    lengths: (b,) int32 tokens already in the cache per sample (omit for
        a PagedKVCache — it carries its own);
    inv_freq: optional (rot_dim/2,) rotary inverse frequencies
        (RotaryEmbedding's `inv_freq`); None skips rotary.

    Returns (out (b, sq, h, d), new_cache).
    """
    return _fused_step_impl(
        q, k_new, v_new, cache,
        None if lengths is None else jnp.asarray(lengths, jnp.int32),
        inv_freq,
        softmax_scale=softmax_scale, window_size=window_size,
        softcap=softcap, interleaved=interleaved,
    )
