"""Decode-time attention: small-q against a KV cache with per-sample lengths.

≙ reference csrc/ft_attention (K14 `single_query_attention`,
ft_attention.cpp:226) and the FA3 decode features (split-KV etc, I4).

Two paths:
  * `decode_attention` — XLA path for short caches / correctness baseline.
  * `decode_attention_kernel` — Pallas kernel (ops/flash_attention/decode_kernel)
    with GQA packing: the q-head group dimension folds into the MXU row
    dimension so MQA/GQA decode still feeds 8+ sublanes (≙ FA3 PackGQA,
    pack_gqa.h). Selected automatically for large caches.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .flash_attention.common import NEG_INF

__all__ = ["decode_attention"]


def _decode_attention_xla(q, k_cache, v_cache, lengths, softmax_scale,
                          window_size=(-1, -1), softcap: float = 0.0):
    b, sq, h, d = q.shape
    hk, S = k_cache.shape[1], k_cache.shape[2]
    g = h // hk
    qf = q.astype(jnp.float32)
    kf = k_cache.astype(jnp.float32)  # (b, hk, S, d)
    vf = v_cache.astype(jnp.float32)
    qf = qf.reshape(b, sq, hk, g, d)
    s = jnp.einsum("bshgd,bhtd->bhgst", qf, kf) * softmax_scale
    if softcap > 0.0:
        s = jnp.tanh(s / softcap) * softcap
    cols = jnp.arange(S, dtype=jnp.int32)
    # absolute position of query row r = lengths - sq + r
    rows_abs = lengths[:, None] - sq + jnp.arange(sq, dtype=jnp.int32)[None]
    mask = cols[None, None, :] <= rows_abs[:, :, None]  # (b, sq, S) causal+len
    if window_size[0] >= 0:
        mask = jnp.logical_and(
            mask, cols[None, None, :] >= rows_abs[:, :, None] - window_size[0]
        )
    s = jnp.where(mask[:, None, None, :, :], s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - jnp.maximum(m, 0.5 * NEG_INF))
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.maximum(l, 1e-37)
    out = jnp.einsum("bhgst,bhtd->bshgd", p, vf)
    return out.reshape(b, sq, h, d).astype(q.dtype)


def decode_attention(q, k_cache, v_cache, lengths, softmax_scale,
                     window_size=(-1, -1), softcap: float = 0.0,
                     use_kernel: Optional[bool] = None,
                     kv_batch_idx=None, leftpad_k=None):
    """q: (b, sq, h, d) new queries; k/v_cache: (b, hk, max_s, d);
    lengths: (b,) valid cache length *including* the new tokens.

    Row r of the query attends cache positions <= lengths - sq + r
    (the new keys must already be written into the cache).

    kv_batch_idx/leftpad_k: FA3 long-tail cache params (≙ flash_api.h:
    100-150) — per-query-batch cache row remap and per-batch left
    padding of the cache contents; kernel-path only.
    """
    from .quant import QuantizedKV, dequantize_kv

    if use_kernel is None:
        use_kernel = k_cache.shape[2] >= 1024 or isinstance(
            k_cache, QuantizedKV
        )
    if kv_batch_idx is not None or leftpad_k is not None:
        use_kernel = True
    if use_kernel:
        from .flash_attention.decode_kernel import flash_decode
        return flash_decode(
            q, k_cache, v_cache, lengths,
            softmax_scale=softmax_scale, window_size=window_size,
            softcap=softcap, kv_batch_idx=kv_batch_idx,
            leftpad_k=leftpad_k,
        )
    if isinstance(k_cache, QuantizedKV):
        k_cache = dequantize_kv(k_cache, q.dtype)
        v_cache = dequantize_kv(v_cache, q.dtype)
    return _decode_attention_xla(
        q, k_cache, v_cache, lengths, softmax_scale, window_size, softcap
    )
