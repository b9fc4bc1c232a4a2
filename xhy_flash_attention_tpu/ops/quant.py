"""Quantization: INT8/FP8 KV-cache and weight-only quantized matmuls.

≙ reference FA3 FP8 path (q/k/v_descale, csrc/flash_attn_v3/flash_api.h:69-78)
and the BASELINE.json north star (INT8/FP8 paged KV with dequant fused into
the attention inner loop; weight-only INT4/INT8 projection matmuls).

KV quantization is per-token, per-head, symmetric: one scale per (b, head,
position). The decode kernel loads int8/fp8 payloads (half/quarter the HBM
bytes of bf16 — decode is bandwidth-bound, so this is a direct speedup) and
dequantizes in VMEM right before the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "QuantizedKV",
    "quantize_kv",
    "dequantize_kv",
    "quantize_fp8_per_head",
    "quantize_weight",
    "weight_only_quant_matmul",
]

_QMAX = {
    jnp.int8.dtype: 127.0,
    jnp.float8_e4m3fn.dtype: 448.0,
    jnp.int4.dtype: 7.0,
}


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedKV:
    """Quantized cache tensor: values (b, hk, S, d) int8/fp8 + per-token
    scales (b, hk, S, 1) fp32."""

    values: jax.Array
    scales: jax.Array

    def tree_flatten(self):
        return (self.values, self.scales), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.values.shape

    @property
    def dtype(self):
        return self.values.dtype


def quantize_kv(x: jax.Array, dtype=jnp.int8) -> QuantizedKV:
    """x: (..., d) -> per-row symmetric quantization."""
    qmax = _QMAX[jnp.dtype(dtype)]
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / qmax, 1e-8)
    q = x.astype(jnp.float32) / scale
    if jnp.dtype(dtype) == jnp.int8.dtype or jnp.dtype(dtype) == jnp.int4.dtype:
        q = jnp.clip(jnp.round(q), -qmax, qmax).astype(dtype)
    else:
        q = q.astype(dtype)
    return QuantizedKV(values=q, scales=scale.astype(jnp.float32))


def dequantize_kv(qkv: QuantizedKV, dtype=jnp.float32) -> jax.Array:
    return (qkv.values.astype(jnp.float32) * qkv.scales).astype(dtype)


def quantize_fp8_per_head(
    x: jax.Array, num_kv_heads: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-(batch, kv-head) symmetric FP8 e4m3 quantization for the
    prefill-attention fp8 path (≙ FA3 q/k/v_descale granularity,
    csrc/flash_attn_v3/flash_api.h:69-78).

    x: (b, s, h, d). ``num_kv_heads`` groups query heads GQA-style (each
    group of h // num_kv_heads heads shares one scale — FA3 indexes
    q_descale by ``bidh / qhead_per_khead``); default per-head. Returns
    (values float8_e4m3fn (b, s, h, d), descale fp32 (b, num_kv_heads))
    with dequant(x) = values * descale[b, head_group].
    """
    b, s, h, d = x.shape
    hk = num_kv_heads or h
    assert h % hk == 0, (h, hk)
    xf = x.astype(jnp.float32).reshape(b, s, hk, (h // hk) * d)
    amax = jnp.max(jnp.abs(xf), axis=(1, 3))  # (b, hk)
    scale = jnp.maximum(amax / 448.0, 1e-8)
    q = (xf / scale[:, None, :, None]).reshape(b, s, h, d)
    return q.astype(jnp.float8_e4m3fn), scale


def quantize_weight(w: jax.Array, dtype=jnp.int8,
                    axis: int = 0) -> Tuple[jax.Array, jax.Array]:
    """Weight-only per-output-channel quantization: w (in, out) ->
    (w_q (in, out) int8/int4, scale (out,) fp32). `axis` is the reduction
    (input) dimension."""
    qmax = _QMAX[jnp.dtype(dtype)]
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / qmax, 1e-8)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -qmax, qmax)
    return q.astype(dtype), scale.reshape(-1).astype(jnp.float32)


def weight_only_quant_matmul(x: jax.Array, w_q: jax.Array, scale: jax.Array,
                             bias: Optional[jax.Array] = None) -> jax.Array:
    """y = x @ dequant(w_q) (+ bias). The convert fuses into the matmul
    under XLA; for int4 the unpack also fuses. x (..., in), w_q (in, out),
    scale (out,)."""
    y = jax.lax.dot_general(
        x, w_q.astype(x.dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)
