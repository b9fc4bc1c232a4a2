"""Quantization tests: INT8/FP8 KV decode accuracy, weight-only matmul."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xhy_flash_attention_tpu.ops.decode import _decode_attention_xla
from xhy_flash_attention_tpu.ops.flash_attention.decode_kernel import flash_decode
from xhy_flash_attention_tpu.ops.quant import (
    QuantizedKV,
    dequantize_kv,
    quantize_kv,
    quantize_weight,
    weight_only_quant_matmul,
)


def test_quantize_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 64, 64), jnp.float32)
    for dtype, tol in [(jnp.int8, 1e-2), (jnp.float8_e4m3fn, 4e-2)]:
        q = quantize_kv(x, dtype)
        back = dequantize_kv(q)
        rel = float(jnp.abs(back - x).max() / jnp.abs(x).max())
        assert rel < tol, (dtype, rel)


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.float8_e4m3fn])
def test_quantized_kv_decode(dtype):
    b, hk, g, d, S = 2, 2, 4, 64, 1024
    h = hk * g
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(keys[0], (b, 1, h, d), jnp.float32)
    kc = jax.random.normal(keys[1], (b, hk, S, d), jnp.float32)
    vc = jax.random.normal(keys[2], (b, hk, S, d), jnp.float32)
    lengths = jnp.asarray([900, 333], jnp.int32)
    scale = d ** -0.5
    ref = _decode_attention_xla(q, kc, vc, lengths, scale)
    kq, vq = quantize_kv(kc, dtype), quantize_kv(vc, dtype)
    out = flash_decode(q, kq, vq, lengths, softmax_scale=scale, block_k=256)
    # error vs a dequantized-XLA reference (isolates kernel error from
    # quantization error)
    ref_q = _decode_attention_xla(
        q, dequantize_kv(kq), dequantize_kv(vq), lengths, scale
    )
    assert jnp.allclose(out, ref_q, atol=3e-5), float(jnp.abs(out - ref_q).max())
    # end-to-end quantization error stays small
    assert float(jnp.abs(out - ref).max()) < 0.05


def test_weight_only_quant_matmul():
    x = jax.random.normal(jax.random.PRNGKey(2), (32, 256), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(3), (256, 512), jnp.float32) * 0.05
    for dtype, tol in [(jnp.int8, 0.015), (jnp.int4, 0.2)]:
        wq, scale = quantize_weight(w, dtype)
        y = weight_only_quant_matmul(x, wq, scale)
        ref = (x.astype(jnp.float32) @ w).astype(jnp.bfloat16)
        rel = float(
            jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32)).max()
            / jnp.abs(ref.astype(jnp.float32)).max()
        )
        assert rel < tol, (dtype, rel)
