"""Decode attention: Pallas flash_decode vs XLA reference and full-attention
cross-check (≙ reference tests for ft_attention via test_gpt generation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xhy_flash_attention_tpu.ops.decode import (
    _decode_attention_xla,
    decode_attention,
)
from xhy_flash_attention_tpu.ops.flash_attention.decode_kernel import flash_decode
from xhy_flash_attention_tpu.ops.flash_attention.reference import attention_ref


@pytest.mark.parametrize("g", [1, 4])
@pytest.mark.parametrize("sq", [1, 4])
def test_flash_decode_matches_xla(sq, g):
    b, hk, d, S = 2, 2, 64, 1024
    h = hk * g
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, sq, h, d), jnp.float32)
    kc = jax.random.normal(keys[1], (b, hk, S, d), jnp.float32)
    vc = jax.random.normal(keys[2], (b, hk, S, d), jnp.float32)
    lengths = jnp.asarray([700, 123 + sq], jnp.int32)
    scale = d ** -0.5
    out_k = flash_decode(q, kc, vc, lengths, softmax_scale=scale, block_k=256)
    out_x = _decode_attention_xla(q, kc, vc, lengths, scale)
    assert jnp.allclose(out_k, out_x, atol=2e-5), (
        float(jnp.abs(out_k - out_x).max())
    )


def test_decode_matches_full_attention():
    """Decoding the last token must equal full causal attention's last row."""
    b, s, h, d = 1, 256, 4, 64
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q_full = jax.random.normal(keys[0], (b, s, h, d), jnp.float32)
    k_full = jax.random.normal(keys[1], (b, s, h, d), jnp.float32)
    v_full = jax.random.normal(keys[2], (b, s, h, d), jnp.float32)
    ref, _ = attention_ref(q_full, k_full, v_full, causal=True, upcast=True)
    kvt = jnp.swapaxes(k_full, 1, 2)
    vvt = jnp.swapaxes(v_full, 1, 2)
    out = decode_attention(
        q_full[:, -1:], kvt, vvt,
        lengths=jnp.asarray([s], jnp.int32),
        softmax_scale=d ** -0.5, use_kernel=False,
    )
    assert jnp.allclose(out[:, 0], ref[:, -1], atol=1e-5)
    out_k = decode_attention(
        q_full[:, -1:], kvt, vvt,
        lengths=jnp.asarray([s], jnp.int32),
        softmax_scale=d ** -0.5, use_kernel=True,
    )
    assert jnp.allclose(out_k[:, 0], ref[:, -1], atol=1e-5)


def test_decode_sliding_window():
    b, s, h, d = 1, 512, 2, 64
    w = 100
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(keys[0], (b, 1, h, d), jnp.float32)
    kc = jax.random.normal(keys[1], (b, h, s, d), jnp.float32)
    vc = jax.random.normal(keys[2], (b, h, s, d), jnp.float32)
    lengths = jnp.asarray([400], jnp.int32)
    out_k = flash_decode(q, kc, vc, lengths, softmax_scale=d**-0.5,
                         window_size=(w, 0), block_k=128)
    out_x = _decode_attention_xla(q, kc, vc, lengths, d**-0.5,
                                  window_size=(w, 0))
    assert jnp.allclose(out_k, out_x, atol=2e-5)


@pytest.mark.parametrize("sq", [1, 2])
def test_decode_kv_batch_idx_and_leftpad(sq):
    """FA3 long-tail cache params (≙ flash_api.h:100-150): per-query-batch
    cache-row remap (beam fan-out) and per-batch left padding. Reference =
    slicing the effective K/V into a contiguous per-query cache."""
    b, bc, hk, g, d, S = 3, 2, 2, 2, 64, 1024
    h = hk * g
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(keys[0], (b, sq, h, d), jnp.float32)
    kc = jax.random.normal(keys[1], (bc, hk, S, d), jnp.float32)
    vc = jax.random.normal(keys[2], (bc, hk, S, d), jnp.float32)
    kv_batch_idx = jnp.asarray([0, 1, 1], jnp.int32)  # beam 1+2 share row 1
    leftpad = jnp.asarray([64, 0, 300], jnp.int32)
    lengths = jnp.asarray([500, 257, 700], jnp.int32)
    scale = d ** -0.5

    out_k = flash_decode(q, kc, vc, lengths, softmax_scale=scale,
                         kv_batch_idx=kv_batch_idx, leftpad_k=leftpad,
                         block_k=256)

    # reference: materialize each query's effective contiguous cache
    kg = jnp.stack([
        jnp.roll(kc[kv_batch_idx[i]], -int(leftpad[i]), axis=1)
        for i in range(b)
    ])
    vg = jnp.stack([
        jnp.roll(vc[kv_batch_idx[i]], -int(leftpad[i]), axis=1)
        for i in range(b)
    ])
    out_x = _decode_attention_xla(q, kg, vg, lengths, scale)
    assert jnp.allclose(out_k, out_x, atol=2e-5), (
        float(jnp.abs(out_k - out_x).max())
    )
