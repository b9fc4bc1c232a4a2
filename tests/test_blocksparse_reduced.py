"""Blocksparse attention + calc_reduced_attn_scores + fused_softmax tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xhy_flash_attention_tpu.ops.flash_attention import (
    blockmask_to_dense,
    blocksparse_attention,
    calc_reduced_attn_scores,
    flash_blocksparse_attn_func,
)
from xhy_flash_attention_tpu.ops.flash_attention.fwd import flash_attention_fwd
from xhy_flash_attention_tpu.ops.flash_attention.reference import attention_ref


def _ref(q, k, v, dense_mask, causal, upcast=True):
    bias = jnp.where(dense_mask, 0.0, -jnp.inf).astype(jnp.float32)
    out, _ = attention_ref(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        attn_bias=bias, causal=causal, upcast=upcast, reorder_ops=not upcast,
    )
    return out.transpose(0, 2, 1, 3)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seqlen", [256, 384])
@pytest.mark.parametrize("bm_heads", [1, 4])
def test_blocksparse_fwd_bwd(causal, seqlen, bm_heads):
    rng = np.random.default_rng(0)
    b, h, d, g = 2, 4, 64, 128
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, seqlen, d)), jnp.bfloat16)
        for _ in range(3)
    )
    nq = nk = -(-seqlen // g)
    bm = jnp.asarray(rng.integers(0, 2, (1, bm_heads, nq, nk)), jnp.int32)
    # keep the diagonal on so no row is fully masked
    bm = jnp.maximum(bm, jnp.eye(nq, nk, dtype=jnp.int32)[None, None])

    out = blocksparse_attention(q, k, v, bm, block_size=g, causal=causal)
    dense = blockmask_to_dense(bm, seqlen, seqlen, g)
    out_ref = _ref(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        dense, causal,
    )
    out_lp = _ref(q, k, v, dense, causal, upcast=False)
    err = jnp.abs(out.astype(jnp.float32) - out_ref).max()
    err_lp = jnp.abs(out_lp.astype(jnp.float32) - out_ref).max()
    assert err <= 2 * err_lp + 1e-5, (float(err), float(err_lp))

    do = jnp.asarray(rng.standard_normal(out.shape), jnp.bfloat16)
    grads = jax.grad(
        lambda q, k, v: (
            blocksparse_attention(q, k, v, bm, block_size=g, causal=causal)
            * do
        ).astype(jnp.float32).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    grads_ref = jax.grad(
        lambda q, k, v: (
            _ref(q.astype(jnp.float32), k.astype(jnp.float32),
                 v.astype(jnp.float32), dense, causal) * do
        ).astype(jnp.float32).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    grads_lp = jax.grad(
        lambda q, k, v: (
            _ref(q, k, v, dense, causal, upcast=False) * do
        ).astype(jnp.float32).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for gk_, gr, gl, name in zip(grads, grads_ref, grads_lp, "qkv"):
        e = jnp.abs(gk_.astype(jnp.float32) - gr.astype(jnp.float32)).max()
        el = jnp.abs(gl.astype(jnp.float32) - gr.astype(jnp.float32)).max()
        assert e <= 2 * el + 1e-4, (name, float(e), float(el))


def test_blocksparse_packed_wrapper():
    rng = np.random.default_rng(1)
    b, s, h, d, g = 1, 256, 2, 64, 128
    qkv = jnp.asarray(rng.standard_normal((b, s, 3, h, d)), jnp.bfloat16)
    bm = jnp.ones((1, 1, s // g, s // g), jnp.int32)
    out = flash_blocksparse_attn_func(qkv, bm, causal=True, block_size=g)
    assert out.shape == (b, s, h, d)
    # all-on mask == plain causal attention
    from xhy_flash_attention_tpu import flash_attn_func
    q, k, v = (qkv[:, :, i] for i in range(3))
    expect = flash_attn_func(q, k, v, causal=True)
    # one-bf16-ulp tolerance: blocksparse runs the serialized softmax path
    # while plain causal uses the zero-seeded deferred shift
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expect, np.float32),
        atol=2e-2, rtol=2e-2,
    )


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("gqa", [1, 2])
def test_calc_reduced_attn_scores(causal, gqa):
    rng = np.random.default_rng(2)
    b, h, s, d = 2, 4, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h // gqa, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h // gqa, s, d)), jnp.float32)
    _, lse = flash_attention_fwd(q, k, v, sm_scale=d ** -0.5, causal=causal)
    red = calc_reduced_attn_scores(q, k, lse, causal=causal)
    assert red.shape == (b, h, s)

    # reference: softmax probabilities summed over queries
    kk = jnp.repeat(k, gqa, axis=1)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, kk) * (d ** -0.5)
    if causal:
        rows = jnp.arange(s)[:, None]
        cols = jnp.arange(s)[None, :]
        scores = jnp.where(cols > rows, -jnp.inf, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    expect = probs.sum(axis=2)
    np.testing.assert_allclose(
        np.asarray(red), np.asarray(expect), atol=1e-3, rtol=1e-3
    )


def test_fused_softmax():
    from xhy_flash_attention_tpu.ops.fused_softmax import (
        FusedScaleMaskSoftmax,
        scaled_masked_softmax,
        scaled_upper_triang_masked_softmax,
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 4, 64, 64)), jnp.bfloat16)
    mask = jnp.asarray(rng.integers(0, 2, (2, 1, 64, 64)), bool)

    out = scaled_masked_softmax(x.astype(jnp.float32), mask, 0.5)
    s = jnp.where(mask, -10000.0, x.astype(jnp.float32) * 0.5)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jax.nn.softmax(s, -1)), atol=1e-6
    )

    out = scaled_upper_triang_masked_softmax(x.astype(jnp.float32), 1.0)
    rows = np.arange(64)[:, None]
    cols = np.arange(64)[None, :]
    s = jnp.where(jnp.asarray(cols > rows), -10000.0, x.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jax.nn.softmax(s, -1)), atol=1e-6
    )

    m = FusedScaleMaskSoftmax(input_in_bf16=True, attn_mask_type="causal",
                              softmax_in_fp32=True, scale=2.0)
    out = m(x)
    assert out.dtype == x.dtype
