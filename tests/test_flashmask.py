"""FlashMask correctness vs dense-mask reference.

Mirrors the reference's numerical contract (tests/test_flash_attn.py:420,427):
kernel error vs an fp32 reference must be ≤ 2× the error of a same-math
low-precision baseline.  The dense mask is materialized from the flashmask
index vectors by flashmask_to_dense and fed to the pure-JAX attention_ref.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xhy_flash_attention_tpu.ops.flash_attention import (
    causal_document_mask,
    flashmask_attention,
    flashmask_to_dense,
    global_sliding_window_mask,
    sliding_window_mask,
)
from xhy_flash_attention_tpu.ops.flash_attention.reference import attention_ref


def _mask_ref_attention(q, k, v, dense_mask, causal, upcast=True):
    """attention_ref with an arbitrary dense boolean mask folded in as bias.

    q/k/v here are (b, h, s, d); attention_ref wants (b, s, h, d). The causal
    component is already baked into dense_mask by flashmask_to_dense.
    """
    bias = jnp.where(dense_mask, 0.0, -jnp.inf).astype(jnp.float32)
    out, _ = attention_ref(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        attn_bias=bias, causal=False, upcast=upcast, reorder_ops=not upcast,
    )
    return out.transpose(0, 2, 1, 3)


def _check_2x_contract(out, out_ref, out_lp, label=""):
    err = jnp.abs(out - out_ref).max()
    err_lp = jnp.abs(out_lp - out_ref).max()
    assert err <= 2 * err_lp + 1e-5, (label, float(err), float(err_lp))


def _random_causal_indices(rng, b, hm, sk, nv):
    """Random valid causal flashmask indices (LTStart [, LTEnd])."""
    lts = rng.integers(0, sk + 1, (b, hm, sk, 1))
    # LTStart must be > column index for the diagonal to stay visible in
    # typical use; allow arbitrary here (kernel must handle fully-masked rows)
    if nv == 1:
        return jnp.asarray(lts, jnp.int32)
    lte = np.minimum(lts + rng.integers(0, sk, (b, hm, sk, 1)), sk)
    return jnp.asarray(np.concatenate([lts, lte], -1), jnp.int32)


def _random_full_indices(rng, b, hm, sk, nv):
    if nv == 2:
        # [LTStart, UTEnd] with UTEnd <= LTStart (else everything masked)
        lts = rng.integers(0, sk + 1, (b, hm, sk, 1))
        ute = rng.integers(0, lts + 1)
        return jnp.asarray(np.concatenate([lts, ute], -1), jnp.int32)
    lts = rng.integers(0, sk + 1, (b, hm, sk, 1))
    lte = np.minimum(lts + rng.integers(0, sk // 2, (b, hm, sk, 1)), sk)
    uts = rng.integers(0, sk + 1, (b, hm, sk, 1))
    ute = np.minimum(uts + rng.integers(0, sk // 2, (b, hm, sk, 1)), sk)
    return jnp.asarray(np.concatenate([lts, lte, uts, ute], -1), jnp.int32)


@pytest.mark.parametrize("causal,nv", [(True, 1), (True, 2), (False, 2), (False, 4)])
@pytest.mark.parametrize("seqlen", [256, 384])
@pytest.mark.parametrize("hm", [1, 4])
def test_flashmask_fwd(causal, nv, seqlen, hm):
    rng = np.random.default_rng(0)
    b, h, d = 2, 4, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, seqlen, d)), jnp.bfloat16)
        for _ in range(3)
    )
    gen = _random_causal_indices if causal else _random_full_indices
    idx = gen(rng, b, hm, seqlen, nv)

    out = flashmask_attention(q, k, v, idx, causal=causal)
    dense = flashmask_to_dense(idx, seqlen, causal)
    out_ref = _mask_ref_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        dense, causal, upcast=True,
    )
    out_lp = _mask_ref_attention(q, k, v, dense, causal, upcast=False)
    _check_2x_contract(
        out.astype(jnp.float32), out_ref, out_lp.astype(jnp.float32),
        f"fwd causal={causal} nv={nv}",
    )


@pytest.mark.parametrize("causal,nv", [(True, 2), (False, 4)])
def test_flashmask_grads(causal, nv):
    rng = np.random.default_rng(1)
    b, h, s, d = 1, 2, 256, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
        for _ in range(3)
    )
    gen = _random_causal_indices if causal else _random_full_indices
    idx = gen(rng, b, 1, s, nv)
    dense = flashmask_to_dense(idx, s, causal)
    do = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)

    def loss_kernel(q, k, v):
        return (flashmask_attention(q, k, v, idx, causal=causal) * do).sum()

    def loss_ref(q, k, v, upcast):
        return (_mask_ref_attention(q, k, v, dense, causal, upcast) * do).sum()

    grads = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(
        lambda q, k, v: loss_ref(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), True,
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    grads_lp = jax.grad(
        lambda q, k, v: loss_ref(q, k, v, False), argnums=(0, 1, 2)
    )(q, k, v)
    for g, gr, gl, name in zip(grads, grads_ref, grads_lp, "qkv"):
        _check_2x_contract(
            g.astype(jnp.float32), gr.astype(jnp.float32),
            gl.astype(jnp.float32), f"d{name}",
        )


def test_flashmask_fully_masked_rows():
    """Rows with every key masked must produce out = 0 (empty-row contract,
    ≙ flash_fwd_kernel.h:509-514)."""
    b, h, s, d = 1, 1, 256, 64
    rng = np.random.default_rng(2)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        for _ in range(3)
    )
    # LTStart = 0 everywhere: every (row >= 0) masked in causal mode
    idx = jnp.zeros((b, 1, s, 1), jnp.int32)
    out = flashmask_attention(q, k, v, idx, causal=True)
    assert jnp.allclose(out, 0.0), float(jnp.abs(out).max())


def test_flashmask_matches_causal_when_trivial():
    """LTStart = seqlen (no extra masking) must equal plain causal attention."""
    from xhy_flash_attention_tpu import flash_attn_func

    b, h, s, d = 2, 4, 256, 64
    rng = np.random.default_rng(3)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        for _ in range(3)
    )
    idx = jnp.full((b, 1, s, 1), s, jnp.int32)
    out_fm = flashmask_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), idx, causal=True,
    ).transpose(0, 2, 1, 3)
    out = flash_attn_func(q, k, v, causal=True)
    # one-bf16-ulp tolerance: flashmask runs the serialized softmax path
    # while plain causal uses the zero-seeded deferred shift — same math,
    # different accumulation order
    np.testing.assert_allclose(
        np.asarray(out_fm, np.float32), np.asarray(out, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_mask_constructors():
    """Constructor helpers produce the expected dense semantics."""
    b, s, w, g = 2, 128, 16, 8
    doc = jnp.asarray(
        np.repeat(np.arange(4), s // 4)[None].repeat(b, 0), jnp.int32
    )
    dense = flashmask_to_dense(causal_document_mask(doc), s, causal=True)
    rows = np.arange(s)[:, None]
    cols = np.arange(s)[None, :]
    docs = np.asarray(doc[0])
    expect = (cols <= rows) & (docs[rows] == docs[cols])
    np.testing.assert_array_equal(np.asarray(dense[0, 0]), expect)

    dense = flashmask_to_dense(sliding_window_mask(b, s, w), s, causal=True)
    expect = (cols <= rows) & (cols > rows - w)
    np.testing.assert_array_equal(np.asarray(dense[0, 0]), expect)

    dense = flashmask_to_dense(
        global_sliding_window_mask(b, s, w, g), s, causal=True
    )
    expect = (cols <= rows) & ((cols > rows - w) | (cols < g))
    np.testing.assert_array_equal(np.asarray(dense[0, 0]), expect)
