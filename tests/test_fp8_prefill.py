"""FP8 (e4m3) prefill attention forward with per-head descale.

≙ the reference FA3 fp8 forward (csrc/flash_attn_v3/flash_api.h:69-78):
q/k/v arrive as float8_e4m3fn with (b, hk) fp32 q/k/v_descale factors.
Contract: on the DEQUANTIZED inputs (the values the kernel effectively
sees), kernel error vs an fp32 reference stays within 2x the error of the
low-precision reorder-ops baseline — the same golden contract as the bf16
kernels. A second check bounds the end-to-end quantization quality vs the
bf16 kernel on the original (pre-quantization) tensors.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xhy_flash_attention_tpu import flash_attn_fp8_func, flash_attn_func
from xhy_flash_attention_tpu.ops.flash_attention.reference import attention_ref
from xhy_flash_attention_tpu.ops.quant import quantize_fp8_per_head

from test_flash_attn import check_contract

FP8 = jnp.float8_e4m3fn


def _make_fp8_inputs(key, b, sq, sk, h, hk, d, scale_spread=True):
    """bf16-ish tensors with per-head magnitude spread (so descale matters),
    quantized per (b, hk) group."""
    ks = jax.random.split(key, 4)
    def gen(kk, s, nh):
        x = jax.random.normal(kk, (b, s, nh, d), jnp.float32)
        if scale_spread:
            # per-head magnitudes spanning ~30x: uniform scales would hide
            # descale-indexing bugs
            mags = 0.2 * (1.0 + jnp.arange(nh, dtype=jnp.float32) * 29.0 / max(nh - 1, 1))
            x = x * mags[None, None, :, None]
        return x
    q = gen(ks[0], sq, h)
    k = gen(ks[1], sk, hk)
    v = gen(ks[2], sk, hk)
    q8, qd = quantize_fp8_per_head(q, hk)
    k8, kd = quantize_fp8_per_head(k)
    v8, vd = quantize_fp8_per_head(v)
    return (q8, k8, v8), (qd, kd, vd)


def _deq(x8, dsc, hk):
    b, s, h, d = x8.shape
    g = h // hk
    return (x8.astype(jnp.float32).reshape(b, s, hk, g, d)
            * dsc[:, None, :, None, None]).reshape(b, s, h, d)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("d", [64, 128])
@pytest.mark.parametrize(
    "seqlen_q,seqlen_k,h,hk",
    [(128, 128, 3, 3), (257, 257, 2, 2), (113, 203, 2, 2), (256, 256, 8, 2)],
)
def test_fp8_prefill_contract(seqlen_q, seqlen_k, h, hk, d, causal):
    b = 2
    (q8, k8, v8), (qd, kd, vd) = _make_fp8_inputs(
        jax.random.PRNGKey(0), b, seqlen_q, seqlen_k, h, hk, d
    )
    out, lse = flash_attn_fp8_func(
        q8, k8, v8, qd, kd, vd, causal=causal, return_lse=True
    )
    assert out.dtype == jnp.bfloat16

    # the values the kernel effectively computes on
    qf = _deq(q8, qd, hk)
    kf = _deq(k8, kd, hk)
    vf = _deq(v8, vd, hk)
    out_ref, _ = attention_ref(qf, kf, vf, causal=causal, upcast=True)
    out_lp, _ = attention_ref(
        qf.astype(jnp.bfloat16), kf.astype(jnp.bfloat16),
        vf.astype(jnp.bfloat16), causal=causal, upcast=False,
        reorder_ops=True,
    )
    check_contract(out, out_ref, out_lp, "fp8 out")

    # LSE of the descaled scores (≙ reference softmax_lse semantics) under
    # the same 2x contract: with the wide per-head magnitudes the raw
    # scores reach O(100), so bf16 input rounding alone moves the lse by
    # O(0.1) — the low-precision baseline sets the yardstick.
    def lse_of(qx, kx):
        s = jnp.einsum(
            "bshd,bthd->bhst", qx.astype(jnp.float32),
            jnp.repeat(kx, h // hk, axis=2).astype(jnp.float32),
        ) * (d ** -0.5)
        if causal:
            rows = jnp.arange(seqlen_q)[:, None]
            cols = jnp.arange(seqlen_k)[None, :]
            s = jnp.where(cols <= rows + (seqlen_k - seqlen_q), s, -jnp.inf)
        return jax.scipy.special.logsumexp(s, axis=-1)

    lse_ref = lse_of(qf, kf)
    lse_lp = lse_of(qf.astype(jnp.bfloat16), kf.astype(jnp.bfloat16))
    check_contract(lse, lse_ref, lse_lp, "fp8 lse", atol=1e-3)


def test_fp8_prefill_quality_vs_bf16():
    """End-to-end quantization quality: fp8 kernel on quantized inputs vs
    the bf16 kernel on the original tensors (quantization noise only)."""
    b, s, h, hk, d = 2, 256, 4, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, hk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, hk, d), jnp.float32)
    q8, qd = quantize_fp8_per_head(q, hk)
    k8, kd = quantize_fp8_per_head(k)
    v8, vd = quantize_fp8_per_head(v)
    out8 = flash_attn_fp8_func(q8, k8, v8, qd, kd, vd, causal=True)
    out16 = flash_attn_func(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), causal=True,
    )
    err = float(jnp.max(jnp.abs(out8.astype(jnp.float32)
                                - out16.astype(jnp.float32))))
    # e4m3 has a ~6% relative step at these magnitudes; attention averaging
    # keeps the output error well under one bf16-ish ulp of the max value
    assert err < 0.15, err


def test_fp8_prefill_ppl_delta():
    """WikiText-style Δppl budget (≙ BASELINE.json "Δppl ≤ 0.05"): a
    next-token readout over the attention output must give the same
    perplexity whether prefill attention ran in fp8 or bf16."""
    b, s, h, hk, d, vocab = 2, 256, 4, 2, 64, 128
    ks = jax.random.split(jax.random.PRNGKey(11), 5)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, hk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, hk, d), jnp.float32)
    w = jax.random.normal(ks[3], (h * d, vocab), jnp.float32) * 0.3
    tgt = jax.random.randint(ks[4], (b, s), 0, vocab)

    def ppl(out):
        logits = out.astype(jnp.float32).reshape(b, s, h * d) @ w
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1).mean()
        return float(jnp.exp(nll))

    q8, qd = quantize_fp8_per_head(q, hk)
    k8, kd = quantize_fp8_per_head(k)
    v8, vd = quantize_fp8_per_head(v)
    p8 = ppl(flash_attn_fp8_func(q8, k8, v8, qd, kd, vd, causal=True))
    p16 = ppl(flash_attn_func(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), causal=True,
    ))
    # same convention as test_quant_ppl: the 0.05 absolute budget assumes
    # WikiText-scale ppl (~10); scale it to this task's ppl magnitude
    tol = max(0.05, 0.01 * p16)
    assert abs(p8 - p16) <= tol, (p8, p16, tol)


def test_fp8_prefill_window_softcap():
    b, s, h, d = 1, 384, 2, 64
    (q8, k8, v8), (qd, kd, vd) = _make_fp8_inputs(
        jax.random.PRNGKey(5), b, s, s, h, h, d
    )
    for kwargs in ({"window_size": (64, 0)}, {"softcap": 30.0, "causal": True}):
        out = flash_attn_fp8_func(q8, k8, v8, qd, kd, vd, **kwargs)
        qf, kf, vf = _deq(q8, qd, h), _deq(k8, kd, h), _deq(v8, vd, h)
        out_ref, _ = attention_ref(qf, kf, vf, upcast=True, **kwargs)
        out_lp, _ = attention_ref(
            qf.astype(jnp.bfloat16), kf.astype(jnp.bfloat16),
            vf.astype(jnp.bfloat16), upcast=False, reorder_ops=True, **kwargs
        )
        check_contract(out, out_ref, out_lp, f"fp8 {kwargs}")


def test_fp8_default_descale_is_identity():
    """descale=None must equal descale=ones."""
    b, s, h, d = 1, 128, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    mk = lambda kk, nh: (jax.random.normal(kk, (b, s, nh, d), jnp.float32)
                         .astype(FP8))
    q8, k8, v8 = mk(ks[0], h), mk(ks[1], h), mk(ks[2], h)
    ones = jnp.ones((b, h), jnp.float32)
    a = flash_attn_fp8_func(q8, k8, v8, causal=True)
    bb = flash_attn_fp8_func(q8, k8, v8, ones, ones, ones, causal=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_fp8_rejects_bias_dropout():
    b, s, h, d = 1, 128, 2, 64
    from xhy_flash_attention_tpu.ops.flash_attention.fwd import (
        flash_attention_fwd,
    )
    x = jnp.zeros((b, h, s, d), FP8)
    with pytest.raises(AssertionError):
        flash_attention_fwd(
            x, x, x, bias=jnp.zeros((b, h, s, s), jnp.float32),
            sm_scale=0.125,
        )
    with pytest.raises(AssertionError):
        flash_attention_fwd(x, x, x, sm_scale=0.125, dropout_p=0.1,
                            dropout_seed=jnp.int32(0))
