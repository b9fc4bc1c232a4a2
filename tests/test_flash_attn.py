"""Core flash-attention numerics tests.

Replicates the reference's golden contract (tests/test_flash_attn.py:420,427):
run the kernel in low precision, an fp32-upcast reference, and a deliberately
low-precision reference (`upcast=False, reorder_ops=True`); assert

    |out - ref|_max <= 2 * |out_lowprec - ref|_max  (+ tiny atol)

for the output and every gradient. No fixed tolerances.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xhy_flash_attention_tpu import flash_attn_func, flash_attn_varlen_func
from xhy_flash_attention_tpu.ops.flash_attention import BlockSizes
from xhy_flash_attention_tpu.ops.flash_attention.reference import attention_ref

ATOL = 1e-4


def _rand(key, shape, dtype):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


def check_contract(out, ref, lp, what, mult=2.0, atol=ATOL):
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    err_lp = jnp.max(jnp.abs(lp.astype(jnp.float32) - ref.astype(jnp.float32)))
    assert err <= mult * err_lp + atol, (
        f"{what}: err={err:.6g} > {mult}x lowprec err={err_lp:.6g}"
    )


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("d", [64, 128])
@pytest.mark.parametrize(
    "seqlen_q,seqlen_k",
    [(128, 128), (257, 257), (113, 203), (384, 256)],
)
def test_flash_attn_output_and_grads(seqlen_q, seqlen_k, d, causal, dtype):
    b, h = 2, 3
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    q = _rand(keys[0], (b, seqlen_q, h, d), dtype)
    k = _rand(keys[1], (b, seqlen_k, h, d), dtype)
    v = _rand(keys[2], (b, seqlen_k, h, d), dtype)
    do = _rand(keys[3], (b, seqlen_q, h, d), dtype)

    f = functools.partial(flash_attn_func, causal=causal)
    out, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(do)

    ref_f = functools.partial(
        attention_ref, causal=causal, upcast=True
    )
    out_ref, vjp_ref = jax.vjp(lambda q, k, v: ref_f(q, k, v)[0], q, k, v)
    dq_ref, dk_ref, dv_ref = vjp_ref(do)

    lp_f = functools.partial(
        attention_ref, causal=causal, upcast=False, reorder_ops=True
    )
    out_lp, vjp_lp = jax.vjp(lambda q, k, v: lp_f(q, k, v)[0], q, k, v)
    dq_lp, dk_lp, dv_lp = vjp_lp(do)

    check_contract(out, out_ref, out_lp, "out")
    check_contract(dq, dq_ref, dq_lp, "dq")
    check_contract(dk, dk_ref, dk_lp, "dk")
    check_contract(dv, dv_ref, dv_lp, "dv")


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attn_gqa(causal):
    b, sq, sk, h, hk, d = 2, 128, 128, 8, 2, 64
    dtype = jnp.bfloat16
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    q = _rand(keys[0], (b, sq, h, d), dtype)
    k = _rand(keys[1], (b, sk, hk, d), dtype)
    v = _rand(keys[2], (b, sk, hk, d), dtype)
    do = _rand(keys[3], (b, sq, h, d), dtype)

    f = functools.partial(flash_attn_func, causal=causal)
    out, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(do)
    ref_f = lambda q, k, v: attention_ref(q, k, v, causal=causal, upcast=True)[0]
    out_ref, vjp_ref = jax.vjp(ref_f, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp_ref(do)
    lp_f = lambda q, k, v: attention_ref(
        q, k, v, causal=causal, upcast=False, reorder_ops=True
    )[0]
    out_lp, vjp_lp = jax.vjp(lp_f, q, k, v)
    dq_lp, dk_lp, dv_lp = vjp_lp(do)
    check_contract(out, out_ref, out_lp, "out")
    check_contract(dq, dq_ref, dq_lp, "dq")
    check_contract(dk, dk_ref, dk_lp, "dk")
    check_contract(dv, dv_ref, dv_lp, "dv")


def test_flash_attn_local_window():
    b, s, h, d = 1, 256, 2, 64
    dtype = jnp.bfloat16
    window = (37, 13)
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    q = _rand(keys[0], (b, s, h, d), dtype)
    k = _rand(keys[1], (b, s, h, d), dtype)
    v = _rand(keys[2], (b, s, h, d), dtype)
    do = _rand(keys[3], (b, s, h, d), dtype)
    f = functools.partial(flash_attn_func, window_size=window)
    out, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(do)
    ref_f = lambda q, k, v: attention_ref(
        q, k, v, window_size=window, upcast=True
    )[0]
    out_ref, vjp_ref = jax.vjp(ref_f, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp_ref(do)
    lp_f = lambda q, k, v: attention_ref(
        q, k, v, window_size=window, upcast=False, reorder_ops=True
    )[0]
    out_lp, vjp_lp = jax.vjp(lp_f, q, k, v)
    dq_lp, dk_lp, dv_lp = vjp_lp(do)
    check_contract(out, out_ref, out_lp, "out")
    check_contract(dq, dq_ref, dq_lp, "dq")
    check_contract(dk, dk_ref, dk_lp, "dk")
    check_contract(dv, dv_ref, dv_lp, "dv")


def test_flash_attn_softcap():
    b, s, h, d = 1, 128, 2, 64
    dtype = jnp.bfloat16
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    q = _rand(keys[0], (b, s, h, d), dtype)
    k = _rand(keys[1], (b, s, h, d), dtype)
    v = _rand(keys[2], (b, s, h, d), dtype)
    out = flash_attn_func(q, k, v, causal=True, softcap=30.0)
    out_ref, _ = attention_ref(q, k, v, causal=True, softcap=30.0, upcast=True)
    out_lp, _ = attention_ref(
        q, k, v, causal=True, softcap=30.0, upcast=False, reorder_ops=True
    )
    check_contract(out, out_ref, out_lp, "out")


def test_flash_attn_bias():
    b, s, h, d = 2, 128, 2, 64
    dtype = jnp.bfloat16
    keys = jax.random.split(jax.random.PRNGKey(4), 5)
    q = _rand(keys[0], (b, s, h, d), dtype)
    k = _rand(keys[1], (b, s, h, d), dtype)
    v = _rand(keys[2], (b, s, h, d), dtype)
    bias = _rand(keys[3], (b, h, s, s), jnp.float32)
    do = _rand(keys[4], (b, s, h, d), dtype)
    from xhy_flash_attention_tpu import flash_attention

    qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    f = lambda qt, kt, vt, bias: jnp.swapaxes(
        flash_attention(qt, kt, vt, bias), 1, 2
    )
    out, vjp = jax.vjp(f, qt, kt, vt, bias)
    dq, dk, dv, dbias = vjp(do)
    ref_f = lambda q, k, v, bias: attention_ref(
        q, k, v, attn_bias=bias, upcast=True
    )[0]
    out_ref, vjp_ref = jax.vjp(ref_f, q, k, v, bias)
    dq_ref, dk_ref, dv_ref, dbias_ref = vjp_ref(do)
    lp_f = lambda q, k, v, bias: attention_ref(
        q, k, v, attn_bias=bias, upcast=False, reorder_ops=True
    )[0]
    out_lp, vjp_lp = jax.vjp(lp_f, q, k, v, bias)
    dq_lp, dk_lp, dv_lp, dbias_lp = vjp_lp(do)
    check_contract(out, out_ref, out_lp, "out")
    check_contract(jnp.swapaxes(dq, 1, 2), dq_ref, dq_lp, "dq")
    check_contract(jnp.swapaxes(dk, 1, 2), dk_ref, dk_lp, "dk")
    check_contract(jnp.swapaxes(dv, 1, 2), dv_ref, dv_lp, "dv")
    check_contract(dbias, dbias_ref, dbias_lp, "dbias")


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attn_varlen(causal):
    """Packed varlen vs per-sequence dense reference."""
    h, d = 2, 64
    dtype = jnp.bfloat16
    lens = [37, 128, 200, 19]
    total = sum(lens)
    cu = jnp.asarray(np.cumsum([0] + lens), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    q = _rand(keys[0], (total, h, d), dtype)
    k = _rand(keys[1], (total, h, d), dtype)
    v = _rand(keys[2], (total, h, d), dtype)
    out = flash_attn_varlen_func(
        q, k, v, cu, cu, max(lens), max(lens), causal=causal
    )
    # reference: run each sequence separately
    for i, (s0, s1) in enumerate(zip(cu[:-1], cu[1:])):
        s0, s1 = int(s0), int(s1)
        ref, _ = attention_ref(
            q[None, s0:s1], k[None, s0:s1], v[None, s0:s1],
            causal=causal, upcast=True,
        )
        lp, _ = attention_ref(
            q[None, s0:s1], k[None, s0:s1], v[None, s0:s1],
            causal=causal, upcast=False, reorder_ops=True,
        )
        check_contract(out[s0:s1], ref[0], lp[0], f"seq{i}")


def test_flash_attn_race_condition():
    """Determinism: repeated runs must be bitwise identical (out and grads).

    ≙ reference test_flash_attn_race_condition (tests/test_flash_attn.py:798)
    — but on TPU determinism is structural (no atomics), so dQ is also exact.
    """
    b, s, h, d = 1, 256, 2, 64
    keys = jax.random.split(jax.random.PRNGKey(6), 4)
    q = _rand(keys[0], (b, s, h, d), jnp.bfloat16)
    k = _rand(keys[1], (b, s, h, d), jnp.bfloat16)
    v = _rand(keys[2], (b, s, h, d), jnp.bfloat16)
    do = _rand(keys[3], (b, s, h, d), jnp.bfloat16)
    f = jax.jit(
        lambda q, k, v, do: jax.vjp(
            functools.partial(flash_attn_func, causal=True), q, k, v
        )[1](do)
    )
    out0 = flash_attn_func(q, k, v, causal=True)
    g0 = f(q, k, v, do)
    for _ in range(3):
        out = flash_attn_func(q, k, v, causal=True)
        g = f(q, k, v, do)
        assert jnp.array_equal(out0, out)
        for a, b_ in zip(g0, g):
            assert jnp.array_equal(a, b_)


def test_empty_rows_lse_inf():
    """Rows with no valid keys: out = 0, lse = +inf
    (≙ flash_fwd_kernel.h:509-514)."""
    from xhy_flash_attention_tpu import flash_attention

    # seqlen_q > seqlen_k with causal bottom-right alignment: row r may see
    # cols <= r + sk - sq, so rows 0..sq-sk-1 have no valid keys.
    b, h, sq, sk, d = 1, 1, 128, 64, 64
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    q = _rand(keys[0], (b, h, sq, d), jnp.float32)
    k = _rand(keys[1], (b, h, sk, d), jnp.float32)
    v = _rand(keys[2], (b, h, sk, d), jnp.float32)
    out, lse = flash_attention(q, k, v, causal=True, return_lse=True)
    assert bool(jnp.all(out[0, 0, :64] == 0.0))
    assert bool(jnp.all(jnp.isinf(lse[0, 0, :64])))
    assert bool(jnp.all(jnp.isfinite(lse[0, 0, 64:])))


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attn_dropout(causal):
    """Dropout correctness: reconstruct the keep mask with the same
    position-keyed counter RNG and compare against the masked reference
    (≙ reference convert_flash_attn_S_to_softmax dropout checks,
    tests/test_flash_attn.py:218-301)."""
    from xhy_flash_attention_tpu.ops.flash_attention.common import (
        dropout_keep_mask,
    )

    b, s, h, d = 1, 256, 2, 64
    p = 0.17
    seed = jnp.int32(1234)
    dtype = jnp.bfloat16
    keys = jax.random.split(jax.random.PRNGKey(8), 4)
    q = _rand(keys[0], (b, s, h, d), dtype)
    k = _rand(keys[1], (b, s, h, d), dtype)
    v = _rand(keys[2], (b, s, h, d), dtype)
    do = _rand(keys[3], (b, s, h, d), dtype)

    # reconstruct the exact keep mask the kernel generates
    rows = jnp.arange(s, dtype=jnp.int32)[:, None]
    cols = jnp.arange(s, dtype=jnp.int32)[None, :]
    keep = jnp.stack(
        [
            jnp.stack(
                [
                    dropout_keep_mask(seed, jnp.int32(bi * h + hi), rows, cols, p)
                    for hi in range(h)
                ]
            )
            for bi in range(b)
        ]
    )  # (b, h, s, s)
    frac = float(1.0 - keep.mean())
    assert abs(frac - p) < 0.01, frac

    f = functools.partial(
        flash_attn_func, dropout_p=p, causal=causal, dropout_seed=seed
    )
    out, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(do)

    ref_f = lambda q, k, v: attention_ref(
        q, k, v, causal=causal, dropout_p=p, dropout_mask=keep, upcast=True
    )[0]
    out_ref, vjp_ref = jax.vjp(ref_f, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp_ref(do)
    lp_f = lambda q, k, v: attention_ref(
        q, k, v, causal=causal, dropout_p=p, dropout_mask=keep,
        upcast=False, reorder_ops=True,
    )[0]
    out_lp, vjp_lp = jax.vjp(lp_f, q, k, v)
    dq_lp, dk_lp, dv_lp = vjp_lp(do)
    check_contract(out, out_ref, out_lp, "out")
    check_contract(dq, dq_ref, dq_lp, "dq")
    check_contract(dk, dk_ref, dk_lp, "dk")
    check_contract(dv, dv_ref, dv_lp, "dv")


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attn_varlen_decoupled(causal):
    """Varlen with DIFFERENT q/k packings (cu_seqlens_q != cu_seqlens_k):
    per-sequence bottom-right-aligned causal, ≙ reference BlockInfo
    (csrc/flash_attn/src/block_info.h) and flash_attn_interface.py:454."""
    h, d = 2, 64
    dtype = jnp.bfloat16
    lens_q = [37, 100, 19]
    lens_k = [64, 80, 150]  # mix of lk > lq and lk < lq
    cu_q = jnp.asarray(np.cumsum([0] + lens_q), jnp.int32)
    cu_k = jnp.asarray(np.cumsum([0] + lens_k), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    q = _rand(keys[0], (sum(lens_q), h, d), dtype)
    k = _rand(keys[1], (sum(lens_k), h, d), dtype)
    v = _rand(keys[2], (sum(lens_k), h, d), dtype)
    out = flash_attn_varlen_func(
        q, k, v, cu_q, cu_k, max(lens_q), max(lens_k), causal=causal
    )
    for i in range(len(lens_q)):
        q0, q1 = int(cu_q[i]), int(cu_q[i + 1])
        k0, k1 = int(cu_k[i]), int(cu_k[i + 1])
        ref, _ = attention_ref(
            q[None, q0:q1], k[None, k0:k1], v[None, k0:k1],
            causal=causal, upcast=True,
        )
        lp, _ = attention_ref(
            q[None, q0:q1], k[None, k0:k1], v[None, k0:k1],
            causal=causal, upcast=False, reorder_ops=True,
        )
        check_contract(out[q0:q1], ref[0], lp[0], f"seq{i}")


def test_flash_attn_varlen_window():
    """Varlen + sliding window: the window must act on per-sequence local
    indices, not packed global offsets."""
    h, d = 2, 64
    dtype = jnp.bfloat16
    lens = [100, 170, 50]
    cu = jnp.asarray(np.cumsum([0] + lens), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(8), 3)
    q = _rand(keys[0], (sum(lens), h, d), dtype)
    k = _rand(keys[1], (sum(lens), h, d), dtype)
    v = _rand(keys[2], (sum(lens), h, d), dtype)
    win = (31, 0)
    out = flash_attn_varlen_func(
        q, k, v, cu, cu, max(lens), max(lens), causal=True, window_size=win
    )
    for i, (s0, s1) in enumerate(zip(cu[:-1], cu[1:])):
        s0, s1 = int(s0), int(s1)
        ref, _ = attention_ref(
            q[None, s0:s1], k[None, s0:s1], v[None, s0:s1],
            causal=True, window_size=win, upcast=True,
        )
        lp, _ = attention_ref(
            q[None, s0:s1], k[None, s0:s1], v[None, s0:s1],
            causal=True, window_size=win, upcast=False, reorder_ops=True,
        )
        check_contract(out[s0:s1], ref[0], lp[0], f"seq{i}")


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("d", [32, 64])
def test_flash_attn_bwd_varlen_overflow(d, causal):
    """≙ reference test_flash_attn_bwd_varlen_overflow
    (tests/test_flash_attn.py:934): sequences whose keys are much shorter
    than their queries (down to a single key) must not produce NaN in any
    gradient — the regression the reference guards is unmasked elements
    beyond seqlen_k poisoning dQ."""
    nheads = 5
    cu_q = jnp.asarray([0, 76, 110, 256], jnp.int32)
    cu_k = jnp.asarray([0, 1, 2, 3], jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(9), 4)
    q = _rand(keys[0], (256, nheads, d), jnp.bfloat16) * 3
    k = _rand(keys[1], (3, nheads, d), jnp.bfloat16) * 3
    v = _rand(keys[2], (3, nheads, d), jnp.bfloat16) * 3

    def f(q, k, v):
        return flash_attn_varlen_func(
            q, k, v, cu_q, cu_k, 256, 3, causal=causal
        ).astype(jnp.float32)

    out, vjp = jax.vjp(f, q, k, v)
    do = _rand(keys[3], out.shape, jnp.float32)
    dq, dk, dv = vjp(do)
    assert not bool(jnp.isnan(out).any())
    assert not bool(jnp.isnan(dq).any())
    assert not bool(jnp.isnan(dk).any())
    assert not bool(jnp.isnan(dv).any())


@pytest.mark.parametrize("bias_kind", ["2d", "per_head"])
def test_flash_attn_bias_gqa(bias_kind):
    """Bias gradients under GQA: exercises the dKV kernel's in-kernel group
    accumulation (grid over KV heads) with both a broadcast (1, 1, sq, sk)
    dbias (group-accumulated in place) and a per-query-head dbias."""
    b, s, h, hk, d = 2, 256, 4, 2, 64
    dtype = jnp.bfloat16
    keys = jax.random.split(jax.random.PRNGKey(11), 5)
    q = _rand(keys[0], (b, s, h, d), dtype)
    k = _rand(keys[1], (b, s, hk, d), dtype)
    v = _rand(keys[2], (b, s, hk, d), dtype)
    do = _rand(keys[3], (b, s, h, d), dtype)
    bias_shape = (s, s) if bias_kind == "2d" else (b, h, s, s)
    bias = _rand(keys[4], bias_shape, jnp.float32)

    from xhy_flash_attention_tpu import flash_attention

    def f(q, k, v, bias):
        qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
        return jnp.swapaxes(
            flash_attention(qt, kt, vt, bias, causal=True), 1, 2
        )

    out, vjp = jax.vjp(f, q, k, v, bias)
    dq, dk, dv, dbias = vjp(do)
    ref_f = lambda q, k, v, bias: attention_ref(
        q, k, v, attn_bias=bias, causal=True, upcast=True
    )[0]
    out_ref, vjp_ref = jax.vjp(ref_f, q, k, v, bias)
    dq_ref, dk_ref, dv_ref, dbias_ref = vjp_ref(do)
    lp_f = lambda q, k, v, bias: attention_ref(
        q, k, v, attn_bias=bias, causal=True, upcast=False, reorder_ops=True
    )[0]
    out_lp, vjp_lp = jax.vjp(lp_f, q, k, v, bias)
    dq_lp, dk_lp, dv_lp, dbias_lp = vjp_lp(do)
    check_contract(out, out_ref, out_lp, "out")
    check_contract(dq, dq_ref, dq_lp, "dq")
    check_contract(dk, dk_ref, dk_lp, "dk")
    check_contract(dv, dv_ref, dv_lp, "dv")
    check_contract(dbias.reshape(dbias_ref.shape), dbias_ref, dbias_lp,
                   "dbias")


def test_flash_attn_bias_broadcast_dropout():
    """Batch-broadcast trained bias streams the backward batch (chunked
    dbias accumulation): the per-chunk dropout salts must stay aligned
    with the unchunked forward — grads match the reference driven by the
    kernel's own keep mask."""
    from xhy_flash_attention_tpu import flash_attention
    from xhy_flash_attention_tpu.ops.flash_attention.common import (
        dropout_keep_mask,
    )

    b, s, h, d, p_drop, seed = 3, 256, 2, 64, 0.2, 7
    keys = jax.random.split(jax.random.PRNGKey(21), 5)
    q = _rand(keys[0], (b, s, h, d), jnp.bfloat16)
    k = _rand(keys[1], (b, s, h, d), jnp.bfloat16)
    v = _rand(keys[2], (b, s, h, d), jnp.bfloat16)
    do = _rand(keys[3], (b, s, h, d), jnp.bfloat16)
    bias = _rand(keys[4], (1, h, s, s), jnp.float32)

    def f(q, k, v, bias):
        qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
        return jnp.swapaxes(flash_attention(
            qt, kt, vt, bias, causal=True, dropout_p=p_drop,
            dropout_seed=seed), 1, 2)
    out, vjp = jax.vjp(f, q, k, v, bias)
    dq, dk, dv, dbias = vjp(do)
    assert dbias.shape == (1, h, s, s)

    rows = jnp.arange(s, dtype=jnp.int32)[:, None]
    cols = jnp.arange(s, dtype=jnp.int32)[None, :]
    keep = jnp.stack([
        jnp.stack([
            dropout_keep_mask(jnp.int32(seed), jnp.int32(bi * h + hi),
                              rows, cols, p_drop)
            for hi in range(h)
        ]) for bi in range(b)
    ])

    def mk_ref(upcast):
        return lambda q, k, v, bias: attention_ref(
            q, k, v, attn_bias=bias, causal=True, dropout_p=p_drop,
            dropout_mask=keep, upcast=upcast, reorder_ops=not upcast,
        )[0]

    out_ref, vjp_ref = jax.vjp(mk_ref(True), q, k, v, bias)
    grads_ref = vjp_ref(do)
    out_lp, vjp_lp = jax.vjp(mk_ref(False), q, k, v, bias)
    grads_lp = vjp_lp(do)
    check_contract(out, out_ref, out_lp, "out")
    for g, gr, gl, name in zip((dq, dk, dv, dbias), grads_ref, grads_lp,
                               ("dq", "dk", "dv", "dbias")):
        check_contract(g, gr, gl, name)


# Head-dim x seqlen breadth sweep (≙ reference tests/test_flash_attn.py:
# 333-345: a dtype x causal x hdim x seqlen cross-product over d in 32..256
# incl. the irregular 59/111 and odd seqlens). Full causal x hdim x
# {3 seqlen pairs} product — interpret mode keeps each case cheap; the
# pairs cover odd equal lengths, a cross-length prime pair, and a
# block-crossing 2:1 pair.
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "d", [32, 40, 59, 64, 80, 96, 111, 128, 160, 192, 224, 256]
)
@pytest.mark.parametrize(
    "seqlen_q,seqlen_k",
    [(97, 97), (91, 217), (256, 512)],
)
def test_flash_attn_hdim_seqlen_sweep(seqlen_q, seqlen_k, d, causal):
    dtype = jnp.bfloat16
    b, h = 1, 2
    keys = jax.random.split(jax.random.PRNGKey(12), 4)
    q = _rand(keys[0], (b, seqlen_q, h, d), dtype)
    k = _rand(keys[1], (b, seqlen_k, h, d), dtype)
    v = _rand(keys[2], (b, seqlen_k, h, d), dtype)
    do = _rand(keys[3], (b, seqlen_q, h, d), dtype)

    f = functools.partial(flash_attn_func, causal=causal)
    out, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(do)
    ref_f = functools.partial(attention_ref, causal=causal, upcast=True)
    out_ref, vjp_ref = jax.vjp(lambda q, k, v: ref_f(q, k, v)[0], q, k, v)
    dq_ref, dk_ref, dv_ref = vjp_ref(do)
    lp_f = functools.partial(
        attention_ref, causal=causal, upcast=False, reorder_ops=True
    )
    out_lp, vjp_lp = jax.vjp(lambda q, k, v: lp_f(q, k, v)[0], q, k, v)
    dq_lp, dk_lp, dv_lp = vjp_lp(do)
    check_contract(out, out_ref, out_lp, "out")
    check_contract(dq, dq_ref, dq_lp, "dq")
    check_contract(dk, dk_ref, dk_lp, "dk")
    check_contract(dv, dv_ref, dv_lp, "dv")


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("d", [64, 128])
def test_flash_attn_dropout_causal_hdim(d, causal):
    """Dropout x causal x head-dim product: the dropped-key renormalization
    must agree between kernel and reference given the same keep mask
    (recovered from the kernel's deterministic counter RNG)."""
    from xhy_flash_attention_tpu.ops.flash_attention.common import (
        dropout_keep_mask,
    )

    b, s, h = 1, 192, 2
    p_drop = 0.3
    seed = 1234
    keys = jax.random.split(jax.random.PRNGKey(13), 4)
    q = _rand(keys[0], (b, s, h, d), jnp.bfloat16)
    k = _rand(keys[1], (b, s, h, d), jnp.bfloat16)
    v = _rand(keys[2], (b, s, h, d), jnp.bfloat16)
    out = flash_attn_func(
        q, k, v, dropout_p=p_drop, causal=causal, dropout_seed=seed
    )
    # rebuild the exact keep mask the kernel generated
    rows = jnp.arange(s, dtype=jnp.int32)[:, None]
    cols = jnp.arange(s, dtype=jnp.int32)[None, :]
    keep = jnp.stack([
        jnp.stack([
            dropout_keep_mask(
                jnp.int32(seed), jnp.int32(bi * h + hi), rows, cols, p_drop
            )
            for hi in range(h)
        ])
        for bi in range(b)
    ])
    ref, _ = attention_ref(
        q, k, v, dropout_p=p_drop, dropout_mask=keep, causal=causal,
        upcast=True,
    )
    lp, _ = attention_ref(
        q, k, v, dropout_p=p_drop, dropout_mask=keep, causal=causal,
        upcast=False, reorder_ops=True,
    )
    check_contract(out, ref, lp, "out")


def test_return_attn_probs_s_dmask():
    """return_attn_probs S_dmask: probabilities match the reference and the
    dropout keep mask is recoverable as S_dmask >= 0 (≙ the reference's
    dropout test methodology, tests/test_flash_attn.py:218-301)."""
    b, s, h, d = 1, 192, 2, 64
    p_drop, seed = 0.25, 77
    keys = jax.random.split(jax.random.PRNGKey(14), 3)
    q = _rand(keys[0], (b, s, h, d), jnp.bfloat16)
    k = _rand(keys[1], (b, s, h, d), jnp.bfloat16)
    v = _rand(keys[2], (b, s, h, d), jnp.bfloat16)
    out, lse, s_dmask = flash_attn_func(
        q, k, v, dropout_p=p_drop, causal=True, dropout_seed=seed,
        return_attn_probs=True,
    )
    assert s_dmask.shape == (b, h, s, s)
    keep = np.asarray(s_dmask) >= 0
    probs = np.abs(np.asarray(s_dmask))
    ref, ref_probs = attention_ref(q, k, v, causal=True, upcast=True)
    np.testing.assert_allclose(
        probs, np.asarray(ref_probs), atol=3e-2, rtol=1e-2
    )
    # the recovered mask reproduces the kernel's dropout output
    ref_drop, _ = attention_ref(
        q, k, v, dropout_p=p_drop, dropout_mask=jnp.asarray(keep),
        causal=True, upcast=True,
    )
    err = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref_drop)))
    assert err < 5e-2, err


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("dropout_p", [0.0, 0.2])
@pytest.mark.parametrize("dq_variant", ["scratch", "workspace", "split"])
def test_flash_attn_merged_bwd_small_blocks(causal, dropout_p, dq_variant,
                                            monkeypatch):
    """Force multiple KV blocks (small tiles) so the single-pass backward
    runs (default tiles cover test seqlens in one block, which takes the
    split path): grads must match the reference contract, incl. GQA and
    dropout — for the VMEM dq-scratch variant, the fp32 HBM
    partials-workspace fallback, and the forced two-kernel split path."""
    from xhy_flash_attention_tpu import flash_attention
    from xhy_flash_attention_tpu.ops.flash_attention import bwd as bwd_mod
    from xhy_flash_attention_tpu.ops.flash_attention.common import (
        BlockSizes, dropout_keep_mask,
    )

    if dq_variant in ("workspace", "split"):
        monkeypatch.setattr(bwd_mod, "MERGED_DQ_SCRATCH_CAP", 0)
    if dq_variant == "split":
        monkeypatch.setattr(bwd_mod, "MERGED_DQ_WORKSPACE_CAP", 0)

    b, s, h, hk, d = 2, 384, 4, 2, 64
    bs = BlockSizes(block_q=128, block_k=128, block_q_dkv=128,
                    block_k_dkv=128, block_q_dq=128, block_k_dq=128)
    keys = jax.random.split(jax.random.PRNGKey(15), 4)
    q = _rand(keys[0], (b, s, h, d), jnp.bfloat16)
    k = _rand(keys[1], (b, s, hk, d), jnp.bfloat16)
    v = _rand(keys[2], (b, s, hk, d), jnp.bfloat16)
    do = _rand(keys[3], (b, s, h, d), jnp.bfloat16)
    seed = 99

    def f(q, k, v):
        qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
        return jnp.swapaxes(flash_attention(
            qt, kt, vt, causal=causal, dropout_p=dropout_p,
            dropout_seed=seed if dropout_p > 0 else None, block_sizes=bs,
        ), 1, 2)

    out, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(do)
    keep = None
    if dropout_p > 0:
        rows = jnp.arange(s, dtype=jnp.int32)[:, None]
        cols = jnp.arange(s, dtype=jnp.int32)[None, :]
        keep = jnp.stack([
            jnp.stack([
                dropout_keep_mask(jnp.int32(seed), jnp.int32(bi * h + hi),
                                  rows, cols, dropout_p)
                for hi in range(h)
            ]) for bi in range(b)
        ])
    ref_f = lambda q, k, v: attention_ref(
        q, k, v, causal=causal, dropout_p=dropout_p, dropout_mask=keep,
        upcast=True,
    )[0]
    out_ref, vjp_ref = jax.vjp(ref_f, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp_ref(do)
    lp_f = lambda q, k, v: attention_ref(
        q, k, v, causal=causal, dropout_p=dropout_p, dropout_mask=keep,
        upcast=False, reorder_ops=True,
    )[0]
    out_lp, vjp_lp = jax.vjp(lp_f, q, k, v)
    dq_lp, dk_lp, dv_lp = vjp_lp(do)
    check_contract(out, out_ref, out_lp, "out")
    check_contract(dq, dq_ref, dq_lp, "dq")
    check_contract(dk, dk_ref, dk_lp, "dk")
    check_contract(dv, dv_ref, dv_lp, "dv")


def test_flat_causal_iteration_matches_rectangular():
    """The flat lower-triangle grid (fwd.py flat_causal) must engage for
    pure aligned causal and reproduce the rectangular grid bitwise —
    identical per-row KV visit order means identical accumulation order."""
    import xhy_flash_attention_tpu.ops.flash_attention.fwd as F

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    b, h, hk, s, d = 2, 4, 2, 1024, 64
    bs = BlockSizes(block_q=256, block_k=256)
    q = _rand(kq, (b, h, s, d), jnp.bfloat16)
    k = _rand(kk, (b, hk, s, d), jnp.bfloat16)
    v = _rand(kv, (b, hk, s, d), jnp.bfloat16)

    grids = []
    orig = F.pl.pallas_call

    def spy(kernel, *a, grid_spec=None, **kw):
        grids.append(grid_spec.grid)
        return orig(kernel, *a, grid_spec=grid_spec, **kw)

    outs = {}
    try:
        F.pl.pallas_call = spy
        for flat in (False, True):
            old = F.FLAT_CAUSAL
            F.FLAT_CAUSAL = flat
            try:
                o, lse = F.flash_attention_fwd(
                    q, k, v, sm_scale=d**-0.5, causal=True, block_sizes=bs
                )
                od, _ = F.flash_attention_fwd(
                    q, k, v, sm_scale=d**-0.5, causal=True, dropout_p=0.2,
                    dropout_seed=jnp.int32(7), block_sizes=bs
                )
            finally:
                F.FLAT_CAUSAL = old
            outs[flat] = (np.asarray(o), np.asarray(lse), np.asarray(od))
    finally:
        F.pl.pallas_call = orig

    # nq = 4 -> 10 lower-triangle pairs vs 4x4 rectangular
    assert grids[2][2:] == (10,), grids
    assert grids[0][2:] == (4, 4), grids
    for a, bv, name in zip(outs[False], outs[True], ["out", "lse", "out_drop"]):
        assert np.array_equal(a, bv), name


def test_flat_causal_bwd_matches_rectangular():
    """Merged-backward flat lower-triangle grid (bwd.py flat_causal) must
    be bitwise-identical to the rectangular grid (same per-row KV order),
    including GQA group accumulation and dropout."""
    import xhy_flash_attention_tpu.ops.flash_attention.bwd as B
    import xhy_flash_attention_tpu.ops.flash_attention.fwd as F

    key = jax.random.PRNGKey(1)
    kq, kk, kv, kd = jax.random.split(key, 4)
    b, h, hk, s, d = 2, 4, 2, 1024, 64
    bs = BlockSizes(block_q=256, block_k=256, block_q_dkv=256,
                    block_k_dkv=256, block_q_dq=256, block_k_dq=256)
    q = _rand(kq, (b, h, s, d), jnp.bfloat16)
    k = _rand(kk, (b, hk, s, d), jnp.bfloat16)
    v = _rand(kv, (b, hk, s, d), jnp.bfloat16)
    do = _rand(kd, (b, h, s, d), jnp.bfloat16)
    out, lse = F.flash_attention_fwd(
        q, k, v, sm_scale=d**-0.5, causal=True, block_sizes=bs)

    res = {}
    for flat in (False, True):
        old = B.FLAT_CAUSAL
        B.FLAT_CAUSAL = flat
        try:
            g = B.flash_attention_bwd(
                q, k, v, out, lse, do, sm_scale=d**-0.5, causal=True,
                block_sizes=bs, dropout_p=0.1, dropout_seed=jnp.int32(3))
        finally:
            B.FLAT_CAUSAL = old
        res[flat] = [np.asarray(x) for x in g[:3]]
    for a, bv, name in zip(res[False], res[True], ["dq", "dk", "dv"]):
        assert np.array_equal(a, bv), name


@pytest.mark.parametrize(
    "sq,sk,window",
    [
        (1024, 1024, (300, 0)),    # causal + sliding window
        (1024, 1024, (300, -1)),   # left-only window
        (512, 1024, (-1, 0)),      # causal prefix (sq < sk)
        (1024, 512, (-1, 0)),      # empty early rows (sq > sk)
        (700, 900, (260, 30)),     # odd lengths, both bounds
    ],
)
def test_flat_windowed_iteration_matches_rectangular(sq, sk, window):
    """The flat grid generalizes past pure causal: any static window
    enumerates only the visible (q, kv) block pairs (rows with an empty
    window get one dummy visit for the out=0/lse=inf contract) and must
    reproduce the rectangular grid bitwise."""
    import xhy_flash_attention_tpu.ops.flash_attention.bwd as B
    import xhy_flash_attention_tpu.ops.flash_attention.fwd as F

    key = jax.random.PRNGKey(3)
    kq, kk, kv, kd = jax.random.split(key, 4)
    b, h, hk, d = 2, 2, 2, 64
    bs = BlockSizes(block_q=256, block_k=256, block_q_dkv=256,
                    block_k_dkv=256, block_q_dq=256, block_k_dq=256)
    q = _rand(kq, (b, h, sq, d), jnp.bfloat16)
    k = _rand(kk, (b, hk, sk, d), jnp.bfloat16)
    v = _rand(kv, (b, hk, sk, d), jnp.bfloat16)
    do = _rand(kd, (b, h, sq, d), jnp.bfloat16)
    kw = dict(sm_scale=d**-0.5, window_size=window, block_sizes=bs)

    outs = {}
    old_f, old_b = F.FLAT_CAUSAL, B.FLAT_CAUSAL
    for flat in (False, True):
        F.FLAT_CAUSAL = B.FLAT_CAUSAL = flat
        try:
            o, lse = F.flash_attention_fwd(q, k, v, **kw)
            g = (B.flash_attention_bwd(q, k, v, o, lse, do, **kw)[:3]
                 if sq == sk else ())
        finally:
            F.FLAT_CAUSAL, B.FLAT_CAUSAL = old_f, old_b
        outs[flat] = [np.asarray(o), np.asarray(lse),
                      *[np.asarray(x) for x in g]]
    for i, (a, bv) in enumerate(zip(outs[False], outs[True])):
        assert np.array_equal(a, bv), i
