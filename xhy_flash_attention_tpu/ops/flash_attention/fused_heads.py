"""Packed-layout attention for training shapes — Pallas TPU kernel.

Layout-specialized single-block variant of the flash-attention pair
(fwd.py / bwd.py — the general kernels it defers to everywhere else;
reference counterpart: the head-looped CTA bodies of
csrc/flash_attn/src/flash_fwd_kernel.h:122 / flash_bwd_kernel.h:427,
which also keep all heads of a (b, q-block) resident per CTA cluster).

Motivation (measured on the gpt2m training step, TPU v5e): the general
kernels want (b, h, s, d) operands, so every layer pays four layout
transposes per direction; at d = 64 those transposes plus the backward's
concat-of-transposed-grads cost ~4 ms of an 87 ms step. This kernel
instead consumes the PROJECTION layout directly — q/k/v as
(b, s, h*d) — slicing heads out of the lane axis in-body (64-lane
slices of the packed block), so:

  * zero layout transposes anywhere in the attention path;
  * dq/dk/dv come out in projection layout, giving the Wqkv backward a
    contiguous operand for free;
  * per-head compute chains are independent, letting Mosaic interleave
    head i's VPU softmax with head i+1's MXU matmuls (measured 43.5 vs
    41.5 useful TFLOP/s against the transposing path at b4 h16 s1024
    d64 causal).

Scope (everything else falls back to the general kernels): sq == sk
<= MAX_SEQ, one KV block (the fwd single-shot regime), causal or full,
softcap, dropout, MQA/GQA; no bias/windows/segments/masks. The softmax
is the zero-shift exp(min(s, 70)) used by the general kernels'
single-shot mode — identical numerics contract.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import dropout_keep_mask, interpret_mode

MAX_SEQ = 1024  # one (s, s) fp32 score matrix per live head must fit VMEM


def _supported(b, s, h, d, hk, causal, window_size, softcap, bias,
               q_seg, kv_seg):
    return (
        s <= MAX_SEQ
        and (h * d) % 128 == 0
        and (hk * d) % 128 == 0
        and h % hk == 0
        and window_size == (-1, -1)
        and bias is None and q_seg is None and kv_seg is None
    )


def _fwd_kernel(*refs, h, hk, d, s, sm_scale, causal, softcap, dropout_p,
                need_lse):
    it = iter(refs)
    seed_ref = next(it) if dropout_p > 0.0 else None
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    dmask_ref = next(it) if causal else None
    o_ref = next(it)
    lse_ref = next(it) if need_lse else None
    b_idx = pl.program_id(0)
    g = h // hk
    for hh in range(h):
        kh = hh // g
        q = q_ref[0, :, hh * d:(hh + 1) * d]
        q = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
        k = k_ref[0, :, kh * d:(kh + 1) * d]
        sc = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if softcap > 0.0:
            sc = jnp.tanh(sc / softcap) * softcap
        if causal:
            sc += dmask_ref[...].astype(jnp.float32)
        pt = jnp.exp(jnp.minimum(sc, 70.0))
        psum = jnp.sum(pt, axis=-1, keepdims=True)
        if dropout_p > 0.0:
            rows = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
            keep = dropout_keep_mask(
                seed_ref[0], b_idx * h + hh, rows, cols, dropout_p)
            pt = jnp.where(keep, pt, 0.0) * (1.0 / (1.0 - dropout_p))
        v = v_ref[0, :, kh * d:(kh + 1) * d]
        pv = jax.lax.dot_general(
            pt.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        l_inv = jnp.where(psum == 0.0, 0.0, 1.0 / psum)
        o_ref[0, :, hh * d:(hh + 1) * d] = (pv * l_inv).astype(o_ref.dtype)
        if lse_ref is not None:
            # (s, 1) column -> (1, s) lane row via the splat-transpose
            # Mosaic supports (same trick as fwd.py _finish)
            stat = jnp.where(
                psum == 0.0, jnp.inf, jnp.log(jnp.maximum(psum, 1e-37)))
            row = jax.lax.transpose(
                jnp.broadcast_to(stat, (s, 128)), (1, 0))[:1]
            lse_ref[0, hh:hh + 1, :] = row


def _bwd_kernel(*refs, h, hk, d, s, sm_scale, causal, softcap, dropout_p,
                packed_out=False):
    it = iter(refs)
    seed_ref = next(it) if dropout_p > 0.0 else None
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = (
        next(it), next(it), next(it), next(it), next(it), next(it))
    dmask_ref = next(it) if causal else None
    if packed_out:
        # ONE (1, s, (h+2hk)*d) dqkv ref in projection order [dq|dk|dv] —
        # the Wqkv backward consumes it with zero concat/copies
        dq_ref = dk_ref = dv_ref = next(it)
        koff, voff = h * d, (h + hk) * d
    else:
        dq_ref, dk_ref, dv_ref = next(it), next(it), next(it)
        koff = voff = 0
    b_idx = pl.program_id(0)
    g = h // hk
    for kh in range(hk):
        k = k_ref[0, :, kh * d:(kh + 1) * d]
        v = v_ref[0, :, kh * d:(kh + 1) * d]
        dk_acc = None
        dv_acc = None
        for gi in range(g):
            hh = kh * g + gi
            q = q_ref[0, :, hh * d:(hh + 1) * d]
            qs = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
            do = do_ref[0, :, hh * d:(hh + 1) * d]
            # lse/delta rows arrive as (1, s) lanes; transpose to columns
            lse_c = jax.lax.transpose(
                jnp.broadcast_to(lse_ref[0, hh][None], (8, s)), (1, 0)
            )[:, :1]
            delta_c = jax.lax.transpose(
                jnp.broadcast_to(delta_ref[0, hh][None], (8, s)), (1, 0)
            )[:, :1]
            sc = jax.lax.dot_general(
                qs, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if softcap > 0.0:
                t = jnp.tanh(sc / softcap)
                sc = t * softcap
            if causal:
                sc += dmask_ref[...].astype(jnp.float32)
            p = jnp.exp(jnp.minimum(sc - lse_c, 70.0))
            if dropout_p > 0.0:
                rows = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
                cols = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
                keep = dropout_keep_mask(
                    seed_ref[0], b_idx * h + hh, rows, cols, dropout_p)
                p_dropped = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - dropout_p))
            else:
                p_dropped = p
            dtype = q.dtype
            # dV += P_dropped^T @ dO
            dv_t = jax.lax.dot_general(
                p_dropped.astype(dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # dP = dO @ V^T (dropout folds in via the kept-scaled p below)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if dropout_p > 0.0:
                dp = jnp.where(keep, dp, 0.0) * (1.0 / (1.0 - dropout_p))
            ds = p * (dp - delta_c)
            if softcap > 0.0:
                ds = ds * (1.0 - t * t)
            # dK += dS^T @ (sm_scale * Q)
            dk_t = jax.lax.dot_general(
                ds.astype(dtype), qs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq = jax.lax.dot_general(
                ds.astype(dtype), k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq_ref[0, :, hh * d:(hh + 1) * d] = (
                dq * sm_scale).astype(dq_ref.dtype)
            dk_acc = dk_t if dk_acc is None else dk_acc + dk_t
            dv_acc = dv_t if dv_acc is None else dv_acc + dv_t
        dk_ref[0, :, koff + kh * d:koff + (kh + 1) * d] = (
            dk_acc.astype(dk_ref.dtype))
        dv_ref[0, :, voff + kh * d:voff + (kh + 1) * d] = (
            dv_acc.astype(dv_ref.dtype))


def _causal_tile(s, dtype):
    rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    return jnp.where(cols <= rows, 0.0, -1e30).astype(dtype)


def _fwd_call(q, k, v, seed, *, h, hk, d, sm_scale, causal, softcap,
              dropout_p, need_lse):
    b, s, _ = q.shape
    kern = functools.partial(
        _fwd_kernel, h=h, hk=hk, d=d, s=s, sm_scale=sm_scale, causal=causal,
        softcap=softcap, dropout_p=dropout_p, need_lse=need_lse)
    inputs = [q, k, v]
    in_specs = [
        pl.BlockSpec((1, s, h * d), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, s, hk * d), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, s, hk * d), lambda i, *_: (i, 0, 0)),
    ]
    if causal:
        inputs.append(_causal_tile(s, jnp.bfloat16))
        in_specs.append(pl.BlockSpec((s, s), lambda i, *_: (0, 0)))
    out_shape = [jax.ShapeDtypeStruct((b, s, h * d), q.dtype)]
    out_specs = [pl.BlockSpec((1, s, h * d), lambda i, *_: (i, 0, 0))]
    if need_lse:
        out_shape.append(jax.ShapeDtypeStruct((b, h, s), jnp.float32))
        out_specs.append(pl.BlockSpec((1, h, s), lambda i, *_: (i, 0, 0)))
    results = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1 if dropout_p > 0.0 else 0,
            grid=(b,),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret_mode(),
    )(*([seed] if dropout_p > 0.0 else []), *inputs)
    return results if need_lse else (results[0], None)


def _bwd_call(q, k, v, do, lse, delta, seed, *, h, hk, d, sm_scale, causal,
              softcap, dropout_p):
    b, s, _ = q.shape
    kern = functools.partial(
        _bwd_kernel, h=h, hk=hk, d=d, s=s, sm_scale=sm_scale, causal=causal,
        softcap=softcap, dropout_p=dropout_p)
    inputs = [q, k, v, do, lse, delta]
    in_specs = [
        pl.BlockSpec((1, s, h * d), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, s, hk * d), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, s, hk * d), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, s, h * d), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, h, s), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, h, s), lambda i, *_: (i, 0, 0)),
    ]
    if causal:
        inputs.append(_causal_tile(s, jnp.bfloat16))
        in_specs.append(pl.BlockSpec((s, s), lambda i, *_: (0, 0)))
    out_shape = [
        jax.ShapeDtypeStruct((b, s, h * d), q.dtype),
        jax.ShapeDtypeStruct((b, s, hk * d), k.dtype),
        jax.ShapeDtypeStruct((b, s, hk * d), v.dtype),
    ]
    out_specs = [
        pl.BlockSpec((1, s, h * d), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, s, hk * d), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, s, hk * d), lambda i, *_: (i, 0, 0)),
    ]
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1 if dropout_p > 0.0 else 0,
            grid=(b,),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret_mode(),
    )(*([seed] if dropout_p > 0.0 else []), *inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _attn(q, k, v, seed, h, hk, d, sm_scale, causal, softcap, dropout_p):
    out, _ = _fwd_call(q, k, v, seed, h=h, hk=hk, d=d, sm_scale=sm_scale,
                       causal=causal, softcap=softcap, dropout_p=dropout_p,
                       need_lse=False)
    return out


def _attn_fwd(q, k, v, seed, h, hk, d, sm_scale, causal, softcap, dropout_p):
    out, lse = _fwd_call(q, k, v, seed, h=h, hk=hk, d=d, sm_scale=sm_scale,
                         causal=causal, softcap=softcap, dropout_p=dropout_p,
                         need_lse=True)
    return out, (q, k, v, out, lse, seed)


def _attn_bwd(h, hk, d, sm_scale, causal, softcap, dropout_p, res, g):
    q, k, v, out, lse, seed = res
    b, s, _ = q.shape
    # delta = rowsum(dO * O) per head, shaped (b, h, s) to ride the same
    # lane layout as lse
    delta = jnp.sum(
        (g.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
            b, s, h, d),
        axis=-1,
    ).transpose(0, 2, 1)
    dq, dk, dv = _bwd_call(
        q, k, v, g, lse, delta, seed, h=h, hk=hk, d=d, sm_scale=sm_scale,
        causal=causal, softcap=softcap, dropout_p=dropout_p)
    return dq, dk, dv, None


_attn.defvjp(_attn_fwd, _attn_bwd)


def packed_heads_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    softcap: float = 0.0,
    dropout_p: float = 0.0,
    dropout_seed=None,
):
    """Attention on (b, s, h, d) inputs WITHOUT layout transposes.

    Inputs are viewed as packed (b, s, h*d) — the projection layout —
    and heads are sliced from the lane axis inside the kernel. Returns
    (b, s, h, d). Caller must check `packed_heads_supported` first.
    """
    b, s, h, d = q.shape
    hk = k.shape[2]
    if softmax_scale is None:
        softmax_scale = d ** -0.5
    seed = jnp.zeros((1,), jnp.int32)
    if dropout_p > 0.0:
        if dropout_seed is None:
            raise ValueError("dropout_p > 0 requires dropout_seed")
        seed = jnp.asarray(dropout_seed, jnp.int32).reshape((1,))
    out = _attn(
        q.reshape(b, s, h * d), k.reshape(b, s, hk * d),
        v.reshape(b, s, hk * d), seed,
        h, hk, d, float(softmax_scale), bool(causal), float(softcap),
        float(dropout_p))
    return out.reshape(b, s, h, d)


def packed_heads_supported(q_shape, k_shape, *, causal, window_size,
                           softcap, bias=None, q_seg=None, kv_seg=None):
    b, s, h, d = q_shape
    sk, hk = k_shape[1], k_shape[2]
    return s == sk and _supported(
        b, s, h, d, hk, causal, tuple(window_size), softcap, bias,
        q_seg, kv_seg)


def _qkv_specs(s, h, hk, d):
    """Three views of ONE packed (b, s, (h+2hk)*d) array: block index
    maps slice q/k/v out at their column offsets (h*d is always a
    multiple of the hk*d block width), so the kernel DMAs each slice
    straight from the projection output — no XLA slice copies."""
    g = h // hk
    return [
        pl.BlockSpec((1, s, h * d), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, s, hk * d), lambda i, *_: (i, 0, g)),
        pl.BlockSpec((1, s, hk * d), lambda i, *_: (i, 0, g + 1)),
    ]


def _fwd_call_qkv(qkv, seed, *, h, hk, d, sm_scale, causal, softcap,
                  dropout_p, need_lse):
    b, s, _ = qkv.shape
    kern = functools.partial(
        _fwd_kernel, h=h, hk=hk, d=d, s=s, sm_scale=sm_scale, causal=causal,
        softcap=softcap, dropout_p=dropout_p, need_lse=need_lse)
    inputs = [qkv, qkv, qkv]
    in_specs = _qkv_specs(s, h, hk, d)
    if causal:
        inputs.append(_causal_tile(s, jnp.bfloat16))
        in_specs.append(pl.BlockSpec((s, s), lambda i, *_: (0, 0)))
    out_shape = [jax.ShapeDtypeStruct((b, s, h * d), qkv.dtype)]
    out_specs = [pl.BlockSpec((1, s, h * d), lambda i, *_: (i, 0, 0))]
    if need_lse:
        out_shape.append(jax.ShapeDtypeStruct((b, h, s), jnp.float32))
        out_specs.append(pl.BlockSpec((1, h, s), lambda i, *_: (i, 0, 0)))
    results = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1 if dropout_p > 0.0 else 0,
            grid=(b,),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret_mode(),
    )(*([seed] if dropout_p > 0.0 else []), *inputs)
    return results if need_lse else (results[0], None)


def _bwd_call_qkv(qkv, do, lse, delta, seed, *, h, hk, d, sm_scale, causal,
                  softcap, dropout_p):
    b, s, w = qkv.shape
    kern = functools.partial(
        _bwd_kernel, h=h, hk=hk, d=d, s=s, sm_scale=sm_scale, causal=causal,
        softcap=softcap, dropout_p=dropout_p, packed_out=True)
    inputs = [qkv, qkv, qkv, do, lse, delta]
    in_specs = _qkv_specs(s, h, hk, d) + [
        pl.BlockSpec((1, s, h * d), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, h, s), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, h, s), lambda i, *_: (i, 0, 0)),
    ]
    if causal:
        inputs.append(_causal_tile(s, jnp.bfloat16))
        in_specs.append(pl.BlockSpec((s, s), lambda i, *_: (0, 0)))
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1 if dropout_p > 0.0 else 0,
            grid=(b,),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec((1, s, w), lambda i, *_: (i, 0, 0))],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, s, w), qkv.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret_mode(),
    )(*([seed] if dropout_p > 0.0 else []), *inputs)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _attn_qkv(qkv, seed, h, hk, d, sm_scale, causal, softcap, dropout_p):
    out, _ = _fwd_call_qkv(
        qkv, seed, h=h, hk=hk, d=d, sm_scale=sm_scale, causal=causal,
        softcap=softcap, dropout_p=dropout_p, need_lse=False)
    return out


def _attn_qkv_fwd(qkv, seed, h, hk, d, sm_scale, causal, softcap, dropout_p):
    out, lse = _fwd_call_qkv(
        qkv, seed, h=h, hk=hk, d=d, sm_scale=sm_scale, causal=causal,
        softcap=softcap, dropout_p=dropout_p, need_lse=True)
    return out, (qkv, out, lse, seed)


def _attn_qkv_bwd(h, hk, d, sm_scale, causal, softcap, dropout_p, res, g):
    qkv, out, lse, seed = res
    b, s, _ = qkv.shape
    delta = jnp.sum(
        (g.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
            b, s, h, d),
        axis=-1,
    ).transpose(0, 2, 1)
    dqkv = _bwd_call_qkv(
        qkv, g, lse, delta, seed, h=h, hk=hk, d=d, sm_scale=sm_scale,
        causal=causal, softcap=softcap, dropout_p=dropout_p)
    return dqkv, None


_attn_qkv.defvjp(_attn_qkv_fwd, _attn_qkv_bwd)


def packed_qkv_attention(
    qkv: jax.Array,
    *,
    num_heads: int,
    num_heads_kv: int,
    head_dim: int,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    softcap: float = 0.0,
    dropout_p: float = 0.0,
    dropout_seed=None,
):
    """Attention DIRECTLY on the packed Wqkv projection output.

    qkv: (b, s, (h + 2*hk) * d) in [q | k | v] column order (the MHA
    packed projection). Returns (b, s, h*d) ready for out_proj. The
    backward emits ONE packed dqkv in the same order — the projection
    backward's operand with zero reshuffling. Head slices ride block
    index maps over the same buffer (no XLA slice copies in fwd either).
    """
    h, hk, d = num_heads, num_heads_kv, head_dim
    b, s, w = qkv.shape
    assert w == (h + 2 * hk) * d
    if softmax_scale is None:
        softmax_scale = d ** -0.5
    seed = jnp.zeros((1,), jnp.int32)
    if dropout_p > 0.0:
        if dropout_seed is None:
            raise ValueError("dropout_p > 0 requires dropout_seed")
        seed = jnp.asarray(dropout_seed, jnp.int32).reshape((1,))
    return _attn_qkv(qkv, seed, h, hk, d, float(softmax_scale),
                     bool(causal), float(softcap), float(dropout_p))
