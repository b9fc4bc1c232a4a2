"""Split-KV decode + LSE-merge combine.

≙ reference FA3 split-KV (num_splits heuristic, csrc/flash_attn_v3/
heuristics.h:25+; separate combine kernel flash_fwd_combine_kernel.h,
dispatched at flash_api.cu:141-162): when batch*heads underfills the chip,
partition the KV axis into independent splits, compute partial
(out, m, l) per split, then merge with the numerically-stable LSE rule

    m = max(m_i);  l = Σ l_i · exp(m_i − m);  out = Σ out_i · l_i·exp(m_i−m) / l

The same merge is the cross-chip reduction of the ring/all-gather KV decode
(SURVEY.md hard part #5), so it lives here once.

On TPU the splits map to the *parallel* grid axes (Megacore splits them
across cores; on single-core chips XLA still overlaps DMA better with more
parallel work), and the combine is a tiny XLA reduction the compiler fuses.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.flash_attention.common import (
    FP8_TINY_REBIAS,
    NEG_INF,
    fp8_to_f32_tiny,
    interpret_mode,
    round_up,
)

MIN_LANES = 128

__all__ = ["merge_attention_partials", "flash_decode_splitkv", "num_splits_heuristic"]


def merge_attention_partials(outs, ms, ls, axis: int = 0):
    """Merge per-split partial attention results along `axis`.

    outs: (..., rows, d) un-normalized? NO — outs are *normalized* per split
    (out_i = acc_i / l_i); ms/ls: matching (..., rows, 1) running max / sum.
    Returns (out, m, l) merged (normalized out).
    This is exactly the reference combine kernel's math
    (flash_fwd_combine_kernel.h) and doubles as the ring-decode reduction.
    """
    m = jnp.max(ms, axis=axis, keepdims=True)
    scale = jnp.exp(ms - m) * ls                      # effective weights
    l = jnp.sum(scale, axis=axis, keepdims=True)
    safe_l = jnp.maximum(l, 1e-37)
    out = jnp.sum(outs * (scale / safe_l), axis=axis)
    return (
        out,
        jnp.squeeze(m, axis),
        jnp.squeeze(jnp.where(l == 0.0, 0.0, l), axis),
    )


def num_splits_heuristic(batch: int, num_kv_heads: int, seqlen: int,
                         block_k: int, num_cores: int = 2,
                         max_splits: int = 8) -> int:
    """How many KV splits to use (≙ FA3 heuristics.h num_splits_heuristic):
    enough parallel work to fill the cores, no more than the block count."""
    work = batch * num_kv_heads
    if work >= num_cores:
        return 1
    blocks = max(1, -(-seqlen // block_k))
    return max(1, min(max_splits, num_cores // max(work, 1), blocks))


def _splitkv_kernel(lens_ref, *refs,
                    sm_scale, softcap, block_k, sq, g, rows_p,
                    window_left, blocks_per_split, quantized):
    if quantized:
        (q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, m_ref, l_ref,
         m_scr, l_scr, acc_scr) = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, m_scr, l_scr, acc_scr = refs
        ks_ref = vs_ref = None
    b_idx = pl.program_id(0)
    isplit = pl.program_id(2)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = lens_ref[b_idx]
    ikv = isplit * blocks_per_split + j
    c_start = ikv * block_k

    @pl.when(c_start < length)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        if quantized:
            # fused dequant, same layout rules as decode_kernel.py: scales
            # are lane-major (1, block_k) per-token rows folded into the
            # tiny score matrix after the matmul (≙ FA3 k_descale/v_descale
            # composed with split-KV, flash_api.h:69-78,141-162)
            k = fp8_to_f32_tiny(k).astype(q.dtype) \
                if k.dtype == jnp.float8_e4m3fn else k.astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if quantized:
            s *= ks_ref[0, 0]
        s *= sm_scale
        if softcap > 0.0:
            s = jnp.tanh(s / softcap) * softcap
        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_p, block_k), 0)
        cols = c_start + jax.lax.broadcasted_iota(
            jnp.int32, (rows_p, block_k), 1
        )
        pos = length - sq + rows // g
        mask = cols <= pos
        if window_left >= 0:
            mask = jnp.logical_and(mask, cols >= pos - window_left)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_next = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - jnp.maximum(m_next[:, :1], 0.5 * NEG_INF))
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_next
        v = v_ref[0, 0]
        if quantized:
            p = p * vs_ref[0, 0]
            v = fp8_to_f32_tiny(v).astype(q.dtype) \
                if v.dtype == jnp.float8_e4m3fn else v.astype(q.dtype)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(j == blocks_per_split - 1)
    def _finish():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        m_ref[0, 0, 0] = m_scr[:, :8]
        l_ref[0, 0, 0] = l_scr[:, :8]


def _splitkv_raw(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    lengths: jax.Array,
    *,
    softmax_scale: Optional[float] = None,
    num_splits: int = 0,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    block_k: int = 512,
    interpret: Optional[bool] = None,
):
    """Per-split partials: (outs, ms, ls) with outs
    (b, hk, splits, rows_p, d) normalized fp32 and ms/ls
    (b, hk, splits, rows_p, 8). Caches may be dense arrays or QuantizedKV
    (INT8/FP8 payload + per-token scales — split-KV x quantized-KV, the
    BASELINE config-#5 path)."""
    from ..ops.quant import QuantizedKV

    quantized = isinstance(k_cache, QuantizedKV)
    k_scales = v_scales = None
    if quantized:
        k_cache, k_scales = k_cache.values, k_cache.scales
        v_cache, v_scales = v_cache.values, v_cache.scales
        if jnp.dtype(k_cache.dtype) == jnp.dtype(jnp.float8_e4m3fn):
            # fold the fp8 exponent rebias into the per-token scales
            # (see decode_kernel.py / common.fp8_to_f32_tiny)
            k_scales = k_scales * jnp.float32(FP8_TINY_REBIAS)
            v_scales = v_scales * jnp.float32(FP8_TINY_REBIAS)
    b, sq, h, d = q.shape
    hk, S = k_cache.shape[1], k_cache.shape[2]
    g = h // hk
    if softmax_scale is None:
        softmax_scale = d ** -0.5
    if quantized and block_k == 512:
        block_k = 1024  # 1-byte payloads want bigger DMA blocks
    Sp = round_up(S, block_k)
    nkv = Sp // block_k
    if num_splits <= 0:
        num_splits = num_splits_heuristic(b, hk, S, block_k)
    num_splits = min(num_splits, nkv)
    blocks_per_split = -(-nkv // num_splits)
    # pad once: seqlen padding + split padding together
    Sp = blocks_per_split * num_splits * block_k
    if Sp != S:
        pad = ((0, 0), (0, 0), (0, Sp - S), (0, 0))
        k_cache = jnp.pad(k_cache, pad)
        v_cache = jnp.pad(v_cache, pad)
        if quantized:
            k_scales = jnp.pad(k_scales, pad)
            v_scales = jnp.pad(v_scales, pad)
    if quantized:
        # lane-major (b, hk, 1, S) per-token scale rows (see decode_kernel)
        k_scales = k_scales[..., 0][:, :, None, :]
        v_scales = v_scales[..., 0][:, :, None, :]

    rows = sq * g
    rows_p = round_up(max(8, rows), 8)
    qr = q.reshape(b, sq, hk, g, d).transpose(0, 2, 1, 3, 4).reshape(
        b, hk, rows, d
    )
    if rows_p != rows:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rows_p - rows), (0, 0)))

    def kv_index(b_, h_, isplit, j, lens_ref):
        hi = jnp.maximum((lens_ref[b_] - 1) // block_k, 0)
        blk = jnp.minimum(isplit * blocks_per_split + j, hi)
        return (b_, h_, blk, 0)

    def sc_index(b_, h_, isplit, j, lens_ref):
        hi = jnp.maximum((lens_ref[b_] - 1) // block_k, 0)
        blk = jnp.minimum(isplit * blocks_per_split + j, hi)
        return (b_, h_, 0, blk)

    kv_specs = [pl.BlockSpec((1, 1, block_k, d), kv_index)]
    kv_inputs = [k_cache]
    if quantized:
        kv_specs.append(pl.BlockSpec((1, 1, 1, block_k), sc_index))
        kv_inputs.append(k_scales)
    kv_specs.append(pl.BlockSpec((1, 1, block_k, d), kv_index))
    kv_inputs.append(v_cache)
    if quantized:
        kv_specs.append(pl.BlockSpec((1, 1, 1, block_k), sc_index))
        kv_inputs.append(v_scales)

    outs, ms, ls = pl.pallas_call(
        functools.partial(
            _splitkv_kernel,
            sm_scale=float(softmax_scale), softcap=softcap, block_k=block_k,
            sq=sq, g=g, rows_p=rows_p, window_left=window_size[0],
            blocks_per_split=blocks_per_split, quantized=quantized,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, hk, num_splits, blocks_per_split),
            in_specs=[
                pl.BlockSpec((1, 1, rows_p, d),
                             lambda b_, h_, s_, j, *_: (b_, h_, 0, 0)),
            ] + kv_specs,
            out_specs=[
                pl.BlockSpec((1, 1, 1, rows_p, d),
                             lambda b_, h_, s_, j, *_: (b_, h_, s_, 0, 0)),
                pl.BlockSpec((1, 1, 1, rows_p, 8),
                             lambda b_, h_, s_, j, *_: (b_, h_, s_, 0, 0)),
                pl.BlockSpec((1, 1, 1, rows_p, 8),
                             lambda b_, h_, s_, j, *_: (b_, h_, s_, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((rows_p, MIN_LANES), jnp.float32),
                pltpu.VMEM((rows_p, MIN_LANES), jnp.float32),
                pltpu.VMEM((rows_p, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, hk, num_splits, rows_p, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hk, num_splits, rows_p, 8), jnp.float32),
            jax.ShapeDtypeStruct((b, hk, num_splits, rows_p, 8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret_mode() if interpret is None else interpret,
    )(jnp.asarray(lengths, jnp.int32), qr, *kv_inputs)
    return outs, ms, ls


def flash_decode_splitkv(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    lengths: jax.Array,
    *,
    softmax_scale: Optional[float] = None,
    num_splits: int = 0,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Split-KV flash decode: q (b, sq, h, d), caches (b, hk, S, d).

    num_splits=0 picks the FA3-style heuristic; 1 falls back to a single
    sequential pass (≙ flash_decode).
    """
    b, sq, h, d = q.shape
    hk = k_cache.shape[1]
    g = h // hk
    rows = sq * g
    outs, ms, ls = _splitkv_raw(
        q, k_cache, v_cache, lengths,
        softmax_scale=softmax_scale, num_splits=num_splits,
        window_size=window_size, softcap=softcap, block_k=block_k,
        interpret=interpret,
    )
    out, _, _ = merge_attention_partials(
        outs, ms[..., :1], ls[..., :1], axis=2
    )
    out = out[:, :, :rows].reshape(b, hk, sq, g, d).transpose(0, 2, 1, 3, 4)
    return out.reshape(b, sq, h, d).astype(q.dtype)


def _splitkv_partials(
    q, k_cache, v_cache, lengths, *,
    softmax_scale=None, window_size=(-1, -1), softcap=0.0, block_k=512,
    interpret=None,
):
    """Single-split partials for cross-chip merging (parallel/ring.py
    sharded_kv_decode): out (b, hk, rows_p, d) fp32, m/l (b, hk, rows_p, 1)."""
    outs, ms, ls = _splitkv_raw(
        q, k_cache, v_cache, lengths,
        softmax_scale=softmax_scale, num_splits=1,
        window_size=window_size, softcap=softcap, block_k=block_k,
        interpret=interpret,
    )
    return outs[:, :, 0], ms[:, :, 0, :, :1], ls[:, :, 0, :, :1]
