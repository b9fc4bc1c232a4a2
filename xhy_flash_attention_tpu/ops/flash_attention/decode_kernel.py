"""Flash-decode: single/few-token queries against a long KV cache.

≙ reference ft_attention masked multi-head attention (K14) + the FA3 decode
machinery (K7): GQA packing and split-KV.

TPU design:
  * **PackGQA** (≙ csrc/flash_attn_v3/pack_gqa.h): with MQA/GQA the per-KV-head
    query count is g = h/hk; a single decode token would feed the MXU only one
    row. We fold (seq, group) into the row dimension — q becomes
    (b, hk, sq*g, d) — so each matmul has sq*g rows per KV head.
  * grid (batch, kv_head, kv_block); the kv axis is sequential with online
    softmax in VMEM scratch, and **blocks past the sample's length are
    skipped** via pl.when + index-map clamping driven by the scalar-prefetched
    `lengths` (≙ FA3 seqused_k + tile-scheduler early exit).
  * no dropout, no backward (inference only) — matching the reference decode
    kernels.

Quantized-KV throughput (v5e, GQA 32/8 d=128 S=8k): bf16 ~90% of HBM BW,
INT8 0.91 of the 1-byte roofline (1.7x the bf16 tokens/s — the whole
point of the quantized cache). FP8 e4m3 has no hardware convert on v5e;
the in-kernel integer bit-reconstruction (common.fp8_to_f32_tiny, rebias
folded into the per-token scales) reaches 0.87 of the same roofline vs
0.09 through Mosaic's emulated astype. v6e+ can use the native convert.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import (
    FP8_TINY_REBIAS,
    NEG_INF,
    fp8_to_f32_tiny,
    interpret_mode,
    round_up,
)

MIN_LANES = 128


def _decode_kernel(lens_ref, hi_ref, *refs,
                   sm_scale, softcap, block_k, sq, g, rows_p,
                   window_left, num_kv_blocks, quantized, fp8=False,
                   has_kvb=False, has_leftpad=False):
    it = iter(refs)
    if has_kvb:
        next(it)  # kv_batch_idx: consumed by the index maps only
    lp_ref = next(it) if has_leftpad else None
    if window_left >= 0:
        next(it)  # first-visible-block table: consumed by the index maps
    if quantized:
        (q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
         m_scr, l_scr, acc_scr) = it
    else:
        q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr = it
        ks_ref = vs_ref = None
    b_idx = pl.program_id(0)
    ikv = pl.program_id(2)

    @pl.when(ikv == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = lens_ref[b_idx]
    # left-padded cache (≙ FA3 leftpad_k, flash_api.h:104): the sequence
    # occupies cache columns [lp, lp + length); positions stay causal in
    # LOGICAL coordinates, so all comparisons below shift by lp
    lp = lp_ref[b_idx] if has_leftpad else 0
    end_pos = lp + length
    c_start = ikv * block_k

    def _body(apply_mask):
        q = q_ref[0, 0]                      # (rows_p, d)
        k = k_ref[0, 0]                      # (block_k, d)
        if quantized:
            # dequant fused right before the MXU (≙ FA3 k_descale). Scales
            # are per token (rows of k), so s_ij = (q_i . k_j) * scale_j:
            # fold them into the tiny (rows_p, block_k) score matrix after
            # the matmul instead of rescaling the whole (block_k, d) tile —
            # the convert is 1 VPU op/elem, the scale costs rows_p/d less.
            # e4m3 payloads route through the integer bit-reconstruction
            # (common.fp8_to_f32_tiny, THREE int ops): Mosaic's emulated
            # astype was the whole decode bottleneck (78 Gelem/s -> 0.09
            # of roofline), and even the rebias fmul is folded into the
            # per-token scales (pre-multiplied by 2^120 below) — the
            # e>=1 codes stay exact through the tiny-value bf16 cast.
            if fp8:
                k = fp8_to_f32_tiny(k).astype(q.dtype)
            else:
                k = k.astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if quantized:
            s *= ks_ref[0, 0]  # (1, block_k) lane-major per-token scales
        s *= sm_scale
        if softcap > 0.0:
            s = jnp.tanh(s / softcap) * softcap
        if apply_mask:
            rows = jax.lax.broadcasted_iota(jnp.int32, (rows_p, block_k), 0)
            cols = c_start + jax.lax.broadcasted_iota(
                jnp.int32, (rows_p, block_k), 1
            )
            # row r = si*g + gi holds query step si at absolute CACHE
            # position lp + length - sq + si
            pos = end_pos - sq + rows // g
            mask = cols <= pos
            if has_leftpad:
                mask = jnp.logical_and(mask, cols >= lp)
            if window_left >= 0:
                mask = jnp.logical_and(mask, cols >= pos - window_left)
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - jnp.maximum(m_next[:, :1], 0.5 * NEG_INF))
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_next
        v = v_ref[0, 0]
        if quantized:
            # p @ (v * vs) == (p * vs^T) @ v: scale the tiny p instead
            p = p * vs_ref[0, 0]
            if fp8:
                v = fp8_to_f32_tiny(v).astype(q.dtype)
            else:
                v = v.astype(q.dtype)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    # Two-branch body (≙ the fwd kernel's fully-unmasked bypass): interior
    # blocks skip the (rows_p, block_k) iota/compare/where mask work — decode
    # is consumption-bound, so every VPU pass on the score matrix shows up
    # in tokens/s. A block needs masking only if it straddles a query
    # position (causal right edge) or the sliding-window left edge.
    fully_unmasked = c_start + block_k - 1 <= end_pos - sq
    if has_leftpad:
        fully_unmasked = jnp.logical_and(fully_unmasked, c_start >= lp)
    if window_left >= 0:
        fully_unmasked = jnp.logical_and(
            fully_unmasked, c_start >= end_pos - 1 - window_left
        )
    should_run = c_start < end_pos
    if has_leftpad:
        should_run = jnp.logical_and(should_run, c_start + block_k > lp)
    if window_left >= 0:
        # blocks entirely left of every query's window: skip compute (the
        # index maps also clamp their DMA onto the first visible block, so
        # a long retained cache costs ~window bytes, not ~context bytes)
        should_run = jnp.logical_and(
            should_run, c_start + block_k > end_pos - sq - window_left
        )

    @pl.when(jnp.logical_and(should_run, fully_unmasked))
    def _fast():
        _body(False)

    @pl.when(jnp.logical_and(should_run, jnp.logical_not(fully_unmasked)))
    def _masked():
        _body(True)

    @pl.when(ikv == num_kv_blocks - 1)
    def _finish():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def flash_decode(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    lengths: jax.Array,
    *,
    softmax_scale: float,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    block_k: Optional[int] = None,
    kv_batch_idx: Optional[jax.Array] = None,
    leftpad_k: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """q: (b, sq, h, d); k/v_cache: (b, hk, S, d) arrays or QuantizedKV
    (int8/fp8 payload + per-token scales); lengths: (b,) int32 valid length
    including the sq new tokens. Returns (b, sq, h, d).

    kv_batch_idx: (b,) int32 — cache batch row serving query batch i
    (beam search / shared-prompt fan-out; ≙ FA3 kv_batch_idx,
    flash_api.h:143). Resolved in the scalar-prefetch index maps; no
    gather materializes.
    leftpad_k: (b,) int32 — the sequence occupies cache columns
    [leftpad, leftpad + length) (≙ FA3 leftpad_k, flash_api.h:104).

    block_k default is adaptive: decode is HBM-bound and per-grid-step
    overhead dominates small blocks (measured on v5e: 512 -> ~45% of HBM
    bandwidth, 2048+ -> ~90%), so the block grows with the cache up to 2048.
    """
    from ..quant import QuantizedKV

    quantized = isinstance(k_cache, QuantizedKV)
    k_scales = v_scales = None
    if quantized:
        k_cache, k_scales = k_cache.values, k_cache.scales
        v_cache, v_scales = v_cache.values, v_cache.scales
    b, sq, h, d = q.shape
    hk, S = k_cache.shape[1], k_cache.shape[2]
    if block_k is None:
        # bigger tiles amortize per-grid-step overhead (DMA issue + mask
        # scalars) and, for 1-byte payloads, the dequant convert; grid
        # cells still pipeline DMA/compute across (b, hk) so nkv == 1 is
        # fine. Chip sweep (S=8k/16k, GQA 32/8 d128): int8 4096 -> 0.885,
        # 8192 -> 0.911 of roofline; fp8 4096 -> 0.793, 8192 -> 0.861.
        # Trade-off: a sample's DMA covers ceil(len/block_k) blocks, so
        # very mixed lengths in one batch prefer smaller explicit blocks.
        big = 8192 if k_cache.dtype.itemsize == 1 else 2048
        block_k = min(big, round_up(S, 512))
    g = h // hk
    rows = sq * g
    rows_p = round_up(max(8, rows), 8)
    # pack: (b, sq, hk, g, d) -> (b, hk, sq*g, d)
    qr = q.reshape(b, sq, hk, g, d).transpose(0, 2, 1, 3, 4).reshape(
        b, hk, rows, d
    )
    if rows_p != rows:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rows_p - rows), (0, 0)))
    Sp = round_up(S, block_k)
    if Sp != S:
        k_cache = jnp.pad(k_cache, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        if quantized:
            k_scales = jnp.pad(k_scales, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
            v_scales = jnp.pad(v_scales, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    is_fp8 = quantized and jnp.dtype(k_cache.dtype) == jnp.dtype(
        jnp.float8_e4m3fn)
    if is_fp8:
        # fold the fp8 exponent rebias (common.fp8_to_f32_tiny) into the
        # per-token scales the kernel multiplies anyway — one XLA pass
        # over the (b, hk, S) scales replaces a full-tile fmul per block
        k_scales = k_scales * jnp.float32(FP8_TINY_REBIAS)
        v_scales = v_scales * jnp.float32(FP8_TINY_REBIAS)
    if quantized:
        # lane-major (b, hk, 1, S) so the kernel reads (1, block_k) rows —
        # a (block_k, 1) sublane-major block would need an in-kernel
        # transpose (measured 2x decode slowdown)
        k_scales = k_scales[..., 0][:, :, None, :]
        v_scales = v_scales[..., 0][:, :, None, :]
    nkv = Sp // block_k

    # Per-batch last-valid-block index, precomputed once and scalar-prefetched
    # so the per-step index maps are a single min (the div/max on the scalar
    # core per grid step measurably delayed DMA issue).
    has_kvb = kv_batch_idx is not None
    has_leftpad = leftpad_k is not None
    lens32 = jnp.asarray(lengths, jnp.int32)
    lp32 = jnp.asarray(leftpad_k, jnp.int32) if has_leftpad else 0
    hi_blocks = jnp.maximum((lp32 + lens32 - 1) // block_k, 0)
    has_window = window_size[0] >= 0
    extra_prefetch = []
    if has_kvb:
        extra_prefetch.append(jnp.asarray(kv_batch_idx, jnp.int32))
    if has_leftpad:
        extra_prefetch.append(jnp.asarray(leftpad_k, jnp.int32))
    if has_window:
        # first block any query's sliding window can see — leading blocks
        # clamp onto it so a retained long cache streams ~window bytes
        extra_prefetch.append(jnp.maximum(
            (lp32 + lens32 - sq - window_size[0]) // block_k, 0))

    def cache_b(b_, refs):
        # refs = (lens, hi[, kvb][, lp][, lo]) — kvb sits right after hi
        return refs[2][b_] if has_kvb else b_

    def _clamp(b_, ikv, refs):
        i = jnp.minimum(ikv, refs[1][b_])
        if has_window:
            i = jnp.maximum(i, refs[-1][b_])
        return i

    def kv_index(b_, h_, ikv, *refs):
        return (cache_b(b_, refs), h_, _clamp(b_, ikv, refs), 0)

    def sc_index(b_, h_, ikv, *refs):
        return (cache_b(b_, refs), h_, 0, _clamp(b_, ikv, refs))

    out = pl.pallas_call(
        functools.partial(
            _decode_kernel,
            sm_scale=softmax_scale, softcap=softcap, block_k=block_k,
            sq=sq, g=g, rows_p=rows_p, window_left=window_size[0],
            num_kv_blocks=nkv, quantized=quantized, fp8=is_fp8,
            has_kvb=has_kvb, has_leftpad=has_leftpad,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2 + len(extra_prefetch),
            grid=(b, hk, nkv),
            in_specs=(
                [pl.BlockSpec((1, 1, rows_p, d),
                              lambda b_, h_, ikv, *_: (b_, h_, 0, 0))]
                + ([pl.BlockSpec((1, 1, block_k, d), kv_index),
                    pl.BlockSpec((1, 1, 1, block_k), sc_index),
                    pl.BlockSpec((1, 1, block_k, d), kv_index),
                    pl.BlockSpec((1, 1, 1, block_k), sc_index)]
                   if quantized else
                   [pl.BlockSpec((1, 1, block_k, d), kv_index),
                    pl.BlockSpec((1, 1, block_k, d), kv_index)])
            ),
            out_specs=pl.BlockSpec(
                (1, 1, rows_p, d), lambda b_, h_, ikv, *_: (b_, h_, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((rows_p, MIN_LANES), jnp.float32),
                pltpu.VMEM((rows_p, MIN_LANES), jnp.float32),
                pltpu.VMEM((rows_p, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hk, rows_p, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode() if interpret is None else interpret,
    )(lens32, hi_blocks, *extra_prefetch, qr,
      *( (k_cache, k_scales, v_cache, v_scales) if quantized
         else (k_cache, v_cache) ))
    out = out[:, :, :rows].reshape(b, hk, sq, g, d).transpose(0, 2, 1, 3, 4)
    return out.reshape(b, sq, h, d)
