"""Paged KV cache + paged flash-decode kernel.

≙ reference FA3 paged-KV decode (csrc/flash_attn_v3/paged_kv.h; C API
page_table/page_size params, flash_api.h:100-150) and appending-KV
(knew/vnew + cu_seqlens_knew).

TPU design:
  * pages are stored as one (num_pages, kv_heads, page_size, head_dim) array
    per cache; `page_size` equals the kernel KV block so every page is one
    contiguous DMA — the page-table indirection happens in the BlockSpec
    index map reading scalar-prefetch SMEM, never on the data path (this is
    the "block size must match page size" resolution of SURVEY.md hard
    part #4);
  * append (the reference's knew/vnew path) is a functional
    dynamic-update-slice into the tail page, jit-fused with the decode step;
  * per-sample lengths clamp the page loop exactly like the dense decode
    kernel (≙ FA3 seqused_k).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.flash_attention.common import NEG_INF, interpret_mode, round_up

MIN_LANES = 128

__all__ = ["PagedKVCache", "paged_flash_decode", "append_paged_kv"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """One layer's paged KV storage (a pytree; jit-friendly).

    k_pages/v_pages: (num_pages, kv_heads, page_size, head_dim)
    page_table: (batch, max_pages_per_seq) int32 — physical page per
        logical block; entries past the sequence's pages are arbitrary
        (clamped by `lengths` in the kernel).
    lengths: (batch,) int32 — valid tokens per sequence.
    k_scales/v_scales: None for bf16 pages; (num_pages, kv_heads, 1,
        page_size) fp32 per-token scales for INT8/FP8 pages (lane-major —
        see decode_kernel.py on why), dequant fused into the decode matmuls
        (≙ FA3 k_descale/v_descale with a paged INT8 cache, BASELINE
        config #3).
    """

    k_pages: jax.Array
    v_pages: jax.Array
    page_table: jax.Array
    lengths: jax.Array
    k_scales: Optional[jax.Array] = None
    v_scales: Optional[jax.Array] = None

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scales is not None

    @staticmethod
    def create(num_pages: int, kv_heads: int, page_size: int, head_dim: int,
               batch: int, max_pages_per_seq: int,
               dtype=jnp.bfloat16) -> "PagedKVCache":
        shape = (num_pages, kv_heads, page_size, head_dim)
        quant = jnp.dtype(dtype) in (jnp.dtype(jnp.int8),
                                     jnp.dtype(jnp.float8_e4m3fn))
        sc = (jnp.ones((num_pages, kv_heads, 1, page_size), jnp.float32)
              if quant else None)
        return PagedKVCache(
            k_pages=jnp.zeros(shape, dtype),
            v_pages=jnp.zeros(shape, dtype),
            page_table=jnp.zeros((batch, max_pages_per_seq), jnp.int32),
            lengths=jnp.zeros((batch,), jnp.int32),
            k_scales=sc,
            v_scales=sc,
        )


def _paged_decode_kernel(lens_ref, table_ref, *refs,
                         sm_scale, softcap, page_size, sq, g, rows_p,
                         window_left, num_blocks, quantized):
    if quantized:
        (q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
         m_scr, l_scr, acc_scr) = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr = refs
    b_idx = pl.program_id(0)
    ikv = pl.program_id(2)

    @pl.when(ikv == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = lens_ref[b_idx]
    c_start = ikv * page_size

    @pl.when(c_start < length)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]                    # (page_size, d) — page block
        if quantized:
            k = k.astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if quantized:
            s *= ks_ref[0, 0]              # (1, page_size) per-token scales
        s *= sm_scale
        if softcap > 0.0:
            s = jnp.tanh(s / softcap) * softcap
        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_p, page_size), 0)
        cols = c_start + jax.lax.broadcasted_iota(
            jnp.int32, (rows_p, page_size), 1
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
            v = v.astype(q.dtype)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(ikv == num_blocks - 1)
    def _finish():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def paged_flash_decode(
    q: jax.Array,
    cache: PagedKVCache,
    *,
    softmax_scale: Optional[float] = None,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Decode attention against a paged cache.

    q: (b, sq, h, d) new queries (their K/V must already be appended — use
    append_paged_kv first, ≙ the reference's separate knew/vnew append).
    Returns (b, sq, h, d).
    """
    b, sq, h, d = q.shape
    P, hk, page_size, _ = cache.k_pages.shape
    npp = cache.page_table.shape[1]
    g = h // hk
    if softmax_scale is None:
        softmax_scale = d ** -0.5
    rows = sq * g
    rows_p = round_up(max(8, rows), 8)
    qr = q.reshape(b, sq, hk, g, d).transpose(0, 2, 1, 3, 4).reshape(
        b, hk, rows, d
    )
    if rows_p != rows:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rows_p - rows), (0, 0)))

    def page_index(b_, h_, ikv, lens_ref, table_ref):
        # clamp to the last valid block so skipped iterations re-DMA the
        # resident page (no new traffic)
        hi = jnp.maximum((lens_ref[b_] - 1) // page_size, 0)
        blk = jnp.minimum(ikv, hi)
        return (table_ref[b_ * npp + blk], h_, 0, 0)

    quantized = cache.quantized
    kv_specs = [pl.BlockSpec((1, 1, page_size, d), page_index)]
    kv_inputs = [cache.k_pages]
    if quantized:
        kv_specs.append(pl.BlockSpec((1, 1, 1, page_size), page_index))
        kv_inputs.append(cache.k_scales)
    kv_specs.append(pl.BlockSpec((1, 1, page_size, d), page_index))
    kv_inputs.append(cache.v_pages)
    if quantized:
        kv_specs.append(pl.BlockSpec((1, 1, 1, page_size), page_index))
        kv_inputs.append(cache.v_scales)

    out = pl.pallas_call(
        functools.partial(
            _paged_decode_kernel,
            sm_scale=float(softmax_scale), softcap=softcap,
            page_size=page_size, sq=sq, g=g, rows_p=rows_p,
            window_left=window_size[0], num_blocks=npp,
            quantized=quantized,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, hk, npp),
            in_specs=[
                pl.BlockSpec((1, 1, rows_p, d),
                             lambda b_, h_, ikv, *_: (b_, h_, 0, 0)),
            ] + kv_specs,
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
    )(cache.lengths.astype(jnp.int32),
      cache.page_table.reshape(-1).astype(jnp.int32),
      qr, *kv_inputs)
    out = out[:, :, :rows].reshape(b, hk, sq, g, d).transpose(0, 2, 1, 3, 4)
    return out.reshape(b, sq, h, d)


def append_paged_kv(
    cache: PagedKVCache,
    k_new: jax.Array,
    v_new: jax.Array,
    num_valid: Optional[jax.Array] = None,
) -> PagedKVCache:
    """Append sq tokens per sequence into the tail pages (functional;
    ≙ FA3 knew/vnew append, csrc/flash_attn_v3 mainloop append path — with
    sq > 1 this is the paged-PREFILL append for chunked prefill).

    k_new/v_new: (b, hk, sq, d). The page table must already have physical
    pages mapped for the written range (the engine's allocator guarantees
    it); writes past the mapped range land on the reserved trash page.

    num_valid: (b,) int32 tokens to account per sequence. Default keeps the
    decode semantics: slots with lengths == 0 are inactive (continuous
    batching — their length stays 0 and the write lands on the trash page);
    active slots append all sq tokens. Chunked prefill passes num_valid
    explicitly (e.g. to start from an empty slot). Writes are unconditional
    for all sq rows — rows past num_valid land beyond the accounted length
    (clamped out by the kernels, overwritten by later appends).

    The whole append is ONE scatter per pages array (no per-batch loop).
    """
    b, hk, sq, d = k_new.shape
    page_size = cache.page_size
    npp = cache.page_table.shape[1]
    if num_valid is None:
        num_valid = jnp.where(cache.lengths > 0, sq, 0)
    num_valid = jnp.asarray(num_valid, cache.lengths.dtype)
    pos = cache.lengths[:, None] + jnp.arange(sq, dtype=jnp.int32)[None]
    blk = jnp.clip(pos // page_size, 0, npp - 1)
    page_ids = jnp.take_along_axis(cache.page_table, blk, axis=1)  # (b, sq)
    off = pos % page_size
    pid = page_ids.reshape(-1)
    offf = off.reshape(-1)

    def write(pages, new):
        # (b, hk, sq, d) -> (b*sq, hk, d) rows scattered to (page, :, off, :)
        rows = jnp.swapaxes(new, 1, 2).reshape(b * sq, hk, d)
        return pages.at[pid, :, offf, :].set(rows.astype(pages.dtype))

    def write_scale(scales, new_scale):
        # (num_pages, hk, 1, page_size) lane-major: scatter one lane each
        rows = jnp.swapaxes(new_scale[..., 0], 1, 2).reshape(b * sq, hk)
        return scales.at[pid, :, 0, offf].set(rows)

    if cache.quantized:
        from ..ops.quant import quantize_kv

        kq = quantize_kv(k_new, cache.k_pages.dtype)  # per-token scales
        vq = quantize_kv(v_new, cache.v_pages.dtype)
        return PagedKVCache(
            k_pages=write(cache.k_pages, kq.values),
            v_pages=write(cache.v_pages, vq.values),
            page_table=cache.page_table,
            lengths=cache.lengths + num_valid,
            k_scales=write_scale(cache.k_scales, kq.scales),
            v_scales=write_scale(cache.v_scales, vq.scales),
        )

    return PagedKVCache(
        k_pages=write(cache.k_pages, k_new),
        v_pages=write(cache.v_pages, v_new),
        page_table=cache.page_table,
        lengths=cache.lengths + num_valid,
    )


def hk_of(cache: PagedKVCache) -> int:
    return cache.k_pages.shape[1]
