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


def _paged_decode_chunked_kernel(
    lens_ref, table_ref, *refs,
    sm_scale, softcap, page_size, sq, g, rows_p, window_left,
    pages_per_chunk, num_chunks, npp, quantized,
):
    """Multi-page-per-step paged decode.

    One kernel block per PAGE makes the grid-step fixed cost dominate small
    pages (measured 0.52/0.74 of the HBM roofline at page 512/1024 vs 0.89
    contiguous). Here the pages stay unblocked in HBM and each grid step
    gathers `pages_per_chunk` of them into a double-buffered VMEM scratch
    with explicit async copies — the TPU equivalent of the reference's
    TMA paged loads (csrc/flash_attn_v3/paged_kv.h) — then runs ONE
    (rows, C·page) softmax-attention update. The next chunk's copies are
    issued before this chunk's compute, so gathers overlap the math.

    Out-of-range pages clamp to the sequence's last valid page (real data,
    masked out by the causal column mask), so the buffers never hold
    uninitialized values that could turn into NaNs downstream.
    """
    if quantized:
        (q_ref, kp_ref, ks_ref, vp_ref, vs_ref, o_ref,
         kbuf, vbuf, ksbuf, vsbuf, m_scr, l_scr, acc_scr, sems) = refs
    else:
        (q_ref, kp_ref, vp_ref, o_ref, kbuf, vbuf,
         m_scr, l_scr, acc_scr, sems) = refs
        ks_ref = vs_ref = ksbuf = vsbuf = None
    b_idx, h_idx, ic = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    C = pages_per_chunk
    ps = page_size
    length = lens_ref[b_idx]
    nblk = jnp.maximum((length + ps - 1) // ps, 1)

    def transfers(chunk, slot):
        ops = []
        for j in range(C):
            blk = jnp.minimum(chunk * C + j, nblk - 1)
            page = table_ref[b_idx * npp + blk]
            dst = pl.ds(j * ps, ps)
            ops.append(pltpu.make_async_copy(
                kp_ref.at[page, h_idx], kbuf.at[slot, dst],
                sems.at[slot, 0, j]))
            ops.append(pltpu.make_async_copy(
                vp_ref.at[page, h_idx], vbuf.at[slot, dst],
                sems.at[slot, 1, j]))
            if quantized:
                ops.append(pltpu.make_async_copy(
                    ks_ref.at[page, h_idx], ksbuf.at[slot, :, dst],
                    sems.at[slot, 2, j]))
                ops.append(pltpu.make_async_copy(
                    vs_ref.at[page, h_idx], vsbuf.at[slot, :, dst],
                    sems.at[slot, 3, j]))
        return ops

    def issue(chunk, slot):
        for op in transfers(chunk, slot):
            op.start()

    def wait(chunk, slot):
        for op in transfers(chunk, slot):
            op.wait()

    slot = jax.lax.rem(ic, 2)
    other = 1 - slot

    @pl.when(ic == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(jnp.logical_and(ic == 0, length > 0))
    def _first_issue():
        # guarded by length: an empty slot must not leave orphan DMAs
        # whose semaphore counts would desync later sweeps
        issue(0, 0)

    chunk_valid = ic * C * ps < length

    def body(apply_mask):
        wait(ic, slot)

        @pl.when(jnp.logical_and((ic + 1) * C * ps < length,
                                 ic + 1 < num_chunks))
        def _prefetch():
            issue(ic + 1, other)

        q = q_ref[0, 0]
        k = kbuf[slot]
        if quantized:
            k = k.astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if quantized:
            s *= ksbuf[slot]
        s *= sm_scale
        if softcap > 0.0:
            s = jnp.tanh(s / softcap) * softcap

        if apply_mask:
            c_start = ic * C * ps
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (rows_p, C * ps), 0)
            cols = c_start + jax.lax.broadcasted_iota(
                jnp.int32, (rows_p, C * ps), 1)
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
        v = vbuf[slot]
        if quantized:
            p = p * vsbuf[slot]
            v = v.astype(q.dtype)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    # interior chunks skip mask construction entirely (≙ decode_kernel.py's
    # fully-unmasked bypass; lens_ref is scalar-prefetch SMEM, so the
    # branch costs nothing on the data path)
    c_end_s = (ic + 1) * C * ps - 1
    fully_unmasked = c_end_s <= length - sq
    if window_left >= 0:
        fully_unmasked = jnp.logical_and(
            fully_unmasked, ic * C * ps >= length - 1 - window_left)

    @pl.when(jnp.logical_and(chunk_valid, fully_unmasked))
    def _fast():
        body(False)

    @pl.when(jnp.logical_and(chunk_valid, jnp.logical_not(fully_unmasked)))
    def _masked():
        body(True)

    @pl.when(ic == num_chunks - 1)
    def _finish():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


# pages per grid step target: ~4096-token chunks amortize the per-step
# cost to the contiguous kernel's level while keeping page-granular DMA
_CHUNK_TOKENS = 4096


def _paged_decode_chunked(q, cache, qr, *, sm_scale, window_size, softcap,
                          rows_p, g, interp):
    b, sq, h, d = q.shape
    P, hk, ps, _ = cache.k_pages.shape
    npp = cache.page_table.shape[1]
    C = max(1, min(_CHUNK_TOKENS // ps, npp))
    num_chunks = -(-npp // C)
    quantized = cache.quantized

    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    kv_specs, kv_inputs = [hbm], [cache.k_pages]
    if quantized:
        kv_specs.append(hbm)
        kv_inputs.append(cache.k_scales)
    kv_specs.append(hbm)
    kv_inputs.append(cache.v_pages)
    if quantized:
        kv_specs.append(hbm)
        kv_inputs.append(cache.v_scales)

    scratch = [
        pltpu.VMEM((2, C * ps, d), cache.k_pages.dtype),
        pltpu.VMEM((2, C * ps, d), cache.v_pages.dtype),
    ]
    if quantized:
        scratch += [
            pltpu.VMEM((2, 1, C * ps), jnp.float32),
            pltpu.VMEM((2, 1, C * ps), jnp.float32),
        ]
    scratch += [
        pltpu.VMEM((rows_p, MIN_LANES), jnp.float32),
        pltpu.VMEM((rows_p, MIN_LANES), jnp.float32),
        pltpu.VMEM((rows_p, d), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 4 if quantized else 2, C)),
    ]

    out = pl.pallas_call(
        functools.partial(
            _paged_decode_chunked_kernel,
            sm_scale=float(sm_scale), softcap=softcap,
            page_size=ps, sq=sq, g=g, rows_p=rows_p,
            window_left=window_size[0],
            pages_per_chunk=C, num_chunks=num_chunks, npp=npp,
            quantized=quantized,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, hk, num_chunks),
            in_specs=[
                pl.BlockSpec((1, 1, rows_p, d),
                             lambda b_, h_, ikv, *_: (b_, h_, 0, 0)),
            ] + kv_specs,
            out_specs=pl.BlockSpec(
                (1, 1, rows_p, d), lambda b_, h_, ikv, *_: (b_, h_, 0, 0)
            ),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hk, rows_p, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interp,
    )(cache.lengths.astype(jnp.int32),
      cache.page_table.reshape(-1).astype(jnp.int32),
      qr, *kv_inputs)
    return out


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

    interp = interpret_mode() if interpret is None else interpret
    if page_size < _CHUNK_TOKENS and npp > 1:
        out = _paged_decode_chunked(
            q, cache, qr, sm_scale=softmax_scale, window_size=window_size,
            softcap=softcap, rows_p=rows_p, g=g, interp=interp,
        )
        out = out[:, :, :rows].reshape(
            b, hk, sq, g, d).transpose(0, 2, 1, 3, 4)
        return out.reshape(b, sq, h, d)

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
        interpret=interp,
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
