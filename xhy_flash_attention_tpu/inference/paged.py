"""Paged KV cache + paged flash-decode kernel.

≙ reference FA3 paged-KV decode (csrc/flash_attn_v3/paged_kv.h; C API
page_table/page_size params, flash_api.h:100-150) and appending-KV
(knew/vnew + cu_seqlens_knew).

TPU design:
  * a page is ONE contiguous record holding both K and V rows —
    kv_pages (num_pages, kv_heads, 2, page_size, head_dim) — so the
    scattered gather costs ONE DMA descriptor per page. This is the
    binding constraint on TPU paged decode: page gathers are issued by
    the scalar core (~100 cycles per descriptor) while a 64 KB page
    costs ~80 ns of HBM time, so a 4-descriptor-per-page layout
    (k, v, k-scales, v-scales) runs descriptor-bound at ~0.55 of the
    HBM roofline; the packed record + linear scales reach ~0.88
    (the contiguous-cache kernel's level);
  * quantization scales are NOT paged: they are 1.5% of the cache bytes,
    so they live in a per-sequence linear buffer kv_scales
    (batch, kv_heads, 2, max_seq) fp32 and stream through the regular
    auto-pipelined BlockSpec path with zero manual descriptors;
  * the chunked kernel gathers `pages_per_chunk` pages per grid step into
    a double-buffered VMEM scratch with explicit async copies, and every
    gather is issued one grid step AHEAD — including across (batch, head)
    cell boundaries (scalar-prefetched next-valid-cell table + an SMEM
    slot counter, so empty continuous-batching slots cannot desync the
    double buffering) — the manual-DMA equivalent of the automatic
    cross-step pipelining behind the contiguous kernel's 0.89 roofline
    (the TPU counterpart of the reference's TMA paged loads,
    csrc/flash_attn_v3/paged_kv.h);
  * append (the reference's knew/vnew path) is a functional scatter into
    the tail pages, jit-fused with the decode step;
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

from ..ops.flash_attention.common import (
    FP8_TINY_REBIAS,
    NEG_INF,
    fp8_to_f32_tiny,
    interpret_mode,
    round_up,
)

MIN_LANES = 128

__all__ = ["PagedKVCache", "paged_flash_decode", "append_paged_kv"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """One layer's paged KV storage (a pytree; jit-friendly).

    kv_pages: (num_pages, kv_heads, 2, page_size, head_dim) — index 0 on
        the third axis is K, 1 is V. One page = one contiguous HBM record
        = one gather descriptor (see module docstring).
    page_table: (batch, max_pages_per_seq) int32 — physical page per
        logical block; entries past the sequence's pages are arbitrary
        (clamped by `lengths` in the kernel).
    lengths: (batch,) int32 — valid tokens per sequence.
    kv_scales: None for bf16 pages; (batch, kv_heads, 2, max_pages_per_seq
        * page_size) fp32 per-token K/V scales in SEQUENCE-linear layout
        (not paged — auto-pipelined into the kernel, dequant fused into
        the decode matmuls; ≙ FA3 k_descale/v_descale with a paged INT8
        cache, BASELINE config #3).
    """

    kv_pages: jax.Array
    page_table: jax.Array
    lengths: jax.Array
    kv_scales: Optional[jax.Array] = None

    @property
    def k_pages(self) -> jax.Array:
        return self.kv_pages[:, :, 0]

    @property
    def v_pages(self) -> jax.Array:
        return self.kv_pages[:, :, 1]

    @property
    def page_size(self) -> int:
        return self.kv_pages.shape[3]

    @property
    def quantized(self) -> bool:
        return self.kv_scales is not None

    @staticmethod
    def create(num_pages: int, kv_heads: int, page_size: int, head_dim: int,
               batch: int, max_pages_per_seq: int,
               dtype=jnp.bfloat16) -> "PagedKVCache":
        quant = jnp.dtype(dtype) in (jnp.dtype(jnp.int8),
                                     jnp.dtype(jnp.float8_e4m3fn))
        sc = (jnp.ones((batch, kv_heads, 2, max_pages_per_seq * page_size),
                       jnp.float32) if quant else None)
        return PagedKVCache(
            kv_pages=jnp.zeros(
                (num_pages, kv_heads, 2, page_size, head_dim), dtype),
            page_table=jnp.zeros((batch, max_pages_per_seq), jnp.int32),
            lengths=jnp.zeros((batch,), jnp.int32),
            kv_scales=sc,
        )

    @staticmethod
    def from_kv(k_pages: jax.Array, v_pages: jax.Array,
                page_table: jax.Array, lengths: jax.Array,
                k_scales: Optional[jax.Array] = None,
                v_scales: Optional[jax.Array] = None) -> "PagedKVCache":
        """Build from separate K/V page arrays (num_pages, kv_heads,
        page_size, head_dim) and, optionally, page-layout scales
        (num_pages, kv_heads, 1, page_size) — packs the pages and gathers
        the scales into the linear layout via the page table."""
        kv = jnp.stack([k_pages, v_pages], axis=2)
        sc = None
        if k_scales is not None:
            b, npp = page_table.shape
            hk, ps = k_pages.shape[1], k_pages.shape[2]

            def lin(s):
                g = jnp.take(s[:, :, 0, :], page_table, axis=0)
                return jnp.transpose(g, (0, 2, 1, 3)).reshape(
                    b, hk, npp * ps)

            sc = jnp.stack([lin(k_scales), lin(v_scales)], axis=2)
        return PagedKVCache(kv, page_table, lengths, sc)


def _rebias_scales(cache) -> jax.Array:
    """Per-token scales for the decode kernels: fp8 pages fold the
    exponent rebias (common.fp8_to_f32_tiny) into the scales here, one
    XLA pass over the 1.5%-of-cache scale buffer per call."""
    if jnp.dtype(cache.kv_pages.dtype) == jnp.dtype(jnp.float8_e4m3fn):
        return cache.kv_scales * jnp.float32(FP8_TINY_REBIAS)
    return cache.kv_scales


def _paged_decode_kernel(lens_ref, table_ref, *refs,
                         sm_scale, softcap, page_size, sq, g, rows_p,
                         window_left, num_blocks, quantized):
    if quantized:
        q_ref, kv_ref, sc_ref, o_ref, m_scr, l_scr, acc_scr = refs
    else:
        q_ref, kv_ref, o_ref, m_scr, l_scr, acc_scr = refs
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
        k = kv_ref[0, 0, 0]                # (page_size, d) — page block
        if quantized:
            k = fp8_to_f32_tiny(k).astype(q.dtype) \
                if k.dtype == jnp.float8_e4m3fn else k.astype(q.dtype)
            sc = sc_ref[0, 0]              # (2, page_size) linear scales
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if quantized:
            s *= sc[0:1]                   # (1, page_size) per-token scales
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
        v = kv_ref[0, 0, 1]
        if quantized:
            p = p * sc[1:2]
            v = fp8_to_f32_tiny(v).astype(q.dtype) \
                if v.dtype == jnp.float8_e4m3fn else v.astype(q.dtype)
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
    lens_ref, table_ref, nxt_ref, *refs,
    sm_scale, softcap, page_size, sq, g, rows_p, window_left,
    pages_per_chunk, num_chunks, npp, num_pages, nh, quantized,
    guard_invalid,
):
    """Multi-page-per-step paged decode over packed one-descriptor pages.

    One kernel block per PAGE makes the grid-step fixed cost dominate
    small pages; one DMA descriptor per tensor per page makes the scalar
    core the bottleneck (see module docstring). Here each grid step
    gathers `pages_per_chunk` packed pages into a double-buffered VMEM
    scratch — one async copy per page — and runs ONE (rows, C·page)
    softmax-attention update; scales stream through the automatic
    pipeline. Every gather is issued one grid step ahead, including
    across (b, h) cell boundaries: the issue slot comes from an SMEM
    counter of processed valid chunks (not the raw grid step), and the
    cross-cell target skips empty continuous-batching slots via the
    scalar-prefetched next-valid-cell table, so no orphan DMA is ever
    issued and semaphore counts stay balanced.
    """
    if quantized:
        q_ref, kvp_ref, sc_ref, o_ref, kvbuf, m_scr, l_scr, acc_scr, \
            cnt_ref, sems = refs
    else:
        q_ref, kvp_ref, o_ref, kvbuf, m_scr, l_scr, acc_scr, \
            cnt_ref, sems = refs
        sc_ref = None
    b_idx, h_idx, ic = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    C = pages_per_chunk
    ps = page_size
    length = lens_ref[b_idx]
    n_cells = pl.num_programs(0) * nh
    cell = b_idx * nh + h_idx

    def transfers(bb, hh, chunk, slot):
        # (op, valid) per page. With guard_invalid (compiled mode), pages
        # past the sequence's last block are neither issued nor waited
        # (chunks are large — C*ps tokens — so clamped re-gathers would
        # multiply short sequences' traffic); issue and wait reconstruct
        # the SAME validity predicate from prefetched lengths, so
        # semaphore counts stay balanced. Interpret mode always copies
        # the clamped page instead: its DMA emulation mishandles
        # pl.when-predicated copies (observed: every copy skipped), and
        # the clamped copy is numerically identical — the masked branch
        # discards those columns either way.
        ln = lens_ref[bb]
        nblk = jnp.maximum((ln + ps - 1) // ps, 1)
        ops = []
        for j in range(C):
            blk = jnp.minimum(chunk * C + j, nblk - 1)
            page = jnp.clip(table_ref[bb * npp + blk], 0, num_pages - 1)
            valid = jnp.logical_or((chunk * C + j) * ps < ln, j == 0)
            ops.append((pltpu.make_async_copy(
                kvp_ref.at[page, hh],
                kvbuf.at[slot, :, pl.ds(j * ps, ps)],
                sems.at[slot, j]), valid))
        return ops

    def _each(ops, fn):
        for op, valid in ops:
            if guard_invalid:
                @pl.when(valid)
                def _go(op=op, fn=fn):
                    fn(op)
            else:
                fn(op)

    def issue(bb, hh, chunk, slot):
        _each(transfers(bb, hh, chunk, slot), lambda op: op.start())

    def wait(bb, hh, chunk, slot):
        _each(transfers(bb, hh, chunk, slot), lambda op: op.wait())

    @pl.when(jnp.logical_and(cell == 0, ic == 0))
    def _init_cnt():
        cnt_ref[0] = 0

    @pl.when(ic == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    chunk_valid = ic * C * ps < length
    cnt = cnt_ref[0]

    @pl.when(jnp.logical_and(chunk_valid, cnt == 0))
    def _bootstrap():
        # globally-first valid chunk (always ic == 0 of the first live
        # cell): nobody issued ahead for it
        issue(b_idx, h_idx, 0, 0)

    def body(apply_mask):
        slot = jax.lax.rem(cnt, 2)

        # issue the NEXT valid chunk's gather before waiting on ours —
        # same cell's next chunk, or chunk 0 of the next live cell
        nxt_same = jnp.logical_and(
            ic + 1 < num_chunks, (ic + 1) * C * ps < length)
        cnext = nxt_ref[jnp.minimum(cell + 1, n_cells)]
        tb = jnp.where(nxt_same, b_idx, cnext // nh)
        th = jnp.where(nxt_same, h_idx, cnext - (cnext // nh) * nh)
        tic = jnp.where(nxt_same, ic + 1, 0)
        have = jnp.logical_or(nxt_same, cnext < n_cells)

        @pl.when(have)
        def _prefetch():
            issue(jnp.minimum(tb, pl.num_programs(0) - 1), th, tic,
                  1 - slot)

        wait(b_idx, h_idx, ic, slot)

        q = q_ref[0, 0]
        kv = kvbuf[slot]
        k = fp8_to_f32_tiny(kv[0]).astype(q.dtype) \
            if kv.dtype == jnp.float8_e4m3fn else kv[0].astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if quantized:
            sc = sc_ref[0, 0]              # (2, C*ps) linear scales
            s *= sc[0:1]
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
        v = fp8_to_f32_tiny(kv[1]).astype(q.dtype) \
            if kv.dtype == jnp.float8_e4m3fn else kv[1].astype(q.dtype)
        if quantized:
            p = p * sc_ref[0, 0][1:2]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv
        cnt_ref[0] = cnt + 1

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


# pages per grid step target: bigger chunks amortize the per-step cost
# (v5e, packed pages, page 512, Llama-3-8B-geometry INT8 decode: 0.51 /
# 0.69 / 0.85 / 0.87 of the HBM roofline at 1k/2k/4k/8k-token chunks);
# per-page validity guards in transfers() keep short sequences from
# paying the large chunk's gather
_CHUNK_TOKENS = 8192


def _paged_decode_chunked(q, cache, qr, *, sm_scale, window_size, softcap,
                          rows_p, g, interp):
    b, sq, h, d = q.shape
    P, hk, _, ps, _ = cache.kv_pages.shape
    npp = cache.page_table.shape[1]
    C = max(1, min(_CHUNK_TOKENS // ps, npp))
    num_chunks = -(-npp // C)
    quantized = cache.quantized
    n_cells = b * hk

    # next-valid-cell table: nxt[c] = first cell index >= c whose batch
    # slot has tokens (n_cells if none) — lets the kernel's issue-ahead
    # hop over empty continuous-batching slots without a scalar loop
    live = jnp.repeat(cache.lengths > 0, hk)
    idxs = jnp.where(live, jnp.arange(n_cells, dtype=jnp.int32),
                     jnp.int32(n_cells))
    nxt = jax.lax.associative_scan(jnp.minimum, idxs, reverse=True)
    nxt_tab = jnp.concatenate(
        [nxt, jnp.full((1,), n_cells, jnp.int32)])

    kv_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
    kv_inputs = [cache.kv_pages]
    if quantized:
        kv_specs.append(pl.BlockSpec(
            (1, 1, 2, C * ps), lambda b_, h_, ic, *_: (b_, h_, 0, ic)))
        kv_inputs.append(_rebias_scales(cache))

    scratch = [
        pltpu.VMEM((2, 2, C * ps, d), cache.kv_pages.dtype),
        pltpu.VMEM((rows_p, MIN_LANES), jnp.float32),
        pltpu.VMEM((rows_p, MIN_LANES), jnp.float32),
        pltpu.VMEM((rows_p, d), jnp.float32),
        pltpu.SMEM((1,), jnp.int32),
        pltpu.SemaphoreType.DMA((2, C)),
    ]

    out = pl.pallas_call(
        functools.partial(
            _paged_decode_chunked_kernel,
            sm_scale=float(sm_scale), softcap=softcap,
            page_size=ps, sq=sq, g=g, rows_p=rows_p,
            window_left=window_size[0],
            pages_per_chunk=C, num_chunks=num_chunks, npp=npp,
            num_pages=P, nh=hk, quantized=quantized,
            guard_invalid=not interp,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, hk, num_chunks),
            in_specs=[
                pl.BlockSpec((1, 1, rows_p, d),
                             lambda b_, h_, ic, *_: (b_, h_, 0, 0)),
            ] + kv_specs,
            out_specs=pl.BlockSpec(
                (1, 1, rows_p, d), lambda b_, h_, ic, *_: (b_, h_, 0, 0)
            ),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hk, rows_p, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            # strictly sequential row-major execution: the cross-cell
            # issue-ahead depends on the grid order
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # the double-buffered packed kvbuf alone is 2*2*C*ps*d bytes
            # (16.8 MB at d=256 bf16 with 8k-token chunks) — over the
            # 16 MB scoped-VMEM default; v5e has headroom (CLAUDE.md)
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interp,
    )(cache.lengths.astype(jnp.int32),
      cache.page_table.reshape(-1).astype(jnp.int32),
      nxt_tab,
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
    P, hk, _, page_size, _ = cache.kv_pages.shape
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
    # the chunked kernel's manual HBM page slices need the lane dim
    # 128-aligned (Mosaic tiled-memref slicing); other head dims take the
    # BlockSpec-pipelined one-page-per-step kernel
    if page_size < _CHUNK_TOKENS and npp > 1 and d % 128 == 0:
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
        return (table_ref[b_ * npp + blk], h_, 0, 0, 0)

    quantized = cache.quantized
    kv_specs = [pl.BlockSpec((1, 1, 2, page_size, d), page_index)]
    kv_inputs = [cache.kv_pages]
    if quantized:
        kv_specs.append(pl.BlockSpec(
            (1, 1, 2, page_size),
            lambda b_, h_, ikv, *_: (b_, h_, 0, ikv)))
        kv_inputs.append(_rebias_scales(cache))

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

    def write(pages, k_rows, v_rows):
        # (b, hk, sq, d) -> (b*sq, hk, 2, d) rows scattered to
        # (page, :, :, off, :) — one scatter covers both K and V
        rows = jnp.stack([
            jnp.swapaxes(k_rows, 1, 2).reshape(b * sq, hk, d),
            jnp.swapaxes(v_rows, 1, 2).reshape(b * sq, hk, d),
        ], axis=2)
        return pages.at[pid, :, :, offf, :].set(rows.astype(pages.dtype))

    if cache.quantized:
        from ..ops.quant import quantize_kv

        kq = quantize_kv(k_new, cache.kv_pages.dtype)  # per-token scales
        vq = quantize_kv(v_new, cache.kv_pages.dtype)
        # linear scales: write at the global positions directly
        sc_rows = jnp.stack([
            jnp.swapaxes(kq.scales[..., 0], 1, 2),  # (b, sq, hk)
            jnp.swapaxes(vq.scales[..., 0], 1, 2),
        ], axis=-1)                                  # (b, sq, hk, 2)
        # overflow tokens (slot at capacity): the K/V row lands on the
        # trash page via the page table, but the linear scale buffer has
        # no sink — DROP out-of-range writes instead of clamping them
        # onto the last real token's scale
        bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
        kv_scales = cache.kv_scales.at[
            bidx, :, :, pos].set(sc_rows, mode="drop")
        return PagedKVCache(
            kv_pages=write(cache.kv_pages, kq.values, vq.values),
            page_table=cache.page_table,
            lengths=cache.lengths + num_valid,
            kv_scales=kv_scales,
        )

    return PagedKVCache(
        kv_pages=write(cache.kv_pages, k_new, v_new),
        page_table=cache.page_table,
        lengths=cache.lengths + num_valid,
    )


def hk_of(cache: PagedKVCache) -> int:
    return cache.kv_pages.shape[1]
