"""FlashAttention-2 forward — Pallas TPU kernel.

TPU-native re-design of the reference CUDA forward
(csrc/flash_attn/src/flash_fwd_kernel.h:122 `compute_attn_1rowblock`):

* the CUDA CTA grid (batch, heads, q-blocks) with an in-kernel reverse KV loop
  becomes a Pallas grid (batch, heads, q-blocks, kv-blocks) where the KV axis
  is the innermost "arbitrary" (sequential) dimension and VMEM scratch carries
  the online-softmax state (m, l, acc) across KV steps;
* smem tiles + cp.async double buffering become BlockSpec-driven automatic
  VMEM pipelining;
* the `BOOL_SWITCH` compile-time dispatch (static_switch.h) is simply Python
  trace-time specialization under `jax.jit`;
* causal/sliding-window block skipping (`n_block_max` clamp,
  flash_fwd_kernel.h:147-153) becomes `@pl.when` guards plus index-map
  clamping so skipped KV iterations re-use the resident VMEM block and issue
  no HBM traffic;
* MQA/GQA head broadcast (`h_h_k_ratio`) is an index-map division — K/V are
  never materialized per-Q-head;
* the fully-masked-block skip / fully-unmasked-block bypass of FlashMask
  (flash_fwd_kernel.h:1305-1349) is a two-branch kernel body: boundary blocks
  take the masked path, interior blocks skip all VPU mask work.

Dropout uses the TPU core PRNG (pltpu.prng_seed / prng_random_bits) seeded
deterministically per (batch, head, q-block, kv-block) so the backward pass
regenerates the identical mask — replacing the reference's Philox state.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import (
    FM_NV,
    NEG_INF,
    BlockSizes,
    cdiv,
    dropout_keep_mask,
    expand_block_mask,
    fm_banned,
    fm_block_stats,
    fm_pad_vecs,
    fm_skip_bypass,
    FP8_TINY_REBIAS,
    fp8_to_f32_tiny,
    interpret_mode,
    pad_to_block,
    stats_packed_ok,
)

MIN_LANES = 128

# Zero-seeded deferred-shift softmax (see _fwd_kernel._init): every block
# runs the pipelined deferred path instead of seeding the shift with a
# serialized pass on each row's first KV block. Exact to fp32 rounding
# while row maxima stay under the +70 clamp. XFA_ZERO_SEED=0 restores the
# seeded variant (A/B lever).
ZERO_SEED = os.environ.get("XFA_ZERO_SEED", "1") == "1"

# Flat causal iteration (dead-step-free lower-triangle grid; see
# flash_attention_fwd). XFA_FLAT_CAUSAL=0 restores the rectangular
# grid (A/B lever).
FLAT_CAUSAL = os.environ.get("XFA_FLAT_CAUSAL", "1") == "1"

# Single-KV-block direct path (no online-softmax state; see
# _fwd_kernel.body). XFA_SINGLE_SHOT=0 restores the deferred path at
# nkv == 1 (A/B lever).
SINGLE_SHOT = os.environ.get("XFA_SINGLE_SHOT", "1") == "1"


def _fwd_kernel(
    refs,
    *,
    sm_scale: float,
    has_right: bool,
    has_left: bool,
    window: Tuple[int, int],
    offset: int,
    softcap: float,
    has_bias: bool,
    has_segments: bool,
    dropout_p: float,
    seqlen_q: int,
    seqlen_k: int,
    block_q: int,
    block_k: int,
    num_kv_blocks: int,
    need_lse: bool,
    fm_mode: Optional[str] = None,
    fm_heads: int = 1,
    has_blockmask: bool = False,
    bm_heads: int = 1,
    num_q_blocks: int = 1,
    has_positions: bool = False,
    has_eff: bool = False,
    deferred: bool = False,
    pos_window: Tuple[int, int] = (-1, -1),
    has_segstats: bool = False,
    diag_mask_tile: bool = False,
    zero_seed: bool = False,
    flat_iter: bool = False,
    stats_packed: bool = False,
    single_shot: bool = False,
    fp8: bool = False,
    kv_heads: int = 1,
    dsc_n: int = 0,
):
    it = iter(refs)
    if fp8:
        dsc_ref = next(it)
    if dropout_p > 0.0:
        seed_ref = next(it)
    if fm_mode is not None:
        fmstats_ref = next(it)
    if has_blockmask:
        bm_ref = next(it)
    if has_positions:
        qpstats_ref = next(it)
        kpstats_ref = next(it)
    if has_segstats:
        qsst_ref = next(it)
        ksst_ref = next(it)
    if has_eff:
        next(it)  # effective-kv DMA table: consumed by the index maps only
    if flat_iter:
        iqt_ref = next(it)
        ikvt_ref = next(it)
    q_ref = next(it)
    k_ref = next(it)
    v_ref = next(it)
    dmask_ref = next(it) if diag_mask_tile else None
    bias_ref = next(it) if has_bias else None
    qseg_ref = next(it) if has_segments else None
    kseg_ref = next(it) if has_segments else None
    fm_ref = next(it) if fm_mode is not None else None
    qpos_ref = next(it) if has_positions else None
    kpos_ref = next(it) if has_positions else None
    o_ref = next(it)
    lse_ref = next(it) if need_lse else None
    m_scr = next(it)
    l_scr = next(it)
    acc_scr = next(it)

    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    if fp8:
        # FP8 e4m3 inputs with per-(batch, kv-head) descale (≙ FA3
        # q/k/v_descale, csrc/flash_attn_v3/flash_api.h:69-78; like the
        # reference, q_descale is indexed by the KV head of the group).
        # qd*kd folds into the softmax scale at the MXU input; vd is
        # linear in the accumulator and folds into the output epilogue.
        hk_idx = h_idx // (pl.num_programs(1) // kv_heads)
        dsc_i = b_idx * kv_heads + hk_idx
        # the tiny-value reconstruction (fp8_to_f32_tiny) leaves q/k/v at
        # value * 2^-120; q's and v's rebias factors fold into these
        # per-block scalars (k keeps its own fmul — folding BOTH factors
        # here would need 2^240, which overflows f32)
        qd_kd = (dsc_ref[dsc_i] * dsc_ref[dsc_n + dsc_i]
                 * jnp.float32(FP8_TINY_REBIAS))
        v_descale = dsc_ref[2 * dsc_n + dsc_i] * jnp.float32(
            FP8_TINY_REBIAS)
    else:
        qd_kd = v_descale = None
    if flat_iter:
        # Flat windowed iteration: the (iq, kv) plane is collapsed to ONE
        # sequential axis that enumerates only each row's visible KV
        # blocks (scalar-prefetched tables), so the masked steps of the
        # rectangular grid never run at all (≙ the reference's
        # n_block_min/max clamps, flash_fwd_kernel.h:147-153 — there the
        # inner KV loop simply starts/stops at the window edge). Row
        # boundaries come from neighbor-table comparisons: iq_tab carries
        # a trailing -1 sentinel so `row_last` is well-defined at the
        # final step.
        t = pl.program_id(2)
        iq = iqt_ref[t]
        ikv = ikvt_ref[t]
        row_first = jnp.logical_or(
            t == 0, iqt_ref[jnp.maximum(t - 1, 0)] != iq
        )
        row_last = iqt_ref[t + 1] != iq
    else:
        iq = pl.program_id(2)
        ikv = pl.program_id(3)
        row_first = ikv == 0
        row_last = ikv == num_kv_blocks - 1

    # single_shot bypasses the scratch state entirely (body writes o/lse
    # directly); _init/_finish are not traced at all then
    if not single_shot:
        @pl.when(row_first)
        def _init():
            if deferred and zero_seed:
                # Zero-seeded deferred shift: EVERY block (including ikv == 0)
                # runs the pipelined deferred path — no serialized seed pass.
                # Starting the shift at 0 is safe: exp(min(s - 0, 70)) bounds
                # the unnormalized weights by e^70 (psum/acc stay far inside
                # fp32), the shift cancels exactly in _finish (lse = m +
                # log(l) is shift-invariant), and for scores under the clamp
                # the math is exact to fp32 rounding. For causal this removes
                # the serialized path from the ~40% of useful blocks that are
                # a row's first (vs 25% non-causal) — the main cost of the
                # seeded variant.
                m_scr[...] = jnp.zeros_like(m_scr)
            else:
                m_scr[...] = jnp.full_like(m_scr, NEG_INF)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

    q_start = iq * block_q
    c_start = ikv * block_k
    q_last_real = jnp.minimum(q_start + block_q, seqlen_q) - 1
    c_last = c_start + block_k - 1
    c_last_real = jnp.minimum(c_last, seqlen_k - 1)

    should_run = jnp.logical_and(q_start < seqlen_q, c_start < seqlen_k)
    if has_right:
        should_run = jnp.logical_and(
            should_run, c_start <= q_last_real + offset + window[1]
        )
    if has_left:
        should_run = jnp.logical_and(
            should_run, c_last_real >= q_start + offset - window[0]
        )

    # Fully-unmasked bypass: interior blocks skip all positional mask work
    # (≙ reference full-block bypass, flash_fwd_kernel.h:1347-1349).
    fully_unmasked = c_last < seqlen_k
    if has_right:
        fully_unmasked = jnp.logical_and(
            fully_unmasked, c_last <= q_start + offset + window[1]
        )
    if has_left:
        fully_unmasked = jnp.logical_and(
            fully_unmasked, c_start >= q_start + block_q - 1 + offset - window[0]
        )

    if fm_mode is not None:
        # Block skip / bypass from scalar-prefetched per-block max/min
        # (≙ SPARSE_MASKED / enable_mask_bypass, flash_fwd_kernel.h:1305-1349).
        hm_idx = h_idx // (pl.num_programs(1) // fm_heads) if fm_heads > 1 else 0
        fm_nv = FM_NV[fm_mode]
        base = ((b_idx * fm_heads + hm_idx) * num_kv_blocks + ikv) * (fm_nv * 2)
        fm_skip, fm_bypass = fm_skip_bypass(
            fm_mode, lambda v, w: fmstats_ref[base + v * 2 + w],
            q_start, q_last_real + 1,
        )
        should_run = jnp.logical_and(should_run, jnp.logical_not(fm_skip))
        fully_unmasked = jnp.logical_and(fully_unmasked, fm_bypass)

    if has_blockmask:
        # Blocksparse: skip (q-block, kv-block) tiles the block mask turns off
        # (≙ FA1 blocksparse fmha_block_fprop_kernel_1xN.h / blockmask of
        # flash_blocksparse_attn_interface.py — here tile-granular grid
        # pruning via a scalar-prefetched mask).
        bm_idx = h_idx // (pl.num_programs(1) // bm_heads) if bm_heads > 1 else 0
        bbase = ((b_idx * bm_heads + bm_idx) * num_q_blocks + iq) * num_kv_blocks
        should_run = jnp.logical_and(should_run, bm_ref[bbase + ikv] != 0)

    if has_positions:
        # Position-window masking (ring attention global positions / varlen
        # per-sequence positions — traced values the static `offset` can't
        # express). pos_window carries the causal/sliding bounds ON THE
        # POSITIONS; the global row/col window machinery is disabled by the
        # caller when positions are present. Block-level skip and
        # elementwise bypass from scalar-prefetched per-block [min, max].
        q_lo = qpstats_ref[(b_idx * num_q_blocks + iq) * 2]
        q_hi = qpstats_ref[(b_idx * num_q_blocks + iq) * 2 + 1]
        k_lo = kpstats_ref[(b_idx * num_kv_blocks + ikv) * 2]
        k_hi = kpstats_ref[(b_idx * num_kv_blocks + ikv) * 2 + 1]
        if pos_window[1] >= 0:
            should_run = jnp.logical_and(
                should_run, k_lo <= q_hi + pos_window[1]
            )
            fully_unmasked = jnp.logical_and(
                fully_unmasked, k_hi <= q_lo + pos_window[1]
            )
        if pos_window[0] >= 0:
            should_run = jnp.logical_and(
                should_run, k_hi >= q_lo - pos_window[0]
            )
            fully_unmasked = jnp.logical_and(
                fully_unmasked, k_lo >= q_hi - pos_window[0]
            )

    if has_segstats:
        # Segment-range block skip/bypass (varlen ≙ reference BlockInfo
        # KV-range bounds): block pairs whose segment-id ranges don't
        # overlap are skipped; single-matching-segment pairs bypass the
        # elementwise segment mask.
        q_mn = qsst_ref[(b_idx * num_q_blocks + iq) * 2]
        q_mx = qsst_ref[(b_idx * num_q_blocks + iq) * 2 + 1]
        k_mn = ksst_ref[(b_idx * num_kv_blocks + ikv) * 2]
        k_mx = ksst_ref[(b_idx * num_kv_blocks + ikv) * 2 + 1]
        should_run = jnp.logical_and(
            should_run,
            jnp.logical_and(q_mn <= k_mx, k_mn <= q_mx),
        )
        fully_unmasked = jnp.logical_and(
            fully_unmasked,
            jnp.logical_and(
                jnp.logical_and(q_mn == q_mx, k_mn == k_mx), q_mn == k_mn
            ),
        )

    def _apply_dropout(p):
        if dropout_p <= 0.0:
            return p
        # Position-keyed counter RNG (≙ Philox): identical bits in bwd
        # regardless of tiling.
        rows_g = q_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0
        )
        cols_g = c_start + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1
        )
        keep = dropout_keep_mask(
            seed_ref[0], b_idx * pl.num_programs(1) + h_idx,
            rows_g, cols_g, dropout_p,
        )
        return jnp.where(keep, p, 0.0) * (1.0 / (1.0 - dropout_p))

    def body(apply_position_mask: bool, defer: bool = False):
        # fold the softmax scale into the (bq, d) q tile instead of the
        # (bq, bk) score matrix — d/bk fewer VPU ops; this is the
        # reorder_ops=True operand ordering the reference's low-precision
        # baseline defines the error contract around
        if fp8:
            # dequant fused at the MXU input: v5e has no fp8 MXU, so the
            # e4m3 payload converts to bf16 in VMEM (half the HBM bytes of
            # bf16 inputs either way) via the integer bit-reconstruction
            # (common.fp8_to_f32 — 4x Mosaic's emulated astype); qd*kd
            # rides the same q-tile scale multiply the bf16 path already
            # pays for sm_scale
            q = (fp8_to_f32_tiny(q_ref[0, 0])
                 * (sm_scale * qd_kd)).astype(jnp.bfloat16)
            k = (fp8_to_f32_tiny(k_ref[0, 0])
                 * jnp.float32(FP8_TINY_REBIAS)).astype(jnp.bfloat16)
        else:
            q = (q_ref[0, 0].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
            k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if softcap > 0.0:
            s = jnp.tanh(s / softcap) * softcap
        if has_bias:
            s += bias_ref[0, 0].astype(jnp.float32)
        if apply_position_mask and diag_mask_tile:
            # pure aligned causal: every masked block is a diagonal block
            # and shares ONE (bq, bk) additive mask pattern — a resident
            # VMEM tile (constant index map -> fetched once) replaces the
            # per-block iota/compare/where passes with a single add
            s += dmask_ref[...].astype(jnp.float32)
        elif apply_position_mask:
            rows = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            cols = c_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            mask = cols < seqlen_k
            if has_right:
                mask = jnp.logical_and(mask, cols <= rows + offset + window[1])
            if has_left:
                mask = jnp.logical_and(mask, cols >= rows + offset - window[0])
            if fm_mode is not None:
                mask = jnp.logical_and(
                    mask, jnp.logical_not(fm_banned(fm_mode, fm_ref[0, 0], rows))
                )
            if has_positions:
                qpos = qpos_ref[0]   # (bq, 1)
                kpos = kpos_ref[0]   # (1, bk)
                if pos_window[1] >= 0:
                    mask = jnp.logical_and(mask, kpos <= qpos + pos_window[1])
                if pos_window[0] >= 0:
                    mask = jnp.logical_and(mask, kpos >= qpos - pos_window[0])
            s = jnp.where(mask, s, NEG_INF)
        if has_segments and apply_position_mask:
            # single-matching-segment block pairs take the fast branch
            # (fully_unmasked includes the segment-stats bypass)
            qseg = qseg_ref[0]        # (bq, 1)
            kseg = kseg_ref[0]        # (1, bk)
            s = jnp.where(qseg == kseg, s, NEG_INF)

        v = fp8_to_f32_tiny(v_ref[0, 0]).astype(jnp.bfloat16) \
            if fp8 else v_ref[0, 0]
        if single_shot:
            # Single-KV-block direct path (the s<=1024 training shapes at
            # 1024^2 tiles): the row's ONLY block computes the complete
            # softmax in one pass and writes o/lse straight out — no
            # running max (zero-shift exp, same min(s, 70) bound and
            # semantics as the zero-seeded deferred path), no m/l/acc
            # scratch round-trips, no _init/_finish steps. Measured
            # against a toy bound (benchmarks/ab_mxu_vpu_overlap.py): the
            # deferred machinery cost ~0.4 us of the 3.9 us step at the
            # gpt2 shape (b4 h16 s1024 d64).
            pt = jnp.exp(jnp.minimum(s, 70.0))
            psum = jnp.sum(pt, axis=-1, keepdims=True)
            pt = _apply_dropout(pt)
            pv = jax.lax.dot_general(
                pt.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            l_inv = jnp.where(psum == 0.0, 0.0, 1.0 / psum)
            if fp8:
                l_inv = l_inv * v_descale
            o_ref[0, 0] = (pv * l_inv).astype(o_ref.dtype)
            if lse_ref is not None:
                stat1 = jnp.where(
                    psum == 0.0, jnp.inf,
                    jnp.log(jnp.maximum(psum, 1e-37)),
                )  # (bq, 1), shift 0
                if stats_packed:
                    # same lane-pack as _finish: splat, transpose, regroup
                    stat = jnp.broadcast_to(stat1, (block_q, MIN_LANES))
                    row = jax.lax.transpose(stat, (1, 0))[:1]
                    lse_ref[0, 0] = row.reshape(block_q // 128, 128)
                else:
                    lse_ref[0, 0] = jnp.broadcast_to(stat1, (block_q, 8))
            return
        if defer:
            # Deferred-shift online softmax: the serialized chain
            # QK-matmul -> full max reduce -> exp was the kernel's critical
            # path (measured: a fixed-shift exp is free, the online max
            # costs ~15% of peak). Here m_scr holds the running max ONE
            # BLOCK STALE (seeded exactly by the ikv==0 block's standard
            # path), so exp(s - m_s) pipelines with the matmuls and the max
            # reduce overlaps the PV matmul. The state (l, acc) lives at
            # shift m_s and is rescaled by cheap (bq, lanes) row ops after
            # the max completes; the shift cancels in _finish, so the math
            # is exact. The min(., 70) clamp only engages when a block's
            # row max exceeds the previous running max by > 70 (e^70 stays
            # far inside fp32 for the PV accumulation); beyond that the
            # top-score weights within that one block flatten smoothly —
            # no NaN/Inf — and the shift catches up on the next block.
            m_s = m_scr[...]
            pt = jnp.exp(jnp.minimum(s - m_s[:, :1], 70.0))
            m_curr = jnp.max(s, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_s, m_curr)
            scale = jnp.exp(m_s - m_next)
            psum = jnp.sum(pt, axis=-1, keepdims=True)
            pt = _apply_dropout(pt)
            pv = jax.lax.dot_general(
                pt.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            l_scr[...] = (l_scr[...] + psum) * scale
            acc_scr[...] = (acc_scr[...] + pv) * scale[:, :1]
            m_scr[...] = m_next
            return

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)  # (bq, 128)
        alpha = jnp.exp(m_prev - m_next)
        if apply_position_mask or has_segments:
            # Clamp the exp shift so fully-masked rows (m_next == NEG_INF)
            # underflow to p = 0 instead of exp(0) = 1 (empty-row contract:
            # out = 0, lse = +inf, ≙ flash_fwd_kernel.h:509-514). The fast
            # path always has visible keys, so m_next is finite there.
            shift = jnp.maximum(m_next[:, :1], 0.5 * NEG_INF)
        else:
            shift = m_next[:, :1]
        p = jnp.exp(s - shift)
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_next

        p_dropped = _apply_dropout(p)

        pv = jax.lax.dot_general(
            p_dropped.astype(v.dtype),
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    needs_branch = (
        has_right or has_left or (seqlen_k % block_k != 0)
        or fm_mode is not None or has_positions or has_segstats
    )

    def dispatch(cond, masked):
        # With deferred softmax, the first sequential block (ikv == 0 —
        # always visited and never fully masked under the `deferred`
        # gating) runs the standard serialized path to seed the shift;
        # later blocks run the pipelined deferred path. The ikv == 0
        # condition is a grid scalar — no VPU-to-scalar sync. With
        # zero_seed the shift starts at 0 instead (see _init) and every
        # block takes the deferred path — half the branch bodies.
        if deferred and zero_seed:
            @pl.when(cond)
            def _defer():
                body(masked, defer=True)
        elif deferred:
            @pl.when(jnp.logical_and(cond, ikv == 0))
            def _seed():
                body(masked)

            @pl.when(jnp.logical_and(cond, ikv != 0))
            def _defer():
                body(masked, defer=True)
        else:
            @pl.when(cond)
            def _run():
                body(masked)

    if needs_branch:
        dispatch(jnp.logical_and(should_run, fully_unmasked), False)
        dispatch(
            jnp.logical_and(should_run, jnp.logical_not(fully_unmasked)), True
        )
    else:
        dispatch(should_run, False)

    if not single_shot:
        @pl.when(row_last)
        def _finish():
            l = l_scr[:, :1]
            l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
            if fp8:
                l_inv = l_inv * v_descale
            o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
            if lse_ref is not None:
                if stats_packed:
                    # Dense lane-packed (bq/128, 128) lse block. A direct
                    # sublane-column -> lane-row reshape is an unsupported
                    # Mosaic shape cast; instead transpose the lane-replicated
                    # (bq, 128) stat (Mosaic lowers aligned 2D transposes) and
                    # regroup its first row into (bq/128, 128) — lane-count-
                    # preserving reshapes ARE supported. Chip-verified
                    # (pack/unpack probe, CHECKS.md). Runs once per q row.
                    stat = jnp.where(
                        l_scr[...] == 0.0, jnp.inf,
                        m_scr[...] + jnp.log(jnp.maximum(l_scr[...], 1e-37)),
                    )
                    row = jax.lax.transpose(stat, (1, 0))[:1]  # (1, bq)
                    lse_ref[0, 0] = row.reshape(block_q // 128, 128)
                else:
                    # lane-replicated x8 (Mosaic block rule: last dim == array
                    # dim) — sub-128-block fallback
                    m8 = m_scr[:, :8]
                    l8 = l_scr[:, :8]
                    lse_ref[0, 0] = jnp.where(
                        l8 == 0.0, jnp.inf, m8 + jnp.log(jnp.maximum(l8, 1e-37))
                    )


def flash_attention_fwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    *,
    sm_scale: float,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
    block_sizes: Optional[BlockSizes] = None,
    need_lse: bool = True,
    interpret: Optional[bool] = None,
    flashmask_vecs: Optional[jax.Array] = None,
    flashmask_mode: Optional[str] = None,
    block_mask: Optional[jax.Array] = None,
    q_positions: Optional[jax.Array] = None,
    kv_positions: Optional[jax.Array] = None,
    q_descale: Optional[jax.Array] = None,
    k_descale: Optional[jax.Array] = None,
    v_descale: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Forward flash attention on (batch, heads, seq, head_dim) inputs.

    Returns (out, lse) with lse = logsumexp of scaled scores, shape (b, h, sq),
    fp32 (≙ reference softmax_lse, flash_api.cpp mha_fwd); lse is None when
    need_lse=False (inference), skipping its HBM writes entirely.

    flashmask_vecs: optional (b, hm, NV, sk) int32 column-wise sparse-mask
    row-index vectors (FlashMask, ≙ csrc/capi/flash_attn.h:38-43) with
    flashmask_mode one of common.FM_NV's keys; hm must divide h.

    FP8 prefill (≙ FA3 e4m3 forward, csrc/flash_attn_v3/flash_api.h:69-78):
    when q/k/v are float8_e4m3fn, q_descale/k_descale/v_descale are
    optional (b, hk) fp32 per-head dequantization scales (default 1.0);
    they ride scalar prefetch and fold into the q-tile scale multiply /
    output epilogue, so dequant costs one VPU convert per element right at
    the MXU input while the HBM reads stay fp8-sized. Forward-only, no
    bias/dropout (the reference's fp8 path has neither); out is bf16.
    """
    if causal:
        window_size = (window_size[0], 0)
    # With positions, the causal/window bounds apply to the POSITION values
    # (ring shard offsets / varlen per-sequence indices) and the global
    # row/col window machinery is disabled — its static offset arithmetic
    # is meaningless across packed sequences or rotated shards.
    pos_window = (-1, -1)
    if q_positions is not None:
        pos_window = window_size
        window_size = (-1, -1)
    b, h, sq, d = q.shape
    _, hk, sk, _ = k.shape
    assert h % hk == 0, (h, hk)
    if block_sizes is None:
        block_sizes = BlockSizes.for_shape(sq, sk, d, q.dtype)
    from .common import round_up
    bq = min(block_sizes.block_q, round_up(sq, 128))
    bk = min(block_sizes.block_k, round_up(sk, 128))
    g = h // hk

    qp = pad_to_block(q, 2, bq)
    kp = pad_to_block(k, 2, bk)
    vp = pad_to_block(v, 2, bk)
    sqp, skp = qp.shape[2], kp.shape[2]
    nq, nkv = sqp // bq, skp // bk
    offset = sk - sq
    has_right = window_size[1] >= 0
    has_left = window_size[0] >= 0

    def kv_index(iq, ikv):
        if has_right:
            hi = jnp.maximum((iq * bq + bq - 1 + offset + window_size[1]) // bk, 0)
            ikv = jnp.minimum(ikv, hi)
        if has_left:
            lo = jnp.minimum((iq * bq + offset - window_size[0]) // bk, nkv - 1)
            ikv = jnp.maximum(ikv, jnp.maximum(lo, 0))
        return jnp.clip(ikv, 0, nkv - 1)

    is_fp8 = jnp.dtype(q.dtype) == jnp.float8_e4m3fn.dtype
    if is_fp8:
        assert bias is None, "fp8 forward does not support bias (≙ FA3)"
        assert dropout_p == 0.0, "fp8 forward does not support dropout (≙ FA3)"
        assert jnp.dtype(k.dtype) == jnp.float8_e4m3fn.dtype
        assert jnp.dtype(v.dtype) == jnp.float8_e4m3fn.dtype

    in_specs = []
    inputs = []
    num_scalar_prefetch = 0
    if is_fp8:
        ones = lambda: jnp.ones((b, hk), jnp.float32)
        dsc = jnp.concatenate([
            (jnp.asarray(x, jnp.float32).reshape(b, hk)
             if x is not None else ones()).reshape(-1)
            for x in (q_descale, k_descale, v_descale)
        ])
        inputs.append(dsc)
        num_scalar_prefetch += 1
    if dropout_p > 0.0:
        if dropout_seed is None:
            raise ValueError("dropout requires a seed")
        inputs.append(jnp.asarray(dropout_seed, jnp.int32).reshape((1,)))
        num_scalar_prefetch = 1
    has_flashmask = flashmask_vecs is not None
    if has_flashmask:
        fm_heads = flashmask_vecs.shape[1]
        assert h % fm_heads == 0, (h, fm_heads)
        fmp = fm_pad_vecs(flashmask_vecs, flashmask_mode, bk)
        inputs.append(fm_block_stats(fmp, bk))
        num_scalar_prefetch += 1
    has_blockmask = block_mask is not None
    if has_blockmask:
        # block_mask: ((b|1, hm, Mq, Mk) 0/1 mask, gq, gk) at user granularity
        bmask, gq, gk = block_mask
        bm_heads = bmask.shape[1]
        assert h % bm_heads == 0, (h, bm_heads)
        inputs.append(expand_block_mask(bmask, gq, gk, bq, bk, nq, nkv, b))
        num_scalar_prefetch += 1
    has_positions = q_positions is not None
    if has_positions:
        from .common import pos_pad_and_stats

        qposp, qpstats = pos_pad_and_stats(q_positions, bq)
        kposp, kpstats = pos_pad_and_stats(kv_positions, bk)
        inputs.extend([qpstats, kpstats])
        num_scalar_prefetch += 2
    has_segments = q_segment_ids is not None
    if has_segments:
        from .common import seg_block_stats

        qsst = seg_block_stats(q_segment_ids, bq)
        ksst = seg_block_stats(kv_segment_ids, bk)
        inputs.extend([qsst, ksst])
        num_scalar_prefetch += 2

    # Data-dependent DMA skipping: with FlashMask / blocksparse / segment /
    # position masks the pl.when guards skip compute for fully-masked tiles,
    # but the KV tiles would still stream from HBM. A visibility map turns
    # into an "effective fetch index" table (common.effective_kv_table):
    # skipped steps repeat the resident block index so Pallas issues no
    # traffic — runtime then tracks the visible area (SURVEY hard part #2).
    # For packed varlen (segments from cu_seqlens) this bounds each q
    # block's KV loop to its own sequences' blocks: total work is
    # ~sum(len_i^2), not total^2 (≙ reference BlockInfo, block_info.h).
    has_eff = (
        has_flashmask or has_blockmask or has_segments or has_positions
    )
    if has_flashmask and has_blockmask and fm_heads != bm_heads:
        has_eff = False
    if has_eff:
        from .common import effective_kv_table, fm_skip_bypass as _fsb

        if has_flashmask:
            ho = fm_heads
        elif has_blockmask:
            ho = bm_heads
        else:
            ho = 1
        qs_arr = jnp.arange(nq, dtype=jnp.int32) * bq
        ql_arr = jnp.minimum(qs_arr + bq, sq) - 1
        cs_arr = jnp.arange(nkv, dtype=jnp.int32) * bk
        cl_arr = jnp.minimum(cs_arr + bk - 1, sk - 1)
        vis = jnp.logical_and(qs_arr[:, None] < sq, cs_arr[None, :] < sk)
        if has_right:
            vis = jnp.logical_and(
                vis, cs_arr[None, :] <= ql_arr[:, None] + offset + window_size[1]
            )
        if has_left:
            vis = jnp.logical_and(
                vis, cl_arr[None, :] >= qs_arr[:, None] + offset - window_size[0]
            )
        vis = jnp.broadcast_to(vis[None, None], (b, ho, nq, nkv))
        if has_flashmask:
            r_ = fmp.reshape(b, fm_heads, fmp.shape[2], nkv, bk)
            mx, mn = r_.max(-1), r_.min(-1)  # (b, hm, nv, nkv)
            st = lambda v_, w_: (mx if w_ == 0 else mn)[:, :, v_][:, :, None, :]
            fm_skip, _ = _fsb(
                flashmask_mode, st,
                qs_arr[None, None, :, None], (ql_arr + 1)[None, None, :, None],
            )
            vis = jnp.logical_and(vis, jnp.logical_not(fm_skip))
        if has_blockmask:
            bm_full = expand_block_mask(
                bmask, gq, gk, bq, bk, nq, nkv, b
            ).reshape(b, bm_heads, nq, nkv)
            vis = jnp.logical_and(vis, bm_full != 0)
        if has_segments:
            qst2 = qsst.reshape(b, nq, 2)
            kst2 = ksst.reshape(b, nkv, 2)
            seg_vis = jnp.logical_and(
                qst2[:, :, None, 0] <= kst2[:, None, :, 1],
                kst2[:, None, :, 0] <= qst2[:, :, None, 1],
            )  # (b, nq, nkv)
            vis = jnp.logical_and(vis, seg_vis[:, None])
        if has_positions:
            qpst2 = qpstats.reshape(b, nq, 2)
            kpst2 = kpstats.reshape(b, nkv, 2)
            if pos_window[1] >= 0:
                vis = jnp.logical_and(
                    vis,
                    (kpst2[:, None, :, 0]
                     <= qpst2[:, :, None, 1] + pos_window[1])[:, None],
                )
            if pos_window[0] >= 0:
                vis = jnp.logical_and(
                    vis,
                    (kpst2[:, None, :, 1]
                     >= qpst2[:, :, None, 0] - pos_window[0])[:, None],
                )
        inputs.append(effective_kv_table(vis))
        num_scalar_prefetch += 1
        hog = h // ho

        def kv_index_eff(b_, h_, iq, ikv, *refs):
            eff = refs[-1]
            hh = h_ // hog if ho > 1 else 0
            return eff[((b_ * ho + hh) * nq + iq) * nkv + ikv]
    # Pure aligned causal: every masked block is a diagonal block sharing
    # one (bq, bk) pattern — ship it once as a resident additive tile
    # (constant index map => a single DMA for the whole kernel) so the
    # masked branch costs one add instead of iota/compare/where passes.
    diag_mask_tile = (
        has_right and offset + window_size[1] == 0 and not has_left
        and bq == bk and sq == sk and sqp == sq and skp == sk
        and not has_flashmask and not has_positions
    )
    # Flat windowed iteration (see _fwd_kernel): collapse (iq, ikv) into
    # one sequential axis that enumerates only each q row's visible KV
    # blocks. The rectangular grid steps through nq*nkv pairs and
    # `should_run`-skips the masked ones — 37.5% dead steps for causal at
    # s=4096/1024² tiles, and up to ~(1 - w/s) for a sliding window w at
    # long s (Mistral-style prefill); here those steps never exist. Rows
    # whose window is empty get one dummy visit so the empty-row contract
    # (out = 0, lse = +inf) is still written. Works for any static
    # causal/window bounds; excluded only for the features that re-route
    # the KV index map or index workspaces by the raw rectangular step.
    flat_causal = (
        FLAT_CAUSAL and (has_right or has_left) and bias is None
        and not has_segments and not has_blockmask and not has_eff
        and not has_flashmask and not has_positions
    )
    if flat_causal:
        pairs = []
        last_kv_blk = (sk - 1) // bk
        for i in range(nq):
            if i * bq >= sq:
                break  # padded q rows: sliced away, never visited
            q_last_i = min(i * bq + bq, sq) - 1
            hi = last_kv_blk
            if has_right:
                hi = min(hi, (q_last_i + offset + window_size[1]) // bk)
            lo = 0
            if has_left:
                lo = max(0, (i * bq + offset - window_size[0]) // bk)
            if hi < lo:
                pairs.append((i, 0))  # dummy: zeros out, lse = +inf
            else:
                pairs.extend((i, j) for j in range(lo, hi + 1))
        # sentinel -1 after the last entry: the kernel's last-of-row check
        # reads iq_tab[t + 1]
        iq_tab = jnp.asarray([p[0] for p in pairs] + [-1], jnp.int32)
        ikv_tab = jnp.asarray([p[1] for p in pairs], jnp.int32)
        inputs.extend([iq_tab, ikv_tab])
        num_scalar_prefetch += 2
    inputs.extend([qp, kp, vp])
    if flat_causal:
        # scalar-prefetch refs arrive in order after the grid ids; the
        # flat tables are always the last two (eff is excluded above)
        q_map = lambda b_, h_, t, *r: (b_, h_, r[-2][t], 0)
        kv_blk = lambda b_, h_, t, *r: (b_, h_ // g, r[-1][t], 0)
    else:
        if has_eff:
            kv_i = kv_index_eff
        else:
            kv_i = lambda b_, h_, iq, ikv, *r: kv_index(iq, ikv)
        q_map = lambda b_, h_, iq, ikv, *_: (b_, h_, iq, 0)
        kv_blk = lambda b_, h_, iq, ikv, *r: (
            b_, h_ // g, kv_i(b_, h_, iq, ikv, *r), 0
        )
    qblk_shape = (1, 1, bq, d)
    kvblk_shape = (1, 1, bk, d)
    in_specs.extend([
        pl.BlockSpec(qblk_shape, q_map),
        pl.BlockSpec(kvblk_shape, kv_blk),
        pl.BlockSpec(kvblk_shape, kv_blk),
    ])
    if diag_mask_tile:
        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            <= jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        )
        inputs.append(jnp.where(tri, 0.0, NEG_INF).astype(jnp.bfloat16))
        in_specs.append(pl.BlockSpec((bq, bk), lambda *_: (0, 0)))
    has_bias = bias is not None
    if has_bias:
        bias = jnp.asarray(bias)
        if bias.ndim == 2:
            bias = bias[None, None]
        elif bias.ndim == 3:
            bias = bias[:, None]
        bias = pad_to_block(pad_to_block(bias, 3, bk), 2, bq)
        bb, bh = bias.shape[0], bias.shape[1]
        in_specs.append(
            pl.BlockSpec(
                (1, 1, bq, bk),
                lambda b_, h_, iq, ikv, *r, bb=bb, bh=bh: (
                    b_ if bb > 1 else 0,
                    h_ if bh > 1 else 0,
                    iq,
                    kv_i(b_, h_, iq, ikv, *r),
                ),
            )
        )
        inputs.append(bias)
    if has_segments:
        # 3D layouts keep Mosaic's block rules happy: q segs on sublanes
        # (bq, 1), kv segs on lanes (1, bk).
        qseg = pad_to_block(q_segment_ids.astype(jnp.int32), 1, bq)[:, :, None]
        kseg = pad_to_block(kv_segment_ids.astype(jnp.int32), 1, bk)[:, None, :]
        in_specs.append(
            pl.BlockSpec((1, bq, 1), lambda b_, h_, iq, ikv, *_: (b_, iq, 0))
        )
        in_specs.append(
            pl.BlockSpec(
                (1, 1, bk),
                lambda b_, h_, iq, ikv, *r: (b_, 0, kv_i(b_, h_, iq, ikv, *r)),
            )
        )
        inputs.extend([qseg, kseg])
    if has_flashmask:
        # per-column index vectors, lane-oriented (1, 1, NV, bk) blocks
        nv = fmp.shape[2]
        fm_g = h // fm_heads
        in_specs.append(
            pl.BlockSpec(
                (1, 1, nv, bk),
                lambda b_, h_, iq, ikv, *r: (
                    b_, h_ // fm_g, 0, kv_i(b_, h_, iq, ikv, *r)
                ),
            )
        )
        inputs.append(fmp)
    if has_positions:
        # same layouts as segment ids: q on sublanes, kv on lanes
        in_specs.append(
            pl.BlockSpec((1, bq, 1), lambda b_, h_, iq, ikv, *_: (b_, iq, 0))
        )
        in_specs.append(
            pl.BlockSpec(
                (1, 1, bk),
                lambda b_, h_, iq, ikv, *r: (b_, 0, kv_i(b_, h_, iq, ikv, *r)),
            )
        )
        inputs.extend([qposp[:, :, None], kposp[:, None, :]])

    out_dtype = jnp.bfloat16 if is_fp8 else q.dtype
    out_shape = [jax.ShapeDtypeStruct((b, h, sqp, d), out_dtype)]
    if flat_causal:
        o_map = q_map
        lse_map = lambda b_, h_, t, *r: (b_, h_, r[-2][t], 0)
    else:
        o_map = q_map
        lse_map = lambda b_, h_, iq, ikv, *_: (b_, h_, iq, 0)
    out_specs = [pl.BlockSpec(qblk_shape, o_map)]
    stats_packed = stats_packed_ok(bq, sqp)
    if need_lse:
        if stats_packed:
            # Dense lane-packed lse: (b, h, sqp) stored as
            # (b, h, sqp/128, 128). The legacy x8-replicated layout padded
            # 8 -> 128 lanes physically (16x HBM bytes on the lse write
            # AND on every downstream read/broadcast).
            out_shape.append(
                jax.ShapeDtypeStruct((b, h, sqp // 128, 128), jnp.float32))
            out_specs.append(pl.BlockSpec((1, 1, bq // 128, 128), lse_map))
        else:
            # lane-replicated x8 (see kernel _finish) — sub-128-block
            # fallback for tiny test shapes
            out_shape.append(
                jax.ShapeDtypeStruct((b, h, sqp, 8), jnp.float32))
            out_specs.append(pl.BlockSpec((1, 1, bq, 8), lse_map))

    kernel = functools.partial(
        _fwd_kernel_entry,
        sm_scale=sm_scale,
        has_right=has_right,
        has_left=has_left,
        window=window_size,
        offset=offset,
        softcap=softcap,
        has_bias=has_bias,
        has_segments=has_segments,
        dropout_p=dropout_p,
        seqlen_q=sq,
        seqlen_k=sk,
        block_q=bq,
        block_k=bk,
        num_kv_blocks=nkv,
        need_lse=need_lse,
        stats_packed=stats_packed,
        fp8=is_fp8,
        kv_heads=hk,
        dsc_n=b * hk,
        fm_mode=flashmask_mode if has_flashmask else None,
        fm_heads=fm_heads if has_flashmask else 1,
        has_blockmask=has_blockmask,
        bm_heads=bm_heads if has_blockmask else 1,
        num_q_blocks=nq,
        has_positions=has_positions,
        has_eff=has_eff,
        pos_window=pos_window,
        has_segstats=has_segments,
        diag_mask_tile=diag_mask_tile,
        flat_iter=flat_causal,
        # Deferred-shift softmax needs every q row to have at least one
        # visible key in the ikv==0 seed block: true for plain/causal/
        # bias/dropout/right-window (offset >= 0) attention, but not once
        # segments, a left window, FlashMask/blocksparse skips, or ring
        # positions can fully mask a row's first block (those keep the
        # exact serialized path; measured +10% non-causal, +1.5% causal
        # for the deferred path on v5e).
        deferred=(
            not has_flashmask and not has_blockmask and not has_positions
            and not has_segments and not has_left
            and (not has_right or offset >= 0)
        ),
        # bias empirically doubles the dbias recompute error under the
        # zero-seeded shift (0.021 -> 0.041 max vs fp64 at the contract
        # test's shapes) while lse stays bit-comparable — keep the exact
        # seeded path when a bias is trained through the kernel.
        # fp8 likewise: per-head descale makes wide score magnitudes the
        # NORM (that is what the scales are for), so the zero-shift +70
        # clamp cannot be assumed — fp8 always seeds the shift with the
        # first block's true max.
        zero_seed=ZERO_SEED and not has_bias and not is_fp8,
        # nkv == 1 (s <= 1024 at default tiles): every row's ONLY block
        # computes the complete softmax — the online state machinery is
        # pure overhead there (~0.4 us of a 3.9 us step at the gpt2
        # training shape). Same gates as the zero-seeded deferred path.
        single_shot=(
            nkv == 1 and SINGLE_SHOT and ZERO_SEED and not has_bias
            and not is_fp8
            and not has_flashmask and not has_blockmask
            and not has_positions and not has_segments and not has_left
            and (not has_right or offset >= 0)
        ),
    )

    grid = (b, h, len(pairs)) if flat_causal else (b, h, nq, nkv)
    flops_factor = 1.0
    if has_right and offset + window_size[1] == 0:
        flops_factor = 0.5
    cost = pl.CostEstimate(
        flops=int(4 * b * h * sq * sk * d * flops_factor),
        bytes_accessed=int(
            q.size * q.dtype.itemsize
            + k.size * k.dtype.itemsize * 2
            + q.size * q.dtype.itemsize
        ),
        transcendentals=int(b * h * sq * sk * flops_factor),
    )
    results = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=num_scalar_prefetch,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((bq, MIN_LANES), jnp.float32),
                pltpu.VMEM((bq, MIN_LANES), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("parallel", "parallel", "arbitrary") if flat_causal
                else ("parallel", "parallel", "parallel", "arbitrary")
            ),
            # the seed+deferred branch pair needs ~16.2MB of scoped VMEM at
            # 1024^2 blocks; v5e has headroom above the 16MB default
            vmem_limit_bytes=64 * 2**20,
        ),
        cost_estimate=cost,
        interpret=interpret_mode() if interpret is None else interpret,
    )(*inputs)
    osl = lambda o: o[:, :, :sq]
    if need_lse:
        out, lse = results
        if stats_packed:
            return osl(out), lse.reshape(b, h, sqp)[:, :, :sq]
        return osl(out), lse[:, :, :sq, 0]
    return osl(results[0]), None


def _fwd_kernel_entry(*refs, **params):
    _fwd_kernel(refs, **params)
