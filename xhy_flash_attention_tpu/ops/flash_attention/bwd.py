"""FlashAttention-2 backward — Pallas TPU kernels.

TPU-native re-design of the reference recompute-based backward
(csrc/flash_attn/src/flash_bwd_kernel.h):

* the reference runs one seqk-parallel kernel computing dK/dV in registers
  while atomically-free accumulating dQ in a fp32 HBM workspace, followed by
  a convert kernel (`compute_dq_dk_dv_1colblock` :427, `convert_dQ` :233).
  TPUs have no atomics and a sequential grid per core, so we instead split
  into two clean kernels with independent tilings (the design space the
  reference exposes as its two parallelization modes,
  flash_bwd_launch_template.h:50,91):
    - single-pass path (default, ALL feature combinations): ONE kernel,
      grid (batch, kv-head, kv-block, q-block), computes dK/dV in VMEM
      scratch with the GQA group accumulated in place AND dQ — 5 matmuls
      per tile instead of the split pair's 7. dQ accumulates across the
      sequential kv axis in a persistent VMEM scratch covering all
      (group, q-block) slices (emitted in the final kv sweep), falling
      back to an fp32 HBM partials workspace reduced by XLA when the
      scratch exceeds MERGED_DQ_SCRATCH_CAP;
    - split fallback (single KV block, or scratch AND workspace both
      unaffordable): the same dKV kernel without dq outputs plus a dQ
      kernel, grid (batch, q-head, q-block, kv-block), dQ in VMEM scratch.
* `dot_do_o` preprocess (flash_bwd_kernel.h:78) is a one-line XLA reduction —
  delta = sum(o * do, -1) — which XLA fuses; no dedicated kernel needed.
* both kernels recompute p = exp(s - lse) from the saved LSE, exactly like
  the reference (5 matmuls per tile: QK^T, dO V^T, dS^T Q, dS K, P^T dO).
* GQA: the dKV grid runs over *KV* heads and the kernel loops the query-head
  group, accumulating dK/dV in VMEM scratch (same shape as the reference's
  in-CTA group loop; 1/g the dK/dV HBM write traffic of a per-query-head
  grid). The dQ grid stays per query head.
* determinism is structural: no atomics anywhere, so the reference's
  race-condition test (tests/test_flash_attn.py:798) becomes bitwise equality
  for dQ as well as dK/dV.
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
    dropout_keep_mask,
    expand_block_mask,
    fm_banned,
    fm_block_stats,
    fm_pad_vecs,
    fm_skip_bypass,
    interpret_mode,
    pad_to_block,
    round_up,
    stats_packed_ok,
)

MIN_LANES = 128


def _stat_col(ref, params):
    """Unpack an lse/delta block to a (bq, 1) fp32 column.

    Packed mode (bq % 128 == 0): the block is (bq/128, 128) lane-dense.
    A direct lane-row -> sublane-column reshape is an unsupported Mosaic
    shape cast; regroup into one (1, bq) lane row (supported), splat to 8
    sublanes, and transpose (Mosaic lowers aligned 2D transposes) —
    chip-verified (pack/unpack probe, CHECKS.md). Legacy mode: (bq, 8)
    lane-replicated; take lane 0."""
    blk = ref[0, 0]
    if params.get("stats_packed", False):
        bq = params["block_q"]
        row = blk.reshape(1, bq)
        rep = jnp.broadcast_to(row, (8, bq))
        return jax.lax.transpose(rep, (1, 0))[:, :1]
    return blk[:, :1]

# Largest persistent VMEM dq accumulator the merged backward will allocate
# (g * sq_padded * d * 4 bytes); larger shapes use the fp32 HBM partials
# workspace instead (and beyond its own 2 GiB cap, the split two-kernel
# path). 40 MiB leaves room for the streaming tiles under the ~100 MiB
# usable VMEM on v5e.
MERGED_DQ_SCRATCH_CAP = 40 * 2**20

# Cap on the fp32 (b, h, nkv, sq, d) dq partials workspace used when the
# VMEM scratch doesn't fit; beyond this the split two-kernel path runs.
MERGED_DQ_WORKSPACE_CAP = 2 * 1024**3

# Flat causal iteration for the merged backward (dead-step-free
# lower-triangle grid, mirror of fwd.py). XFA_FLAT_CAUSAL=0 restores the
# rectangular grid (A/B lever).
FLAT_CAUSAL = os.environ.get("XFA_FLAT_CAUSAL", "1") == "1"

# Single-shot direct-write mode at single-(q,kv,group)-step shapes (see
# _bwd_dkv_kernel). XFA_SINGLE_SHOT=0 restores the scratch path (A/B
# lever, shared with fwd.py).
SINGLE_SHOT = os.environ.get("XFA_SINGLE_SHOT", "1") == "1"


def _recompute_p_ds(
    q, k, v, do, lse, delta, bias, qseg, kseg,
    *,
    sm_scale, softcap, dropout_p, rng_block,
    q_start, c_start, seqlen_k, has_right, has_left, window, offset,
    apply_position_mask, fm_mode=None, fmv=None, qpos=None, kpos=None,
    pos_window=(-1, -1),
):
    """Shared recompute: returns (p_dropped, ds, ds_raw, q_scaled).

    p is the *undropped* softmax probability (used for dV via P^T dO after
    dropout is applied); ds = softcap' * p * (dp - delta) — the gradient
    wrt the *pre-scaled* scores s = (sm_scale·q)@kᵀ, so dK = dsᵀ @ q_scaled
    directly and dQ = (ds @ k) · sm_scale once per output tile (the scale
    folds into the (bq, d) q tile / dq result instead of two (bq, bk)
    passes — same reorder the fwd kernel uses).
    """
    block_q, block_k = q.shape[0], k.shape[0]
    q = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if softcap > 0.0:
        t = jnp.tanh(s / softcap)
        s = t * softcap
    if bias is not None:
        s += bias.astype(jnp.float32)
    if apply_position_mask:
        rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = c_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = cols < seqlen_k
        if has_right:
            mask = jnp.logical_and(mask, cols <= rows + offset + window[1])
        if has_left:
            mask = jnp.logical_and(mask, cols >= rows + offset - window[0])
        if fm_mode is not None:
            mask = jnp.logical_and(
                mask, jnp.logical_not(fm_banned(fm_mode, fmv, rows))
            )
        if qpos is not None:
            if pos_window[1] >= 0:
                mask = jnp.logical_and(mask, kpos <= qpos + pos_window[1])
            if pos_window[0] >= 0:
                mask = jnp.logical_and(mask, kpos >= qpos - pos_window[0])
        s = jnp.where(mask, s, NEG_INF)
    if qseg is not None and apply_position_mask:
        # single-matching-segment block pairs take the fast branch (the
        # segment-stats bypass guarantees no cross-segment pair there)
        s = jnp.where(qseg == kseg, s, NEG_INF)  # (bq,1) vs (1,bk)

    p = jnp.exp(s - lse)  # lse (bq,1); +inf on empty rows -> p=0

    if dropout_p > 0.0:
        seed, salt = rng_block
        rows_g = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        cols_g = c_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        keep = dropout_keep_mask(seed, salt, rows_g, cols_g, dropout_p)
        scale_d = 1.0 / (1.0 - dropout_p)
        p_dropped = jnp.where(keep, p, 0.0) * scale_d
    else:
        p_dropped = p

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if dropout_p > 0.0:
        dp = jnp.where(keep, dp, 0.0) * scale_d
    ds_raw = p * (dp - delta)  # (bq,1) delta; == dbias (bias enters post-softcap)
    ds = ds_raw
    if softcap > 0.0:
        ds = ds * (1.0 - t * t)
    return p_dropped, ds, ds_raw, q


def _bwd_dkv_kernel(refs, *, params):
    it = iter(refs)
    if params["dropout_p"] > 0.0:
        seed_ref = next(it)
    fm_mode = params.get("fm_mode")
    if fm_mode is not None:
        fmstats_ref = next(it)
    has_blockmask = params.get("has_blockmask", False)
    if has_blockmask:
        bm_ref = next(it)
    has_positions = params.get("has_positions", False)
    if has_positions:
        qpstats_ref = next(it)
        kpstats_ref = next(it)
    has_segments = params["has_segments"]
    if has_segments:
        qsst_ref = next(it)
        ksst_ref = next(it)
    if params.get("has_eff", False):
        next(it)  # effective-fetch DMA table: used by index maps only
    flat_iter = params.get("flat_iter", False)
    if flat_iter:
        ikvt_ref = next(it)
        jt_ref = next(it)
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = (
        next(it), next(it), next(it), next(it), next(it), next(it),
    )
    bias_ref = next(it) if params["has_bias"] else None
    qseg_ref = next(it) if has_segments else None
    kseg_ref = next(it) if has_segments else None
    fm_ref = next(it) if fm_mode is not None else None
    qpos_ref = next(it) if has_positions else None
    kpos_ref = next(it) if has_positions else None
    dk_ref = next(it)
    dv_ref = next(it)
    dbias_ref = next(it) if params["has_bias"] else None
    # single-pass mode: this kernel also produces dQ (5 matmuls per tile
    # instead of the split path's 7 — one recompute serves all grads)
    with_dq = params.get("with_dq", False)
    dq_in_scratch = params.get("dq_in_scratch", False)
    dq_ref = next(it) if with_dq else None
    dk_scr = next(it)
    dv_scr = next(it)
    dq_scr = next(it) if (with_dq and dq_in_scratch) else None

    b_idx, h_idx = pl.program_id(0), pl.program_id(1)
    if flat_iter:
        # Flat windowed iteration: one sequential axis over the visited
        # (kv-block, q-block x group) pairs only — the rectangular grid's
        # masked steps (upper triangle; outside a sliding window) never
        # run (mirror of the fwd kernel's flat_causal; see fwd.py).
        # Sweep boundaries come from neighbor comparisons on ikv_tab
        # (trailing -1 sentinel).
        t = pl.program_id(2)
        ikv = ikvt_ref[t]
        j_inner = jt_ref[t]
        sweep_first = jnp.logical_or(
            t == 0, ikvt_ref[jnp.maximum(t - 1, 0)] != ikv
        )
        sweep_last = ikvt_ref[t + 1] != ikv
    else:
        ikv, j_inner = pl.program_id(2), pl.program_id(3)
    bq, bk = params["block_q"], params["block_k"]
    sq, sk = params["seqlen_q"], params["seqlen_k"]
    offset = params["offset"]
    window = params["window"]
    has_right, has_left = params["has_right"], params["has_left"]
    nq = params["num_q_blocks"]
    g = params.get("group", 1)
    # GQA: the grid head axis is the KV head; the inner sequential axis
    # iterates (group member, q block) so dK/dV accumulate over the whole
    # group in VMEM — one (b, hk, sk, d) write instead of g fp32
    # per-q-head workspaces + an external reduction (≙ the reference's
    # in-CTA group loop, flash_bwd_kernel.h:427).
    if g > 1:
        # group member is the FASTEST-moving index: consecutive steps share
        # the same q-block only through different heads, so a
        # head-broadcast dbias block stays resident while the group
        # accumulates into it
        gi = j_inner % g
        iq = j_inner // g
        qh_idx = h_idx * g + gi
    else:
        gi = 0
        iq = j_inner
        qh_idx = h_idx
    num_heads = params.get("num_heads", pl.num_programs(1))
    dbias_group_acc = params.get("dbias_group_acc", False)

    # Single-shot mode (one (q, kv, group) step per (b, h): s <= 1024 at
    # default tiles, MHA): the body writes dK/dV/dQ straight to the output
    # refs — no scratch zero/accumulate/emit steps (mirror of the fwd
    # kernel's single_shot; measured +26% fwd at the gpt2 shape).
    single_shot = params.get("single_shot", False)

    if not single_shot:
        # first visited j of kv sweep ikv: 0 on the rectangular grid; the
        # sweep's first table entry (the diagonal q-block) on the flat grid
        @pl.when(sweep_first if flat_iter else j_inner == 0)
        def _init():
            dk_scr[...] = jnp.zeros_like(dk_scr)
            dv_scr[...] = jnp.zeros_like(dv_scr)

    if dq_scr is not None and not single_shot:
        # each (group member, q-block) cell owns its dq slice; zero it at
        # its row's FIRST visited sweep — ikv == 0 on the rectangular grid
        # (which visits every pair), the window's left-edge block on the
        # flat grid (rows outside sweep 0's window are first visited
        # later)
        if flat_iter:
            w0 = params["window"][0] if params["has_left"] else -1
            off = params["offset"]
            iq_v = j_inner // g if g > 1 else j_inner
            if params["has_left"]:
                first_kv = jnp.maximum(
                    (iq_v * bq + off - w0) // bk, 0)
            else:
                first_kv = 0
            dq_zero_now = ikv == first_kv
        else:
            dq_zero_now = ikv == 0

        @pl.when(dq_zero_now)
        def _init_dq():
            dq_scr[j_inner] = jnp.zeros((bq, dq_scr.shape[-1]), jnp.float32)

    q_start = iq * bq
    c_start = ikv * bk
    q_last_real = jnp.minimum(q_start + bq, sq) - 1
    c_last = c_start + bk - 1
    c_last_real = jnp.minimum(c_last, sk - 1)

    should_run = jnp.logical_and(q_start < sq, c_start < sk)
    if has_right:
        should_run = jnp.logical_and(
            should_run, c_start <= q_last_real + offset + window[1]
        )
    if has_left:
        should_run = jnp.logical_and(
            should_run, c_last_real >= q_start + offset - window[0]
        )

    fully_unmasked = jnp.logical_and(c_last < sk, q_start + bq <= sq)
    if has_right:
        fully_unmasked = jnp.logical_and(
            fully_unmasked, c_last <= q_start + offset + window[1]
        )
    if has_left:
        fully_unmasked = jnp.logical_and(
            fully_unmasked, c_start >= q_start + bq - 1 + offset - window[0]
        )

    if fm_mode is not None:
        fm_heads = params["fm_heads"]
        hm_idx = qh_idx // (num_heads // fm_heads) if fm_heads > 1 else 0
        fm_nv = FM_NV[fm_mode]
        nkv_fm = params["num_kv_blocks"]
        base = ((b_idx * fm_heads + hm_idx) * nkv_fm + ikv) * (fm_nv * 2)
        fm_skip, fm_bypass = fm_skip_bypass(
            fm_mode, lambda v_, w_: fmstats_ref[base + v_ * 2 + w_],
            q_start, q_last_real + 1,
        )
        should_run = jnp.logical_and(should_run, jnp.logical_not(fm_skip))
        fully_unmasked = jnp.logical_and(fully_unmasked, fm_bypass)

    if has_blockmask:
        bm_heads = params["bm_heads"]
        bm_idx = qh_idx // (num_heads // bm_heads) if bm_heads > 1 else 0
        bbase = ((b_idx * bm_heads + bm_idx) * params["num_q_blocks"] + iq) \
            * params["num_kv_blocks"]
        should_run = jnp.logical_and(should_run, bm_ref[bbase + ikv] != 0)

    if has_positions:
        pw = params.get("pos_window", (-1, -1))
        q_lo = qpstats_ref[(b_idx * params["num_q_blocks"] + iq) * 2]
        q_hi = qpstats_ref[(b_idx * params["num_q_blocks"] + iq) * 2 + 1]
        k_lo = kpstats_ref[(b_idx * params["num_kv_blocks"] + ikv) * 2]
        k_hi = kpstats_ref[(b_idx * params["num_kv_blocks"] + ikv) * 2 + 1]
        if pw[1] >= 0:
            should_run = jnp.logical_and(should_run, k_lo <= q_hi + pw[1])
            fully_unmasked = jnp.logical_and(
                fully_unmasked, k_hi <= q_lo + pw[1]
            )
        if pw[0] >= 0:
            should_run = jnp.logical_and(should_run, k_hi >= q_lo - pw[0])
            fully_unmasked = jnp.logical_and(
                fully_unmasked, k_lo >= q_hi - pw[0]
            )

    if has_segments:
        q_mn = qsst_ref[(b_idx * params["num_q_blocks"] + iq) * 2]
        q_mx = qsst_ref[(b_idx * params["num_q_blocks"] + iq) * 2 + 1]
        k_mn = ksst_ref[(b_idx * params["num_kv_blocks"] + ikv) * 2]
        k_mx = ksst_ref[(b_idx * params["num_kv_blocks"] + ikv) * 2 + 1]
        should_run = jnp.logical_and(
            should_run, jnp.logical_and(q_mn <= k_mx, k_mn <= q_mx)
        )
        fully_unmasked = jnp.logical_and(
            fully_unmasked,
            jnp.logical_and(
                jnp.logical_and(q_mn == q_mx, k_mn == k_mx), q_mn == k_mn
            ),
        )

    def body(apply_position_mask):
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        lse = _stat_col(lse_ref, params)
        delta = _stat_col(delta_ref, params)
        rng_block = None
        if params["dropout_p"] > 0.0:
            rng_block = (
                seed_ref[0],
                (b_idx + seed_ref[1]) * num_heads + qh_idx,
            )
        p_dropped, ds, ds_raw, q_scaled = _recompute_p_ds(
            q, k_ref[0, 0], v_ref[0, 0], do, lse, delta,
            bias_ref[0, 0] if bias_ref is not None else None,
            qseg_ref[0] if qseg_ref is not None else None,
            kseg_ref[0] if kseg_ref is not None else None,
            sm_scale=params["sm_scale"], softcap=params["softcap"],
            dropout_p=params["dropout_p"], rng_block=rng_block,
            q_start=q_start, c_start=c_start, seqlen_k=sk,
            has_right=has_right, has_left=has_left, window=window,
            offset=offset, apply_position_mask=apply_position_mask,
            fm_mode=fm_mode if apply_position_mask else None,
            fmv=fm_ref[0, 0] if fm_ref is not None else None,
            qpos=qpos_ref[0] if (has_positions and apply_position_mask) else None,
            kpos=kpos_ref[0] if (has_positions and apply_position_mask) else None,
            pos_window=params.get("pos_window", (-1, -1)),
        )
        if dbias_ref is not None:
            if dbias_group_acc:
                dbias_ref[0, 0] += ds_raw  # zeroed at gi == 0 below
            else:
                dbias_ref[0, 0] = ds_raw
        dtype = q.dtype
        # dV += P_dropped^T @ dO   (contract over q rows)
        dv_t = jax.lax.dot_general(
            p_dropped.astype(dtype), do,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        # dK += dS^T @ (sm_scale·Q) — the scale already lives in q_scaled
        dk_t = jax.lax.dot_general(
            ds.astype(dtype), q_scaled,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        if single_shot:
            dv_ref[0, 0] = dv_t
            dk_ref[0, 0] = dk_t
        else:
            dv_scr[...] += dv_t
            dk_scr[...] += dk_t
        if with_dq:
            # dQ partial for this (kv-block, q-block, head); sm_scale is
            # applied once after the reduction
            dq_partial = jax.lax.dot_general(
                ds.astype(dtype), k_ref[0, 0],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if single_shot:
                dq_ref[0, 0] = dq_partial
            elif dq_in_scratch:
                dq_scr[j_inner] += dq_partial
            else:
                dq_ref[0, 0, 0] = dq_partial

    if params["has_bias"] and dbias_group_acc:
        # head-broadcast bias: the (b, hk, q, kv) dbias block stays
        # resident across the g consecutive group steps and accumulates
        # in place (no g per-head fp32 workspace). Zero it before the
        # first member's += (also covers skipped blocks).
        @pl.when(gi == 0)
        def _zero_dbias_acc():
            dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])

    # Masking rows beyond seqlen_q matters here (their p/ds must be 0), so
    # fold the q-bounds check into the boundary branch.
    needs_branch = (
        has_right or has_left
        or (sk % bk != 0) or (sq % bq != 0)
        or fm_mode is not None or has_positions or has_segments
    )
    if needs_branch:
        @pl.when(jnp.logical_and(should_run, fully_unmasked))
        def _fast():
            body(False)

        @pl.when(jnp.logical_and(should_run, jnp.logical_not(fully_unmasked)))
        def _masked():
            body(True)
    else:
        @pl.when(should_run)
        def _run():
            body(False)

    if params["has_bias"] and not dbias_group_acc:
        # dbias blocks for skipped (q, kv) pairs must still be zeroed.
        @pl.when(jnp.logical_not(should_run))
        def _zero_dbias():
            dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])

    if with_dq and not dq_in_scratch:
        # skipped pairs own their dq partial block: zero it
        @pl.when(jnp.logical_not(should_run))
        def _zero_dq():
            dq_ref[0, 0, 0] = jnp.zeros_like(dq_ref[0, 0, 0])

    if with_dq and dq_in_scratch and not single_shot:
        # Rectangular grid: every q-block's dq is complete only at the
        # final kv sweep, so emission (and the out spec's index change)
        # happens there; earlier sweeps keep the out index frozen so no
        # dead writebacks occur. Flat causal grid: q-block iq's LAST
        # visit is its diagonal sweep (later sweeps ikv > iq never touch
        # it), so dq emits at ikv == iq — the first g steps of each
        # sweep — and the out spec freezes on the just-emitted block in
        # between (rewriting identical data at sweep transitions).
        nkv = params["num_kv_blocks"]

        @pl.when(ikv == iq if flat_iter else ikv == nkv - 1)
        def _emit_dq():
            dq_ref[0, 0] = dq_scr[j_inner]

    if not single_shot:
        @pl.when(sweep_last if flat_iter else j_inner == g * nq - 1)
        def _finish():
            dk_ref[0, 0] = dk_scr[...]
            dv_ref[0, 0] = dv_scr[...]


def _bwd_dq_kernel(refs, *, params):
    it = iter(refs)
    if params["dropout_p"] > 0.0:
        seed_ref = next(it)
    fm_mode = params.get("fm_mode")
    if fm_mode is not None:
        fmstats_ref = next(it)
    has_blockmask = params.get("has_blockmask", False)
    if has_blockmask:
        bm_ref = next(it)
    has_positions = params.get("has_positions", False)
    if has_positions:
        qpstats_ref = next(it)
        kpstats_ref = next(it)
    has_segments = params["has_segments"]
    if has_segments:
        qsst_ref = next(it)
        ksst_ref = next(it)
    if params.get("has_eff", False):
        next(it)  # effective-fetch DMA table: used by index maps only
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = (
        next(it), next(it), next(it), next(it), next(it), next(it),
    )
    bias_ref = next(it) if params["has_bias"] else None
    qseg_ref = next(it) if has_segments else None
    kseg_ref = next(it) if has_segments else None
    fm_ref = next(it) if fm_mode is not None else None
    qpos_ref = next(it) if has_positions else None
    kpos_ref = next(it) if has_positions else None
    dq_ref = next(it)
    dq_scr = next(it)

    b_idx, h_idx = pl.program_id(0), pl.program_id(1)
    iq, ikv = pl.program_id(2), pl.program_id(3)
    bq, bk = params["block_q"], params["block_k"]
    sq, sk = params["seqlen_q"], params["seqlen_k"]
    offset = params["offset"]
    window = params["window"]
    has_right, has_left = params["has_right"], params["has_left"]
    nkv = params["num_kv_blocks"]

    @pl.when(ikv == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q_start = iq * bq
    c_start = ikv * bk
    q_last_real = jnp.minimum(q_start + bq, sq) - 1
    c_last = c_start + bk - 1
    c_last_real = jnp.minimum(c_last, sk - 1)

    should_run = jnp.logical_and(q_start < sq, c_start < sk)
    if has_right:
        should_run = jnp.logical_and(
            should_run, c_start <= q_last_real + offset + window[1]
        )
    if has_left:
        should_run = jnp.logical_and(
            should_run, c_last_real >= q_start + offset - window[0]
        )

    fully_unmasked = c_last < sk
    if has_right:
        fully_unmasked = jnp.logical_and(
            fully_unmasked, c_last <= q_start + offset + window[1]
        )
    if has_left:
        fully_unmasked = jnp.logical_and(
            fully_unmasked, c_start >= q_start + bq - 1 + offset - window[0]
        )

    if fm_mode is not None:
        fm_heads = params["fm_heads"]
        hm_idx = h_idx // (pl.num_programs(1) // fm_heads) if fm_heads > 1 else 0
        fm_nv = FM_NV[fm_mode]
        base = ((b_idx * fm_heads + hm_idx) * nkv + ikv) * (fm_nv * 2)
        fm_skip, fm_bypass = fm_skip_bypass(
            fm_mode, lambda v_, w_: fmstats_ref[base + v_ * 2 + w_],
            q_start, q_last_real + 1,
        )
        should_run = jnp.logical_and(should_run, jnp.logical_not(fm_skip))
        fully_unmasked = jnp.logical_and(fully_unmasked, fm_bypass)

    if has_blockmask:
        bm_heads = params["bm_heads"]
        # The dQ grid's head axis IS the query head (no GQA group loop here),
        # so the per-head mask index derives from h_idx directly.
        bm_idx = h_idx // (pl.num_programs(1) // bm_heads) if bm_heads > 1 else 0
        bbase = ((b_idx * bm_heads + bm_idx) * params["num_q_blocks"] + iq) \
            * params["num_kv_blocks"]
        should_run = jnp.logical_and(should_run, bm_ref[bbase + ikv] != 0)

    if has_positions:
        pw = params.get("pos_window", (-1, -1))
        q_lo = qpstats_ref[(b_idx * params["num_q_blocks"] + iq) * 2]
        q_hi = qpstats_ref[(b_idx * params["num_q_blocks"] + iq) * 2 + 1]
        k_lo = kpstats_ref[(b_idx * nkv + ikv) * 2]
        k_hi = kpstats_ref[(b_idx * nkv + ikv) * 2 + 1]
        if pw[1] >= 0:
            should_run = jnp.logical_and(should_run, k_lo <= q_hi + pw[1])
            fully_unmasked = jnp.logical_and(
                fully_unmasked, k_hi <= q_lo + pw[1]
            )
        if pw[0] >= 0:
            should_run = jnp.logical_and(should_run, k_hi >= q_lo - pw[0])
            fully_unmasked = jnp.logical_and(
                fully_unmasked, k_lo >= q_hi - pw[0]
            )

    if has_segments:
        q_mn = qsst_ref[(b_idx * params["num_q_blocks"] + iq) * 2]
        q_mx = qsst_ref[(b_idx * params["num_q_blocks"] + iq) * 2 + 1]
        k_mn = ksst_ref[(b_idx * nkv + ikv) * 2]
        k_mx = ksst_ref[(b_idx * nkv + ikv) * 2 + 1]
        should_run = jnp.logical_and(
            should_run, jnp.logical_and(q_mn <= k_mx, k_mn <= q_mx)
        )
        fully_unmasked = jnp.logical_and(
            fully_unmasked,
            jnp.logical_and(
                jnp.logical_and(q_mn == q_mx, k_mn == k_mx), q_mn == k_mn
            ),
        )

    def body(apply_position_mask):
        q = q_ref[0, 0]
        rng_block = None
        if params["dropout_p"] > 0.0:
            rng_block = (
                seed_ref[0],
                (b_idx + seed_ref[1]) * pl.num_programs(1) + h_idx,
            )
        _, ds, _, _ = _recompute_p_ds(
            q, k_ref[0, 0], v_ref[0, 0], do_ref[0, 0],
            _stat_col(lse_ref, params), _stat_col(delta_ref, params),
            bias_ref[0, 0] if bias_ref is not None else None,
            qseg_ref[0] if qseg_ref is not None else None,
            kseg_ref[0] if kseg_ref is not None else None,
            sm_scale=params["sm_scale"], softcap=params["softcap"],
            dropout_p=params["dropout_p"], rng_block=rng_block,
            q_start=q_start, c_start=c_start, seqlen_k=sk,
            has_right=has_right, has_left=has_left, window=window,
            offset=offset, apply_position_mask=apply_position_mask,
            fm_mode=fm_mode if apply_position_mask else None,
            fmv=fm_ref[0, 0] if fm_ref is not None else None,
            qpos=qpos_ref[0] if (has_positions and apply_position_mask) else None,
            kpos=kpos_ref[0] if (has_positions and apply_position_mask) else None,
            pos_window=params.get("pos_window", (-1, -1)),
        )
        # dQ += dS @ K (the sm_scale factor is applied once in _finish)
        dq_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), k_ref[0, 0],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    needs_branch = (
        has_right or has_left or (sk % bk != 0) or fm_mode is not None
        or has_positions or has_segments
    )
    if needs_branch:
        @pl.when(jnp.logical_and(should_run, fully_unmasked))
        def _fast():
            body(False)

        @pl.when(jnp.logical_and(should_run, jnp.logical_not(fully_unmasked)))
        def _masked():
            body(True)
    else:
        @pl.when(should_run)
        def _run():
            body(False)

    @pl.when(ikv == nkv - 1)
    def _finish():
        dq_ref[0, 0] = (dq_scr[...] * params["sm_scale"]).astype(dq_ref.dtype)


def flash_attention_bwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    out: jax.Array,
    lse: jax.Array,
    do: jax.Array,
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
    interpret: Optional[bool] = None,
    flashmask_vecs: Optional[jax.Array] = None,
    flashmask_mode: Optional[str] = None,
    block_mask=None,
    q_positions: Optional[jax.Array] = None,
    kv_positions: Optional[jax.Array] = None,
    _batch_offset=0,
):
    """Backward flash attention on (b, h, s, d) tensors.

    Returns (dq, dk, dv) with dk/dv reduced over the GQA group (shape of k/v).

    _batch_offset (internal): global batch index of q[0] when the caller
    streams the batch (batch-broadcast dbias); keeps the dropout salt —
    (global batch)·H + head — identical to the unchunked forward pass.
    """
    if causal:
        window_size = (window_size[0], 0)
    # With positions, causal/window bounds apply to the POSITION values and
    # the global row/col window machinery is disabled (see fwd.py).
    pos_window = (-1, -1)
    if q_positions is not None:
        pos_window = window_size
        window_size = (-1, -1)
    b, h, sq, d = q.shape
    _, hk, sk, _ = k.shape
    g = h // hk
    if block_sizes is None:
        block_sizes = BlockSizes.for_shape(sq, sk, d, q.dtype)

    # delta = rowsum(dO * O) (≙ dot_do_o preprocess, flash_bwd_kernel.h:78)
    delta = jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)

    has_right = window_size[1] >= 0
    has_left = window_size[0] >= 0
    offset = sk - sq
    has_bias = bias is not None
    has_segments = q_segment_ids is not None
    has_flashmask = flashmask_vecs is not None
    fm_heads = flashmask_vecs.shape[1] if has_flashmask else 1
    has_blockmask = block_mask is not None
    bm_heads = block_mask[0].shape[1] if has_blockmask else 1
    has_positions = q_positions is not None

    if has_bias:
        bias = jnp.asarray(bias)
        if bias.ndim == 2:
            bias = bias[None, None]
        elif bias.ndim == 3:
            bias = bias[:, None]

    if has_bias and bias.shape[0] == 1 and b > 1:
        # Batch-broadcast trained bias: emitting dbias through a
        # (b, h|hk, sq, sk) fp32 workspace multiplies the O(s²) dbias
        # memory by b. Stream the batch instead — one backward per batch
        # element, dbias accumulated across iterations (the reference
        # reduces into one dbias buffer with atomics,
        # flash_bwd_kernel.h:1117 dbias path; sequential accumulation is
        # the TPU equivalent). Peak workspace: (1, h|hk, sq, sk).
        def one(i):
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i, 1, 0)
            opt = lambda x: None if x is None else (
                sl(x) if x.shape[0] > 1 else x)
            bm = None
            if block_mask is not None:
                bmask, gq_, gk_ = block_mask
                bm = (opt(bmask), gq_, gk_)
            return flash_attention_bwd(
                sl(q), sl(k), sl(v), sl(out), sl(lse), sl(do),
                bias, opt(q_segment_ids), opt(kv_segment_ids),
                sm_scale=sm_scale, causal=False,
                window_size=pos_window if has_positions else window_size,
                softcap=softcap, dropout_p=dropout_p,
                dropout_seed=dropout_seed, block_sizes=block_sizes,
                interpret=interpret,
                flashmask_vecs=opt(flashmask_vecs),
                flashmask_mode=flashmask_mode, block_mask=bm,
                q_positions=opt(q_positions),
                kv_positions=opt(kv_positions),
                _batch_offset=i,
            )

        def body_fn(i, carry):
            dq_a, dk_a, dv_a, db_a = carry
            dq_c, dk_c, dv_c, db_c = one(i)
            upd = lambda a, c: jax.lax.dynamic_update_slice_in_dim(
                a, c, i, 0)
            return (upd(dq_a, dq_c), upd(dk_a, dk_c), upd(dv_a, dv_c),
                    db_a + db_c.astype(jnp.float32))

        init = (jnp.zeros(q.shape, q.dtype), jnp.zeros(k.shape, k.dtype),
                jnp.zeros(v.shape, v.dtype),
                jnp.zeros(bias.shape, jnp.float32))
        dq_o, dk_o, dv_o, db_o = jax.lax.fori_loop(0, b, body_fn, init)
        return dq_o, dk_o, dv_o, db_o.astype(bias.dtype)

    interp = interpret_mode() if interpret is None else interpret

    def make_common(bq, bk, nq, nkv, kv_index, q_index,
                    qh_map=None, kh_map=None):
        """in_specs + inputs shared by both kernels.

        qh_map(b_, h_, i, j, *refs) -> query-head index and kh_map(h_) ->
        kv-head index let the dKV kernel run its grid over KV heads with
        the group member folded into the inner axis."""
        if qh_map is None:
            qh_map = lambda b_, h_, i, j, *r: h_
        if kh_map is None:
            kh_map = lambda h_: h_ // g
        qp = pad_to_block(q, 2, bq)
        kp = pad_to_block(k, 2, bk)
        vp = pad_to_block(v, 2, bk)
        dop = pad_to_block(do, 2, bq)
        stats_packed = stats_packed_ok(bq, qp.shape[2])
        if stats_packed:
            # Dense lane-packed stats: (b, h, sqp) viewed as
            # (b, h, sqp/128, 128) — a free bitcast. The old x8 lane
            # replication padded 8 -> 128 lanes physically (16x bytes) and
            # cost ~4 ms/step in XLA broadcasts at GPT-2 training shapes;
            # the kernel unpacks the (bq/128, 128) block to a (bq, 1)
            # column in VMEM instead.
            lsep = pad_to_block(lse, 2, bq).reshape(b, h, -1, 128)
            deltap = pad_to_block(delta, 2, bq).reshape(b, h, -1, 128)
            stat_block = (1, 1, bq // 128, 128)
        else:
            # lane-replicated x8 stats (Mosaic block rule) — tiny-block
            # fallback for sub-128 test shapes
            lsep = pad_to_block(
                jnp.broadcast_to(lse[..., None], lse.shape + (8,)), 2, bq
            )
            deltap = pad_to_block(
                jnp.broadcast_to(delta[..., None], delta.shape + (8,)), 2, bq
            )
            stat_block = (1, 1, bq, 8)
        # *a-style index maps: a = (b_, h_, i, j, *scalar_refs) for the
        # rectangular grids, (b_, h_, t, *scalar_refs) for the flat causal
        # grid — the provided kv_index/q_index/qh_map match the grid arity
        inputs = [qp, kp, vp, dop, lsep, deltap]
        q_spec = lambda *a: (a[0], qh_map(*a), q_index(*a), 0)
        kv_spec = lambda *a: (a[0], kh_map(a[1]), kv_index(*a), 0)
        specs = [
            pl.BlockSpec((1, 1, bq, d), q_spec),
            pl.BlockSpec((1, 1, bk, d), kv_spec),
            pl.BlockSpec((1, 1, bk, d), kv_spec),
            pl.BlockSpec((1, 1, bq, d), q_spec),
            pl.BlockSpec(stat_block, q_spec),
            pl.BlockSpec(stat_block, q_spec),
        ]
        if has_bias:
            bp = pad_to_block(pad_to_block(bias, 3, bk), 2, bq)
            bb, bh = bp.shape[0], bp.shape[1]
            specs.append(
                pl.BlockSpec(
                    (1, 1, bq, bk),
                    lambda *a, bb=bb, bh=bh: (
                        a[0] if bb > 1 else 0,
                        qh_map(*a) if bh > 1 else 0,
                        q_index(*a),
                        kv_index(*a),
                    ),
                )
            )
            inputs.append(bp)
        if has_segments:
            qsegp = pad_to_block(
                q_segment_ids.astype(jnp.int32), 1, bq
            )[:, :, None]
            ksegp = pad_to_block(
                kv_segment_ids.astype(jnp.int32), 1, bk
            )[:, None, :]
            specs.append(pl.BlockSpec(
                (1, bq, 1), lambda *a: (a[0], q_index(*a), 0)
            ))
            specs.append(pl.BlockSpec(
                (1, 1, bk), lambda *a: (a[0], 0, kv_index(*a))
            ))
            inputs.extend([qsegp, ksegp])
        if has_flashmask:
            fmp = fm_pad_vecs(flashmask_vecs, flashmask_mode, bk)
            nv = fmp.shape[2]
            fm_g = h // fm_heads
            specs.append(pl.BlockSpec(
                (1, 1, nv, bk),
                lambda *a: (a[0], qh_map(*a) // fm_g, 0, kv_index(*a)),
            ))
            inputs.append(fmp)
        if has_positions:
            from .common import pos_pad_and_stats

            qposp, _ = pos_pad_and_stats(q_positions, bq)
            kposp, _ = pos_pad_and_stats(kv_positions, bk)
            specs.append(pl.BlockSpec(
                (1, bq, 1), lambda *a: (a[0], q_index(*a), 0)
            ))
            specs.append(pl.BlockSpec(
                (1, 1, bk), lambda *a: (a[0], 0, kv_index(*a))
            ))
            inputs.extend([qposp[:, :, None], kposp[:, None, :]])
        return inputs, specs, qp.shape[2], kp.shape[2]

    num_prefetch = 0
    seed_input = []
    if dropout_p > 0.0:
        num_prefetch = 1
        # [seed, global batch offset] — the offset keeps dropout salts
        # aligned with the forward pass when the batch is streamed
        seed_input = [jnp.stack([
            jnp.asarray(dropout_seed, jnp.int32).reshape(()),
            jnp.asarray(_batch_offset, jnp.int32).reshape(()),
        ])]
    if has_flashmask:
        num_prefetch += 1
    if has_blockmask:
        num_prefetch += 1
    if has_positions:
        num_prefetch += 2
    if has_segments:
        num_prefetch += 2

    def pos_prefetch(bq, bk):
        if not has_positions:
            return []
        from .common import pos_pad_and_stats

        _, qst = pos_pad_and_stats(q_positions, bq)
        _, kst = pos_pad_and_stats(kv_positions, bk)
        return [qst, kst]

    def seg_prefetch(bq, bk):
        if not has_segments:
            return []
        from .common import seg_block_stats

        return [seg_block_stats(q_segment_ids, bq),
                seg_block_stats(kv_segment_ids, bk)]

    def fm_prefetch(bk):
        if not has_flashmask:
            return []
        return [fm_block_stats(fm_pad_vecs(flashmask_vecs, flashmask_mode, bk), bk)]

    def bm_prefetch(bq, bk, nq, nkv):
        if not has_blockmask:
            return []
        bmask, gq, gk = block_mask
        return [expand_block_mask(bmask, gq, gk, bq, bk, nq, nkv, b)]

    # Effective-fetch tables kill the HBM traffic of mask-skipped tiles
    # (same scheme as fwd.py; see common.effective_kv_table). The dKV kernel
    # iterates q innermost so it gets an effective-Q table; the dQ kernel an
    # effective-KV table. Safe with bias: the grid still visits every
    # (q, kv) step and the dbias out-spec indexes by the RAW step — the
    # table only redirects the input DMA of compute-skipped steps, whose
    # dbias blocks the kernel zeroes. Disabled only for mismatched
    # mask-head counts.
    use_eff = (
        (has_flashmask or has_blockmask or has_segments or has_positions)
        and not (has_flashmask and has_blockmask and fm_heads != bm_heads)
    )
    if use_eff:
        num_prefetch += 1
    eff_ho = fm_heads if has_flashmask else (bm_heads if has_blockmask else 1)

    def visibility(bq, bk, nq, nkv):
        from .common import fm_skip_bypass as _fsb

        qs_arr = jnp.arange(nq, dtype=jnp.int32) * bq
        ql_arr = jnp.minimum(qs_arr + bq, sq) - 1
        cs_arr = jnp.arange(nkv, dtype=jnp.int32) * bk
        cl_arr = jnp.minimum(cs_arr + bk - 1, sk - 1)
        vis = jnp.logical_and(qs_arr[:, None] < sq, cs_arr[None, :] < sk)
        if has_right:
            vis = jnp.logical_and(
                vis,
                cs_arr[None, :] <= ql_arr[:, None] + offset + window_size[1],
            )
        if has_left:
            vis = jnp.logical_and(
                vis,
                cl_arr[None, :] >= qs_arr[:, None] + offset - window_size[0],
            )
        vis = jnp.broadcast_to(vis[None, None], (b, eff_ho, nq, nkv))
        if has_flashmask:
            fmp = fm_pad_vecs(flashmask_vecs, flashmask_mode, bk)
            r_ = fmp.reshape(b, fm_heads, fmp.shape[2], nkv, bk)
            mx, mn = r_.max(-1), r_.min(-1)
            st = lambda v_, w_: (mx if w_ == 0 else mn)[:, :, v_][:, :, None, :]
            fm_skip, _ = _fsb(
                flashmask_mode, st,
                qs_arr[None, None, :, None], (ql_arr + 1)[None, None, :, None],
            )
            vis = jnp.logical_and(vis, jnp.logical_not(fm_skip))
        if has_blockmask:
            bmask, gq, gk = block_mask
            bm_full = expand_block_mask(
                bmask, gq, gk, bq, bk, nq, nkv, b
            ).reshape(b, bm_heads, nq, nkv)
            vis = jnp.logical_and(vis, bm_full != 0)
        if has_segments:
            from .common import seg_block_stats

            qst2 = seg_block_stats(q_segment_ids, bq).reshape(b, nq, 2)
            kst2 = seg_block_stats(kv_segment_ids, bk).reshape(b, nkv, 2)
            seg_vis = jnp.logical_and(
                qst2[:, :, None, 0] <= kst2[:, None, :, 1],
                kst2[:, None, :, 0] <= qst2[:, :, None, 1],
            )
            vis = jnp.logical_and(vis, seg_vis[:, None])
        if has_positions:
            from .common import pos_pad_and_stats

            _, qpst = pos_pad_and_stats(q_positions, bq)
            _, kpst = pos_pad_and_stats(kv_positions, bk)
            qpst2 = qpst.reshape(b, nq, 2)
            kpst2 = kpst.reshape(b, nkv, 2)
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
        return vis

    def eff_index_fn(n_outer, n_inner):
        """Index fn reading the eff table (last scalar ref) at
        ((b*ho + hh)*n_outer + i)*n_inner + j."""
        hog = h // eff_ho

        def fn(b_, h_, i, j, *refs):
            eff = refs[-1]
            hh = h_ // hog if eff_ho > 1 else 0
            return eff[((b_ * eff_ho + hh) * n_outer + i) * n_inner + j]

        return fn

    # ---- dKV kernel: grid (b, h, kv-block, q-block) ----
    bq1, bk1 = block_sizes.block_q_dkv, block_sizes.block_k_dkv
    bq1 = min(bq1, round_up(sq, 128))
    bk1 = min(bk1, round_up(sk, 128))
    nq1, nkv1 = -(-round_up(sq, bq1) // bq1), -(-round_up(sk, bk1) // bk1)

    dbias_group_acc = has_bias and g > 1 and bias.shape[1] == 1

    # Single-pass backward: the dKV kernel also produces dQ (5 matmuls
    # per tile vs 7 for the split dKV+dQ pair — one recompute serves all
    # grads), accumulating it in a persistent VMEM scratch across the
    # sequential kv axis, or — when the scratch won't fit — in an fp32
    # HBM partials workspace reduced by XLA. Only when neither fits does
    # the separate dQ kernel below run. This serves every feature path:
    # bias/segments/positions/flashmask/blocksparse ride the same
    # scalar-prefetch machinery as dK/dV. The single-KV-block case
    # (nkv1 == 1, e.g. s <= 1024 at 1024 tiles) uses the merged kernel
    # too: even though each (q, kv) pair is visited once either way, the
    # split pair re-runs the exp-heavy p/ds recompute per kernel, and at
    # d = 64 the VPU exp IS the kernel's critical path (profiled: the
    # GPT-2 backward spent 2 of its 3 attention-kernel invocations
    # per layer on duplicate recompute).
    dq_scratch_bytes = g * nq1 * bq1 * d * 4
    dq_in_scratch = dq_scratch_bytes <= MERGED_DQ_SCRATCH_CAP
    workspace_bytes = b * h * nkv1 * round_up(sq, bq1) * d * 4
    with_dq = (
        dq_in_scratch or workspace_bytes <= MERGED_DQ_WORKSPACE_CAP
    )

    # Flat causal iteration (mirror of fwd.py flat_causal): collapse
    # (ikv, j) into one sequential axis over the visited lower-triangle
    # pairs. Needs the aligned pure-causal geometry, no feature that
    # indexes by the raw rectangular step (bias dbias out-spec, eff
    # tables), and the dq-in-VMEM merged mode (the HBM-workspace mode
    # relies on dead steps zeroing their partial blocks).
    flat_causal = (
        FLAT_CAUSAL and has_right and offset + window_size[1] == 0
        and not has_bias and not has_segments
        and not has_flashmask and not has_blockmask and not has_positions
        and bq1 == bk1 and sq == sk and sq % bq1 == 0
        and with_dq and dq_in_scratch
    )

    def _iq_of(j):
        return j // g if g > 1 else j

    def q_index_dkv(b_, h_, ikv, j, *refs):
        # clamp skipped q blocks onto the resident block to kill dead DMAs;
        # with a dbias output every (q, kv) block must be visited unclamped.
        iq = _iq_of(j)
        if has_bias:
            return iq
        if has_right:
            lo = jnp.maximum((ikv * bk1 - offset - window_size[1]) // bq1, 0)
            iq = jnp.maximum(iq, lo)
        if has_left:
            hi = (ikv * bk1 + bk1 - 1 - offset + window_size[0]) // bq1
            iq = jnp.minimum(iq, jnp.maximum(hi, 0))
        return jnp.clip(iq, 0, nq1 - 1)

    def qh_map_dkv(b_, h_, ikv, j, *refs):
        # grid head axis = KV head; group member is the fastest-moving
        # index of the inner axis
        return h_ * g + j % g if g > 1 else h_

    eff1 = []
    if use_eff:
        from .common import effective_kv_table

        # dKV: inner axis is q — transpose visibility to (b, ho, nkv, nq)
        eff1 = [effective_kv_table(
            jnp.swapaxes(visibility(bq1, bk1, nq1, nkv1), 2, 3)
        )]
        _eff_raw = eff_index_fn(nkv1, nq1)

        def q_index_dkv(b_, h_, ikv, j, *refs):
            return _eff_raw(b_, qh_map_dkv(b_, h_, ikv, j, *refs),
                            ikv, _iq_of(j), *refs)
    flat_tabs1 = []
    if flat_causal:
        # sweep ikv visits q rows [ikv, nq) whose (optional) left window
        # still reaches back to this kv block
        def _lo(i):
            if not has_left:
                return 0
            return max(0, (i * bq1 + offset - window_size[0]) // bk1)

        pairs1 = [
            (ikv, iq * g + gi)
            for ikv in range(nkv1)
            for iq in range(ikv, nq1)
            if _lo(iq) <= ikv
            for gi in range(g)
        ]
        flat_tabs1 = [
            # trailing -1 sentinel for the kernel's sweep_last check
            jnp.asarray([p[0] for p in pairs1] + [-1], jnp.int32),
            jnp.asarray([p[1] for p in pairs1], jnp.int32),
        ]
        # the flat tables are the last two scalar-prefetch refs (eff is
        # excluded by the flat gate); maps get (b_, h_, t, *scalar_refs)
        kv_index1 = lambda b_, h_, t, *r: r[-2][t]
        q_index1 = lambda b_, h_, t, *r: _iq_of(r[-1][t])
        qh_map1 = (
            (lambda b_, h_, t, *r: h_ * g + r[-1][t] % g)
            if g > 1 else (lambda b_, h_, t, *r: h_)
        )
    else:
        kv_index1 = lambda b_, h_, ikv, j, *r: ikv
        q_index1 = q_index_dkv
        qh_map1 = qh_map_dkv
    inputs1, specs1, sqp1, skp1 = make_common(
        bq1, bk1, nq1, nkv1,
        kv_index=kv_index1, q_index=q_index1,
        qh_map=qh_map1, kh_map=lambda h_: h_,
    )
    params1 = dict(
        group=g, num_heads=h, dbias_group_acc=dbias_group_acc,
        with_dq=with_dq, dq_in_scratch=dq_in_scratch,
        sm_scale=sm_scale, softcap=softcap, dropout_p=dropout_p,
        has_bias=has_bias, has_segments=has_segments,
        has_right=has_right, has_left=has_left, window=window_size,
        offset=offset, seqlen_q=sq, seqlen_k=sk,
        block_q=bq1, block_k=bk1, num_q_blocks=nq1, num_kv_blocks=nkv1,
        fm_mode=flashmask_mode if has_flashmask else None,
        fm_heads=fm_heads,
        has_blockmask=has_blockmask,
        bm_heads=bm_heads,
        has_positions=has_positions,
        has_eff=use_eff,
        pos_window=pos_window,
        flat_iter=flat_causal,
        stats_packed=stats_packed_ok(bq1, sqp1),
        # one (q, kv, group) step per (b, h) and no block-skip feature:
        # dK/dV/dQ each complete in the single body — write them directly
        # (XFA_SINGLE_SHOT=0 lever shared with the fwd kernel)
        single_shot=(
            SINGLE_SHOT
            and nkv1 == 1 and g * nq1 == 1 and not has_bias
            and not has_segments and not has_flashmask
            and not has_blockmask and not has_positions and not has_left
            and (not has_right or offset >= 0)
            and with_dq and dq_in_scratch
        ),
    )
    if flat_causal:
        dkv_map = lambda b_, h_, t, *r: (b_, h_, r[-2][t], 0)
    else:
        dkv_map = lambda b_, h_, ikv, j, *_: (b_, h_, ikv, 0)
    out_specs1 = [
        pl.BlockSpec((1, 1, bk1, d), dkv_map),
        pl.BlockSpec((1, 1, bk1, d), dkv_map),
    ]
    out_shapes1 = [
        jax.ShapeDtypeStruct((b, hk, skp1, d), jnp.float32),
        jax.ShapeDtypeStruct((b, hk, skp1, d), jnp.float32),
    ]
    if has_bias:
        if dbias_group_acc:
            out_specs1.append(
                pl.BlockSpec(
                    (1, 1, bq1, bk1),
                    lambda b_, h_, ikv, j, *r: (b_, h_, _iq_of(j), ikv),
                )
            )
            out_shapes1.append(
                jax.ShapeDtypeStruct((b, hk, sqp1, skp1), jnp.float32)
            )
        else:
            out_specs1.append(
                pl.BlockSpec(
                    (1, 1, bq1, bk1),
                    lambda b_, h_, ikv, j, *r: (
                        b_, qh_map_dkv(b_, h_, ikv, j, *r), _iq_of(j), ikv
                    ),
                )
            )
            out_shapes1.append(
                jax.ShapeDtypeStruct((b, h, sqp1, skp1), jnp.float32)
            )
    dkv_scratch = [
        pltpu.VMEM((bk1, d), jnp.float32),
        pltpu.VMEM((bk1, d), jnp.float32),
    ]
    if with_dq:
        if dq_in_scratch:
            if flat_causal:
                def dq_idx(b_, h_, t, *r):
                    # emit on the diagonal (ikv == iq, the first g steps
                    # of each kv sweep); in between, freeze on the LAST
                    # emitted block so the only extra writeback rewrites
                    # identical data (see kernel _emit_dq comment)
                    ikv_, j_ = r[-2][t], r[-1][t]
                    emit = _iq_of(j_) == ikv_
                    qh = h_ * g + j_ % g if g > 1 else h_
                    return (
                        b_, jnp.where(emit, qh, h_ * g + g - 1), ikv_, 0
                    )
            else:
                def dq_idx(b_, h_, ikv, j, *r):
                    # only addressed during the final kv sweep; clamped to a
                    # constant earlier so revisiting never triggers a
                    # writeback of the untouched buffer
                    last = ikv == nkv1 - 1
                    qh = qh_map_dkv(b_, h_, ikv, j, *r)
                    return (b_, jnp.where(last, qh, h_ * g),
                            jnp.where(last, _iq_of(j), 0), 0)

            out_specs1.append(pl.BlockSpec((1, 1, bq1, d), dq_idx))
            out_shapes1.append(
                jax.ShapeDtypeStruct((b, h, sqp1, d), jnp.float32))
            dkv_scratch.append(
                pltpu.VMEM((nq1 * g, bq1, d), jnp.float32))
        else:
            out_specs1.append(pl.BlockSpec(
                (1, 1, 1, bq1, d),
                lambda b_, h_, ikv, j, *r: (
                    b_, qh_map_dkv(b_, h_, ikv, j, *r), ikv,
                    _iq_of(j), 0)))
            out_shapes1.append(
                jax.ShapeDtypeStruct((b, h, nkv1, sqp1, d), jnp.float32))
    results1 = pl.pallas_call(
        functools.partial(_bwd_dkv_entry, params=params1),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=num_prefetch + (2 if flat_causal else 0),
            grid=(
                (b, hk, len(pairs1)) if flat_causal
                else (b, hk, nkv1, nq1 * g)
            ),
            in_specs=specs1,
            out_specs=out_specs1,
            scratch_shapes=dkv_scratch,
        ),
        out_shape=out_shapes1,
        compiler_params=pltpu.CompilerParams(
            # dq scratch accumulation needs the kv axis sequential;
            # otherwise it can split across megacore
            dimension_semantics=(
                ("parallel", "parallel", "arbitrary") if flat_causal else (
                    "parallel", "parallel",
                    "arbitrary" if (with_dq and dq_in_scratch) else "parallel",
                    "arbitrary",
                )
            ),
            vmem_limit_bytes=max(
                64 * 2**20,
                dq_scratch_bytes + 32 * 2**20 if (with_dq and dq_in_scratch)
                else 0,
            ),
        ),
        interpret=interp,
    )(*seed_input, *fm_prefetch(bk1), *bm_prefetch(bq1, bk1, nq1, nkv1),
      *pos_prefetch(bq1, bk1), *seg_prefetch(bq1, bk1), *eff1, *flat_tabs1,
      *inputs1)
    dk_ph, dv_ph = results1[0], results1[1]
    dbias = None
    if has_bias:
        dbias_full = results1[2][:, :, :sq, :sk]
        # reduce over broadcast batch/head dims of the original bias
        # (group-accumulated outputs already folded the per-KV-head group)
        bb, bh = bias.shape[0], bias.shape[1]
        if bb == 1:
            dbias_full = jnp.sum(dbias_full, axis=0, keepdims=True)
        if bh == 1:
            dbias_full = jnp.sum(dbias_full, axis=1, keepdims=True)
        dbias = dbias_full.astype(bias.dtype)
    # dK/dV come out already group-accumulated at (b, hk, sk, d)
    dk = dk_ph[:, :, :sk].astype(k.dtype)
    dv = dv_ph[:, :, :sk].astype(v.dtype)
    if with_dq:
        dqp = results1[3 if has_bias else 2]
        if dq_in_scratch:
            dq = (dqp[:, :, :sq] * sm_scale).astype(q.dtype)
        else:
            dq = (dqp.sum(axis=2)[:, :, :sq] * sm_scale).astype(q.dtype)
        return dq, dk, dv, dbias

    # ---- dQ kernel (fallback: single KV block, or dq scratch AND
    # workspace both unaffordable): grid (b, h, q-block, kv-block) ----
    bq2, bk2 = block_sizes.block_q_dq, block_sizes.block_k_dq
    bq2 = min(bq2, round_up(sq, 128))
    bk2 = min(bk2, round_up(sk, 128))
    nq2, nkv2 = -(-round_up(sq, bq2) // bq2), -(-round_up(sk, bk2) // bk2)

    def kv_index_dq(b_, h_, iq, ikv, *refs):
        if has_right:
            hi = jnp.maximum((iq * bq2 + bq2 - 1 + offset + window_size[1]) // bk2, 0)
            ikv = jnp.minimum(ikv, hi)
        if has_left:
            lo = jnp.minimum((iq * bq2 + offset - window_size[0]) // bk2, nkv2 - 1)
            ikv = jnp.maximum(ikv, jnp.maximum(lo, 0))
        return jnp.clip(ikv, 0, nkv2 - 1)

    eff2 = []
    if use_eff:
        from .common import effective_kv_table

        eff2 = [effective_kv_table(visibility(bq2, bk2, nq2, nkv2))]
        kv_index_dq = eff_index_fn(nq2, nkv2)
    inputs2, specs2, sqp2, _ = make_common(
        bq2, bk2, nq2, nkv2,
        kv_index=kv_index_dq,
        q_index=lambda b_, h_, iq, ikv, *r: iq,
    )
    params2 = dict(params1)
    params2.update(
        block_q=bq2, block_k=bk2, num_q_blocks=nq2, num_kv_blocks=nkv2,
        stats_packed=stats_packed_ok(bq2, sqp2),
    )
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_entry, params=params2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=num_prefetch,
            grid=(b, h, nq2, nkv2),
            in_specs=specs2,
            out_specs=pl.BlockSpec(
                (1, 1, bq2, d), lambda b_, h_, iq, ikv, *_: (b_, h_, iq, 0)
            ),
            scratch_shapes=[pltpu.VMEM((bq2, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sqp2, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interp,
    )(*seed_input, *fm_prefetch(bk2), *bm_prefetch(bq2, bk2, nq2, nkv2),
      *pos_prefetch(bq2, bk2), *seg_prefetch(bq2, bk2), *eff2, *inputs2)
    dq = dq[:, :, :sq]
    return dq, dk, dv, dbias


def _bwd_dkv_entry(*refs, params):
    _bwd_dkv_kernel(refs, params=params)


def _bwd_dq_entry(*refs, params):
    _bwd_dq_kernel(refs, params=params)
