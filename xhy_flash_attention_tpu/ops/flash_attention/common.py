"""Shared helpers for the Pallas flash-attention kernel family."""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

# Mask additions use a large-but-finite negative instead of -inf so that
# exp(masked - masked) never produces NaN (reference guards the same case at
# csrc/flash_attn/src/flash_fwd_kernel.h:509-514 by special-casing empty rows).
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

NEG_INF = DEFAULT_MASK_VALUE


def interpret_mode() -> bool:
    """Run Pallas kernels in interpret mode (tests on CPU set XFA_INTERPRET=1)."""
    env = os.environ.get("XFA_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() == "cpu"


def fp8_to_f32(x: jax.Array) -> jax.Array:
    """e4m3fn -> f32 inside a kernel via integer bit reconstruction.

    v5e has no fp8 hardware and Mosaic's emulated astype measures
    78 Gelem/s; this 3-int-op route measures 325 Gelem/s
    (benchmarks/ab_fp8_convert.py, chip A/B): (i32 << 24) >> 4 lands the
    sign at bit 31, eeee at 26..23 and mmm at 22..20; the AND clears the
    sign-extension garbage in bits 30..27; the fmul rebiases the exponent
    by 2^120. Exact on every normal e4m3 code; the 14 nonzero subnormal
    codes (|v| <= 7/8 * 2^-6, i.e. 3e-5 of the 448 e4m3 range) flush to
    zero on the chip (TPU FTZ on the f32-subnormal intermediate) and stay
    exact in interpret mode. Callers fold scales into the returned f32
    before casting to bf16.
    """
    return fp8_to_f32_tiny(x) * jnp.float32(2.0 ** 120)


def fp8_to_f32_tiny(x: jax.Array) -> jax.Array:
    """e4m3fn -> f32 * 2^-120 in THREE integer ops (no fmul): the
    exponent rebias is left to the caller, who folds 2^120 into a scale
    it multiplies anyway (e.g. the quantized-KV per-token scales). Every
    normal e4m3 code maps exactly — 2^(e-127)(1+m/8) for e >= 1 is a
    normal f32 AND, after the bf16 cast callers do, a normal bf16
    (bf16 min normal = 2^-126 = the e=1 value)."""
    i = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
    t = jax.lax.shift_right_arithmetic(i << 24, 4) & jnp.int32(
        -2013265921)  # 0x87FFFFFF
    return jax.lax.bitcast_convert_type(t, jnp.float32)


# scale factor callers fold into their own multiplies when using
# fp8_to_f32_tiny payloads
FP8_TINY_REBIAS = 2.0 ** 120


def stats_packed_ok(bq: int, sqp: int) -> bool:
    """Whether the lane-packed (sqp/128, 128) lse/delta layout is
    Mosaic-legal at this block size: the per-block sublane count bq/128
    must be a multiple of 8 OR the block must span the whole padded
    sequence (Mosaic's block divisibility rule — caught compiled-only by
    the chip feature smoke; interpret mode does not enforce it)."""
    return bq % 128 == 0 and ((bq // 128) % 8 == 0 or bq == sqp)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(a: int, b: int) -> int:
    return cdiv(a, b) * b


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Tile sizes for the attention kernels.

    Plays the role of the reference's per-head-dim tile table
    (csrc/flash_attn/src/flash_fwd_launch_template.h:72-87 and
    kernel_traits.h) — but chosen for the MXU/VMEM instead of smem/regs.
    """

    block_q: int = 256
    block_k: int = 256
    # backward tiles
    block_q_dkv: int = 128
    block_k_dkv: int = 256
    block_q_dq: int = 256
    block_k_dq: int = 128

    @staticmethod
    def for_shape(seqlen_q: int, seqlen_k: int, head_dim: int,
                  dtype=jnp.bfloat16) -> "BlockSizes":
        """Heuristic tile selection (≙ reference run_mha_fwd_hdim* configs).

        Measured on TPU v5e (d=128, s=4k, causal): 1024x1024 tiles run the
        forward at ~98 TFLOP/s and fwd+bwd at ~83 TFLOP/s vs 44/31 for
        256-class tiles — VPU/MXU pipelining wants deep tiles, and VMEM
        (q,k,v tiles + fp32 accumulators, double-buffered) still fits
        comfortably at d<=128. d>128 halves the tile to stay inside VMEM.
        """
        big = 1024 if head_dim <= 128 else 512
        bq = min(big, round_up(seqlen_q, 128))
        bk = min(big, round_up(seqlen_k, 128))
        return BlockSizes(
            block_q=bq,
            block_k=bk,
            block_q_dkv=bq,
            block_k_dkv=bk,
            block_q_dq=bq,
            block_k_dq=bk,
        )


def dropout_keep_mask(seed, salt, rows, cols, dropout_p: float):
    """Counter-based keep mask (True = keep), keyed on *global* positions.

    Plays the role of the reference's Philox counters (flash.h philox_args):
    the mask for an element depends only on (seed, salt, row, col), never on
    tile sizes or grid order, so forward and backward — with different
    tilings — regenerate identical masks. Murmur3-style finalizer over a
    Weyl-sequence mix; cheap VPU int ops, works compiled and interpreted.

    rows: int32 (m, 1) global row ids; cols: int32 (1, n) global col ids;
    seed: int32 scalar; salt: int32 scalar (e.g. batch*H + head).
    """
    u = jnp.uint32
    x = (
        rows.astype(jnp.uint32) * u(0x9E3779B1)
        + cols.astype(jnp.uint32) * u(0x85EBCA77)
        + (seed.astype(jnp.uint32) ^ (salt.astype(jnp.uint32) * u(0xC2B2AE3D)))
    )
    x = x ^ jax.lax.shift_right_logical(x, u(16))
    x = x * u(0x7FEB352D)
    x = x ^ jax.lax.shift_right_logical(x, u(15))
    x = x * u(0x846CA68B)
    x = x ^ jax.lax.shift_right_logical(x, u(16))
    threshold = u(min(int(dropout_p * 4294967296.0), 4294967295))
    return x >= threshold


# ---------------------------------------------------------------------------
# FlashMask (column-wise sparse mask) shared logic.
#
# The reference encodes sparse attention masks as up-to-4 per-column row-index
# vectors (downstart/downend/upstart/upend, csrc/capi/flash_attn.h:38-43) and
# precomputes per-KV-block max/min of each vector to skip fully-masked blocks
# and bypass mask work on fully-unmasked blocks (SPARSE_MASKED macros,
# csrc/flash_attn/src/flash_fwd_kernel.h:1305-1349; scan kernel
# csrc/flash_attn/src/mask.h:4-127).  On TPU the scan is a plain XLA
# reshape+min/max prepass, the block stats ride scalar-prefetch SMEM, and
# skip/bypass are `pl.when` guards.
# ---------------------------------------------------------------------------

# number of index vectors per mode
FM_NV = {"causal_1": 1, "causal_2": 2, "full_2": 2, "full_4": 4}
# pad value per vector position (starts pad 0, ends pad "huge"):
# padded columns read as fully-masked, which keeps block stats conservative.
FM_BIG = 2 ** 30
FM_PAD = {
    "causal_1": (0,),
    "causal_2": (0, FM_BIG),
    "full_2": (0, FM_BIG),
    "full_4": (0, FM_BIG, 0, FM_BIG),
}


def fm_mode_for(causal: bool, num_vecs: int) -> str:
    """Map (causal, #vectors) to a FlashMask mode (≙ the reference's
    flashmask_lt_has_end / flashmask_ut_has_start runtime flags)."""
    if causal and num_vecs == 1:
        return "causal_1"
    if causal and num_vecs == 2:
        return "causal_2"
    if not causal and num_vecs == 2:
        return "full_2"
    if not causal and num_vecs == 4:
        return "full_4"
    raise ValueError(
        f"flashmask: causal={causal} with {num_vecs} index vectors is not a "
        "valid combination (causal: 1 or 2; non-causal: 2 or 4)"
    )


def fm_block_stats(vecs_padded: jax.Array, block_k: int) -> jax.Array:
    """Per-KV-block [max, min] of each flashmask vector (≙ scanMaxMinKernel,
    csrc/flash_attn/src/mask.h:4-47), flattened int32 for scalar prefetch.

    vecs_padded: (b, hm, NV, skp) int32 with skp % block_k == 0.
    Returns (b * hm * nkv * NV * 2,) laid out so the kernel reads
    stats[(((b*hm + h)*nkv + ikv)*NV + v)*2 + {0:max, 1:min}].
    """
    b, hm, nv, skp = vecs_padded.shape
    r = vecs_padded.reshape(b, hm, nv, skp // block_k, block_k)
    st = jnp.stack([r.max(axis=-1), r.min(axis=-1)], axis=-1)  # (b,hm,nv,nkv,2)
    st = jnp.moveaxis(st, 2, 3)  # (b, hm, nkv, nv, 2)
    return st.reshape(-1).astype(jnp.int32)


def fm_skip_bypass(mode: str, st, q_start, q_end):
    """Block-level decisions from scalar stats.

    st(v, which): scalar getter; which 0 = max, 1 = min over the KV block.
    Returns (skip, bypass): skip — every (row, col) in the tile is masked
    (≙ SPARSE_MASKED, flash_fwd_kernel.h:1305-1311); bypass — no element is
    flashmasked so the elementwise pass can be skipped (≙ the
    enable_mask_bypass conditions, flash_fwd_kernel.h:1347-1349, 1416-1417).
    Both are conservative across columns (max/min bounds).
    """
    lts_max, lts_min = st(0, 0), st(0, 1)
    if mode == "causal_1":
        skip = q_start >= lts_max
        bypass = q_end <= lts_min
    elif mode == "causal_2":
        lte_max, lte_min = st(1, 0), st(1, 1)
        skip = jnp.logical_and(q_start >= lts_max, q_end <= lte_min)
        bypass = jnp.logical_or(q_end <= lts_min, q_start >= lte_max)
    elif mode == "full_2":
        ute_max, ute_min = st(1, 0), st(1, 1)
        skip = jnp.logical_or(q_start >= lts_max, q_end <= ute_min)
        bypass = jnp.logical_and(q_end <= lts_min, q_start >= ute_max)
    elif mode == "full_4":
        lte_max, lte_min = st(1, 0), st(1, 1)
        uts_max, uts_min = st(2, 0), st(2, 1)
        ute_max, ute_min = st(3, 0), st(3, 1)
        skip = jnp.logical_or(
            jnp.logical_and(q_start >= lts_max, q_end <= lte_min),
            jnp.logical_and(q_start >= uts_max, q_end <= ute_min),
        )
        bypass = jnp.logical_and(
            jnp.logical_or(q_end <= lts_min, q_start >= lte_max),
            jnp.logical_or(q_end <= uts_min, q_start >= ute_max),
        )
    else:
        raise ValueError(mode)
    return skip, bypass


def fm_banned(mode: str, fmv: jax.Array, rows: jax.Array) -> jax.Array:
    """Elementwise flashmask (True = mask out).

    fmv: (NV, block_k) int32 per-column vectors for this KV block;
    rows: (block_q, block_k) int32 global row ids.  Bands are half-open
    [start, end) per the reference apply_sparse_mask* (softmax.h:181-301).
    """
    lts = fmv[0:1, :]
    if mode == "causal_1":
        return rows >= lts
    if mode == "causal_2":
        lte = fmv[1:2, :]
        return jnp.logical_and(rows >= lts, rows < lte)
    if mode == "full_2":
        ute = fmv[1:2, :]
        return jnp.logical_or(rows >= lts, rows < ute)
    if mode == "full_4":
        lte, uts, ute = fmv[1:2, :], fmv[2:3, :], fmv[3:4, :]
        return jnp.logical_or(
            jnp.logical_and(rows >= lts, rows < lte),
            jnp.logical_and(rows >= uts, rows < ute),
        )
    raise ValueError(mode)


def fm_pad_vecs(vecs: jax.Array, mode: str, block_k: int) -> jax.Array:
    """Pad the column axis of (b, hm, NV, sk) vectors to a block multiple
    with per-vector values that read as fully-masked columns."""
    b, hm, nv, sk = vecs.shape
    skp = round_up(sk, block_k)
    if skp == sk:
        return vecs.astype(jnp.int32)
    pads = jnp.tile(
        jnp.asarray(FM_PAD[mode], jnp.int32)[None, None, :, None],
        (b, hm, 1, skp - sk),
    )
    return jnp.concatenate([vecs.astype(jnp.int32), pads], axis=-1)


POS_PAD = 2 ** 30


def pos_pad_and_stats(positions: jax.Array, block: int):
    """Pad (b, s) int32 global positions to a block multiple with POS_PAD
    (reads as "never attended / attends nothing real") and compute per-block
    [min, max] flattened int32 for scalar prefetch.

    Positions drive causal masking with *traced* offsets (ring attention /
    context parallelism), where the kernels' static seqlen offset can't.
    """
    p = jnp.asarray(positions, jnp.int32)
    b, s = p.shape
    sp = round_up(s, block)
    if sp != s:
        p = jnp.concatenate(
            [p, jnp.full((b, sp - s), POS_PAD, jnp.int32)], axis=1
        )
    r = p.reshape(b, sp // block, block)
    stats = jnp.stack([r.min(-1), r.max(-1)], axis=-1)  # (b, nblk, 2)
    return p, stats.reshape(-1).astype(jnp.int32)


def seg_block_stats(segment_ids: jax.Array, block: int) -> jax.Array:
    """Per-block [min, max] of (b, s) int32 segment ids, flattened int32 for
    scalar prefetch.

    Two blocks can hold a matching pair only if their id ranges overlap, so
    the kernels use these to skip (and DMA-skip) block pairs entirely —
    the per-sequence KV-range bound of the reference's varlen BlockInfo
    (csrc/flash_attn/src/block_info.h) expressed as block stats. The ranges
    are exact for monotone packed-varlen ids and conservative (correct) for
    arbitrary ids. Padding replicates the edge value so tail blocks stay
    tight.
    """
    s = jnp.asarray(segment_ids, jnp.int32)
    b, n = s.shape
    np_ = round_up(n, block)
    if np_ != n:
        s = jnp.pad(s, ((0, 0), (0, np_ - n)), mode="edge")
    r = s.reshape(b, np_ // block, block)
    stats = jnp.stack([r.min(-1), r.max(-1)], axis=-1)  # (b, nblk, 2)
    return stats.reshape(-1).astype(jnp.int32)


def expand_block_mask(
    mask: jax.Array, gq: int, gk: int, bq: int, bk: int, nq: int, nkv: int,
    batch: int,
) -> jax.Array:
    """Resample a (b|1, hm, ceil(sq/gq), ceil(sk/gk)) 0/1 block mask from user
    granularity (gq, gk) to the kernel tile grid (nq, nkv) of tiles (bq, bk),
    flattened int32 for scalar prefetch.

    Kernel tiles must evenly subdivide user blocks (gq % bq == gk % bk == 0)
    so a tile never straddles an on/off boundary. Tiles beyond the user mask
    (padding) are turned off — they hold no real rows/cols.
    """
    if gq % bq or gk % bk:
        raise ValueError(
            f"kernel tiles ({bq},{bk}) must divide blocksparse granularity "
            f"({gq},{gk})"
        )
    m = jnp.asarray(mask, jnp.int32)
    m = jnp.repeat(jnp.repeat(m, gq // bq, axis=2), gk // bk, axis=3)
    pq, pk = nq - m.shape[2], nkv - m.shape[3]
    if pq > 0 or pk > 0:
        m = jnp.pad(m, ((0, 0), (0, 0), (0, max(pq, 0)), (0, max(pk, 0))))
    m = m[:, :, :nq, :nkv]
    return jnp.broadcast_to(m, (batch,) + m.shape[1:]).reshape(-1)


def effective_kv_table(visible: jax.Array) -> jax.Array:
    """DMA-skip table from a (b, hm, nq, nkv) visibility map.

    For each grid step (iq, ikv) the value is the kv-block index whose tile
    should be resident: the step's own block when visible, else the last
    visible block of the row (so the BlockSpec index map repeats the
    resident index and Pallas issues **no HBM traffic** for skipped steps —
    the memory-traffic half of the reference's fully-masked-block skip,
    SURVEY.md hard part #2). Rows before the first visible block clamp to
    block 0 (they fetch once; their steps still skip compute).
    Returns flattened int32 for scalar prefetch.
    """
    nkv = visible.shape[-1]
    ids = jnp.arange(nkv, dtype=jnp.int32)
    marked = jnp.where(visible, ids, -1)
    eff = jax.lax.associative_scan(jnp.maximum, marked, axis=-1)
    return jnp.maximum(eff, 0).reshape(-1).astype(jnp.int32)


def pad_to_block(x: jax.Array, axis: int, block: int) -> jax.Array:
    """Zero-pad `axis` of x up to a multiple of `block`."""
    size = x.shape[axis]
    padded = round_up(size, block)
    if padded == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, padded - size)
    return jnp.pad(x, pads)
