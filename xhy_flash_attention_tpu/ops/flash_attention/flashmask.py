"""FlashMask — column-wise sparse attention masks (public API).

TPU-native equivalent of the reference's FlashMask kernel family
(csrc/flash_attn/src/flash_fwd_kernel.h:1055 `compute_attn_1rowblock_flashmask`,
csrc/flashmask_v2/, C API csrc/capi/flash_attn.h:38-43): instead of an O(s²)
dense mask, each KV column carries up to four row indices
(LTStart/LTEnd/UTStart/UTEnd — "downstart/downend/upstart/upend") describing
half-open masked row bands

  lower-triangular band: rows in [LTStart[c], LTEnd[c]) are masked,
  upper-triangular band: rows in [UTStart[c], UTEnd[c]) are masked,

with per-KV-block max/min of each vector precomputed so the kernel can skip
fully-masked blocks entirely and bypass mask arithmetic on fully-unmasked
blocks (≙ SPARSE_MASKED / enable_mask_bypass, flash_fwd_kernel.h:1305-1349;
scan prepass csrc/flash_attn/src/mask.h:59-127 — here a plain XLA
reshape+min/max since the stats array is tiny).

Accepted encodings of ``startend_row_indices`` (b, hm, seqlen_k, NV), matching
the PaddlePaddle `flashmask_attention` convention the reference serves:

  causal=True,  NV=1: [LTStart]                        (LTEnd = seqlen)
  causal=True,  NV=2: [LTStart, LTEnd]
  causal=False, NV=2: [LTStart, UTEnd]                 (bands extend to edges)
  causal=False, NV=4: [LTStart, LTEnd, UTStart, UTEnd]

hm must divide the number of query heads (1 = shared mask).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .bwd import flash_attention_bwd
from .common import BlockSizes, fm_mode_for
from .fwd import flash_attention_fwd

__all__ = [
    "flashmask_attention",
    "flashmask_to_dense",
    "causal_document_mask",
    "sliding_window_mask",
    "global_sliding_window_mask",
]


@functools.lru_cache(maxsize=None)
def _make_flashmask_fn(static, return_lse):
    (sm_scale, causal, mode, block_sizes) = static
    kw = dict(
        sm_scale=sm_scale,
        causal=causal,
        flashmask_mode=mode,
        block_sizes=block_sizes,
    )

    @jax.custom_vjp
    def attn(q, k, v, fm_vecs):
        out, lse = flash_attention_fwd(
            q, k, v, flashmask_vecs=fm_vecs, need_lse=return_lse, **kw
        )
        return (out, lse) if return_lse else out

    def attn_fwd(q, k, v, fm_vecs):
        out, lse = flash_attention_fwd(
            q, k, v, flashmask_vecs=fm_vecs, need_lse=True, **kw
        )
        res = (q, k, v, fm_vecs, out, lse)
        return ((out, lse) if return_lse else out), res

    def attn_bwd(res, g):
        q, k, v, fm_vecs, out, lse = res
        do = g[0] if return_lse else g
        dq, dk, dv, _ = flash_attention_bwd(
            q, k, v, out, lse, do, flashmask_vecs=fm_vecs, **kw
        )
        return dq, dk, dv, None

    attn.defvjp(attn_fwd, attn_bwd)
    return attn


def flashmask_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    startend_row_indices: jax.Array,
    *,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    block_sizes: Optional[BlockSizes] = None,
    return_lse: bool = False,
):
    """Sparse-mask flash attention on (b, h, s, d) inputs.

    startend_row_indices: (b, hm, seqlen_k, NV) int32, see module docstring.
    Differentiable in q, k, v. Returns out (and lse if return_lse).
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    idx = jnp.asarray(startend_row_indices, jnp.int32)
    if idx.ndim != 4:
        raise ValueError(
            f"startend_row_indices must be (b, hm, seqlen_k, NV), got {idx.shape}"
        )
    nv = idx.shape[-1]
    mode = fm_mode_for(causal, nv)
    if idx.shape[2] != sk:
        raise ValueError(f"mask seqlen {idx.shape[2]} != key seqlen {sk}")
    vecs = jnp.moveaxis(idx, -1, 2)  # (b, hm, NV, sk)
    if softmax_scale is None:
        softmax_scale = d ** -0.5
    fn = _make_flashmask_fn(
        (float(softmax_scale), bool(causal), mode, block_sizes), bool(return_lse)
    )
    return fn(q, k, v, vecs)


# ---------------------------------------------------------------------------
# Reference + constructors
# ---------------------------------------------------------------------------

def flashmask_to_dense(
    startend_row_indices: jax.Array, seqlen_q: int, causal: bool
) -> jax.Array:
    """Materialize the dense boolean mask (True = attend) described by
    flashmask indices — the O(s²) semantics the kernel implements sparsely.
    Test/debug utility (≙ reference dense-mask equivalence checks)."""
    idx = jnp.asarray(startend_row_indices, jnp.int32)
    b, hm, sk, nv = idx.shape
    fm_mode_for(causal, nv)  # validate
    rows = jnp.arange(seqlen_q, dtype=jnp.int32)[:, None]  # (sq, 1)
    vec = lambda i: idx[:, :, None, :, i]  # (b, hm, 1, sk)
    if causal:
        lts = vec(0)
        banned = rows >= lts
        if nv == 2:
            banned = jnp.logical_and(banned, rows < vec(1))
        cols = jnp.arange(sk, dtype=jnp.int32)[None, :]
        banned = jnp.logical_or(banned, cols > rows)
    elif nv == 2:
        banned = jnp.logical_or(rows >= vec(0), rows < vec(1))
    else:
        banned = jnp.logical_or(
            jnp.logical_and(rows >= vec(0), rows < vec(1)),
            jnp.logical_and(rows >= vec(2), rows < vec(3)),
        )
    return jnp.logical_not(banned)  # (b, hm, sq, sk)


def causal_document_mask(doc_ids: jax.Array) -> jax.Array:
    """Causal document (block-diagonal) mask: token i attends to j ≤ i in the
    same document.  doc_ids: (b, s) int32 non-decreasing document labels.
    Returns (b, 1, s, 1) indices for causal=True."""
    b, s = doc_ids.shape
    pos = jnp.arange(s, dtype=jnp.int32)[None, :]
    # LTStart[c] = first position after c's document ends
    same = doc_ids[:, None, :] == doc_ids[:, :, None]  # (b, s, s)
    last_same = jnp.max(jnp.where(same, pos[:, None, :], -1), axis=-1)
    return (last_same + 1).astype(jnp.int32)[:, None, :, None]


def sliding_window_mask(batch: int, seqlen: int, window: int) -> jax.Array:
    """Causal sliding-window: token i attends to [i-window+1, i].
    Returns (b, 1, s, 1) indices for causal=True."""
    c = jnp.arange(seqlen, dtype=jnp.int32)
    lts = jnp.minimum(c + window, seqlen)
    return jnp.broadcast_to(lts[None, None, :, None], (batch, 1, seqlen, 1))


def global_sliding_window_mask(
    batch: int, seqlen: int, window: int, num_global: int
) -> jax.Array:
    """Sliding window + global prefix tokens (LongFormer-style), causal.
    Returns (b, 1, s, 2) indices for causal=True."""
    c = jnp.arange(seqlen, dtype=jnp.int32)
    lts = jnp.where(c < num_global, seqlen, jnp.minimum(c + window, seqlen))
    lte = jnp.full((seqlen,), seqlen, jnp.int32)
    idx = jnp.stack([lts, lte], axis=-1)
    return jnp.broadcast_to(idx[None, None], (batch, 1, seqlen, 2))
