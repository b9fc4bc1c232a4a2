"""Pure-JAX reference attention used by the numerics contract.

The reference repo's test strategy (tests/test_flash_attn.py:111-160) compares
every kernel against two baselines:

  1. ``attention_ref(..., upcast=True)`` — fp32 math, the "ground truth";
  2. ``attention_ref(..., upcast=False, reorder_ops=True)`` — deliberately
     low-precision math in the working dtype with the scale applied to K
     instead of the scores (mimicking what a fused kernel does), used to set
     the permissible error:  |out - ref| <= 2 * |out_lp - ref|.

This module reimplements that contract in JAX (no torch).  It is also the
semantic specification for the Pallas kernels: causal/sliding-window masking,
MQA/GQA head broadcast, segment-id (varlen) masking, additive bias, softcap,
and dropout all behave exactly as defined here.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["attention_ref", "construct_local_mask", "generate_qkv_segment_ids"]


def construct_local_mask(
    seqlen_q: int,
    seqlen_k: int,
    window_size: Tuple[int, int] = (-1, -1),
    query_padding_mask: Optional[jax.Array] = None,
    key_padding_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Boolean mask (True = MASKED OUT) for causal / sliding-window attention.

    Matches the reference semantics (tests/test_flash_attn.py construct_local_mask):
    row i may attend to columns in [i + sk - sq - window_left, i + sk - sq +
    window_right], i.e. the causal diagonal is aligned to the *bottom right*
    of the attention matrix (reference README "causal mask alignment").
    """
    row_idx = jnp.arange(seqlen_q, dtype=jnp.int32)[:, None]
    col_idx = jnp.arange(seqlen_k, dtype=jnp.int32)[None, :]
    if key_padding_mask is None:
        sk = jnp.asarray(seqlen_k, dtype=jnp.int32)
    else:
        sk = jnp.sum(key_padding_mask, axis=-1, dtype=jnp.int32)[:, None, None, None]
    if query_padding_mask is None:
        sq = jnp.asarray(seqlen_q, dtype=jnp.int32)
    else:
        sq = jnp.sum(query_padding_mask, axis=-1, dtype=jnp.int32)[:, None, None, None]
    left, right = window_size
    if left < 0 and right < 0:
        return jnp.zeros((seqlen_q, seqlen_k), dtype=bool)
    masks = []
    if right >= 0:
        masks.append(col_idx > row_idx + sk - sq + right)
    if left >= 0:
        masks.append(col_idx < row_idx + sk - sq - left)
    mask = masks[0]
    for m in masks[1:]:
        mask = jnp.logical_or(mask, m)
    return mask


def attention_ref(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    query_padding_mask: Optional[jax.Array] = None,
    key_padding_mask: Optional[jax.Array] = None,
    attn_bias: Optional[jax.Array] = None,
    dropout_p: float = 0.0,
    dropout_mask: Optional[jax.Array] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    softmax_scale: Optional[float] = None,
    upcast: bool = True,
    reorder_ops: bool = False,
):
    """Reference attention. Shapes:

      q: (batch, seqlen_q, nheads, head_dim)
      k/v: (batch, seqlen_k, nheads_k, head_dim) with nheads % nheads_k == 0
      query_padding_mask: (batch, seqlen_q) bool, True = valid token
      key_padding_mask: (batch, seqlen_k) bool
      attn_bias: broadcastable to (batch, nheads, seqlen_q, seqlen_k)
      dropout_mask: (batch, nheads, seqlen_q, seqlen_k) bool, True = KEEP

    Returns (out, attn_probs) with out shape (batch, seqlen_q, nheads, head_dim).

    ``upcast=True`` computes everything in fp32 then casts back;
    ``reorder_ops=True`` folds the softmax scale into K before QK^T (the
    low-precision ordering a fused kernel uses).
    """
    if causal:
        window_size = (window_size[0], 0)
    dtype_og = q.dtype
    if upcast:
        q, k, v = q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        if attn_bias is not None:
            attn_bias = attn_bias.astype(jnp.float32)
    batch, seqlen_q, nheads, head_dim = q.shape
    seqlen_k = k.shape[1]
    nheads_k = k.shape[2]
    assert nheads % nheads_k == 0
    if nheads_k != nheads:
        k = jnp.repeat(k, nheads // nheads_k, axis=2)
        v = jnp.repeat(v, nheads // nheads_k, axis=2)
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(head_dim)
    if not reorder_ops:
        scores = jnp.einsum("bthd,bshd->bhts", q * scale, k)
    else:
        scores = jnp.einsum("bthd,bshd->bhts", q, k * scale)
    if softcap > 0.0:
        scores = jnp.tanh(scores / softcap) * softcap
    if attn_bias is not None:
        scores = scores + attn_bias
    if key_padding_mask is not None:
        scores = jnp.where(
            key_padding_mask[:, None, None, :], scores, -jnp.inf
        )
    if window_size[0] >= 0 or window_size[1] >= 0:
        local_mask = construct_local_mask(
            seqlen_q, seqlen_k, window_size, query_padding_mask, key_padding_mask
        )
        scores = jnp.where(local_mask, -jnp.inf, scores)
    # Softmax with fully-masked-row handling: rows with no valid key get 0 output
    # and probabilities 0 (reference: flash_fwd_kernel.h:509-514, lse=inf, out=0).
    row_max = jnp.max(scores, axis=-1, keepdims=True)
    row_max = jnp.maximum(row_max, jnp.finfo(scores.dtype).min)  # avoid -inf - -inf
    unnorm = jnp.exp(scores - row_max)
    unnorm = jnp.where(jnp.isneginf(scores), 0.0, unnorm)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    attention = jnp.where(denom == 0.0, 0.0, unnorm / jnp.maximum(denom, 1e-30))
    if window_size[0] >= 0 or window_size[1] >= 0:
        # rows fully outside the window produce zeros
        all_masked = jnp.all(local_mask, axis=-1, keepdims=True)
        attention = jnp.where(all_masked, 0.0, attention)
    dropout_scaling = 1.0 / (1.0 - dropout_p)
    if dropout_mask is not None:
        attention_drop = jnp.where(dropout_mask, attention, 0.0)
    else:
        attention_drop = attention
    output = jnp.einsum("bhts,bshd->bthd", attention_drop, v * dropout_scaling)
    if query_padding_mask is not None:
        output = jnp.where(query_padding_mask[:, :, None, None], output, 0.0)
        attention = jnp.where(query_padding_mask[:, None, :, None], attention, 0.0)
    if key_padding_mask is not None:
        output = output  # zero keys contribute nothing already
    return output.astype(dtype_og), attention.astype(dtype_og)


def generate_qkv_segment_ids(
    query_padding_mask: Optional[jax.Array],
    key_padding_mask: Optional[jax.Array],
    batch: int,
    seqlen_q: int,
    seqlen_k: int,
):
    """Convert padding masks to segment ids (0 = padding, i+1 = sequence i).

    Used to drive the packed/varlen kernel path from padded-batch tests.
    """
    if query_padding_mask is None:
        q_seg = jnp.broadcast_to(
            jnp.arange(1, batch + 1, dtype=jnp.int32)[:, None], (batch, seqlen_q)
        )
    else:
        q_seg = jnp.where(
            query_padding_mask, jnp.arange(1, batch + 1, dtype=jnp.int32)[:, None], 0
        )
    if key_padding_mask is None:
        k_seg = jnp.broadcast_to(
            jnp.arange(1, batch + 1, dtype=jnp.int32)[:, None], (batch, seqlen_k)
        )
    else:
        k_seg = jnp.where(
            key_padding_mask, jnp.arange(1, batch + 1, dtype=jnp.int32)[:, None], 0
        )
    return q_seg, k_seg
