"""Varlen packing utilities (≙ reference flash_attn/bert_padding.py).

`unpad_input` (reference :97) turns a padded batch (b, s, ...) plus an
attention mask into a packed (total_nnz, ...) tensor with `cu_seqlens`;
`pad_input` (:120) is the inverse. The reference wraps torch gather/scatter
in autograd Functions (IndexFirstAxis/IndexPutFirstAxis :9,39); in JAX
`jnp.take`/scatter are natively differentiable so no custom VJP is needed.

TPU note: shapes must be static under jit, so `unpad_input` here keeps the
packed buffer at the *padded* capacity (total = b*s) with valid tokens
front-packed — the flash kernels mask the tail via segment ids, and
`indices`/`cu_seqlens` index only the valid prefix. Outside jit you may pass
``static_total`` to trim.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["unpad_input", "pad_input", "index_first_axis", "index_put_first_axis"]


def index_first_axis(x: jax.Array, indices: jax.Array) -> jax.Array:
    """Gather rows of a flattened (b*s, ...) tensor (≙ IndexFirstAxis :9)."""
    return jnp.take(x, indices, axis=0)


def index_put_first_axis(values: jax.Array, indices: jax.Array,
                         first_axis_dim: int) -> jax.Array:
    """Scatter rows into zeros((first_axis_dim, ...)) (≙ IndexPutFirstAxis :39)."""
    out = jnp.zeros((first_axis_dim,) + values.shape[1:], dtype=values.dtype)
    return out.at[indices].set(values)


def index_first_axis_residual(x: jax.Array, indices: jax.Array):
    """Gather rows and pass the full tensor through as a residual
    (≙ IndexFirstAxisResidual :65 — the reference needs a custom autograd
    Function to fuse the two grads; JAX differentiates the pair natively)."""
    return jnp.take(x, indices, axis=0), x


def unpad_input(
    hidden_states: jax.Array,
    attention_mask: jax.Array,
    static_total: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """hidden_states: (batch, seqlen, ...); attention_mask: (batch, seqlen)
    bool/int, 1 = valid.

    Returns (packed, indices, cu_seqlens, max_seqlen_in_batch, segment_ids):
      packed: (total, ...) valid tokens front-packed (total = b*s or
        static_total); invalid tail is zeros.
      indices: (total,) flat indices of each packed token in the (b*s)
        input. With total = b*s this is a permutation (valid positions
        first), so pad_input is an exact inverse: tail zeros scatter back
        into the padding slots.
      cu_seqlens: (batch+1,) int32 cumulative sequence lengths.
      max_seqlen_in_batch: () int32 (traced; for static use pass shapes).
      segment_ids: (total,) int32, 1-based sequence id, 0 for the tail.
    """
    b, s = attention_mask.shape
    mask = attention_mask.astype(bool)
    seqlens = jnp.sum(mask, axis=-1, dtype=jnp.int32)
    cu_seqlens = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(seqlens, dtype=jnp.int32)]
    )
    total = static_total if static_total is not None else b * s
    flat_mask = mask.reshape(-1)
    # Stable front-pack: order = argsort of (not valid) keeps valid order.
    order = jnp.argsort(~flat_mask, stable=True)
    indices = order[:total].astype(jnp.int32)
    x = hidden_states.reshape((b * s,) + hidden_states.shape[2:])
    packed = jnp.take(x, indices, axis=0)
    valid = jnp.take(flat_mask, indices)
    packed = jnp.where(
        valid.reshape((-1,) + (1,) * (packed.ndim - 1)), packed, 0
    )
    seg = jnp.take((jnp.arange(b, dtype=jnp.int32)[:, None] + 1)
                   * jnp.ones((1, s), jnp.int32), indices).reshape(-1)
    segment_ids = jnp.where(valid, seg, 0)
    max_seqlen = jnp.max(seqlens)
    return packed, indices, cu_seqlens, max_seqlen, segment_ids


def pad_input(packed: jax.Array, indices: jax.Array, batch: int,
              seqlen: int) -> jax.Array:
    """Inverse of unpad_input (≙ reference pad_input :120)."""
    out = index_put_first_axis(packed, indices, batch * seqlen)
    return out.reshape((batch, seqlen) + packed.shape[1:])
