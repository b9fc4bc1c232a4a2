"""Block-sparse flash attention (public API).

TPU-native equivalent of the reference's FA1-generation blocksparse kernels
(csrc/flash_attn_with_bias_and_mask/src/fmha_block_fprop_kernel_1xN.h,
fmha_blockmask.h; Python interface flash_attn/flash_blocksparse_attn_interface.py
and flash_blocksparse_attention.py).

The reference takes a (seqlen/256, seqlen/16) blockmask, sorts the active
column blocks per row block (`convert_blockmask`,
flash_blocksparse_attn_interface.py:8) and iterates only those inside the
CUDA kernel.  On TPU the same effect is tile-granular grid pruning: the 0/1
block mask rides scalar-prefetch SMEM and every off tile is skipped with a
`pl.when` guard before any MXU/VPU work is issued, in both the forward and
the two backward kernels.  TPU tiling constraints make (8,128) the minimum
tile, so the block mask granularity must be a multiple of the kernel tile
(128 rather than the reference's 16-wide column blocks).

Optionally combines with causal masking and dropout like the reference
(flash_blocksparse_attn_func(..., causal=, dropout_p=)).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .bwd import flash_attention_bwd
from .common import BlockSizes, round_up
from .fwd import flash_attention_fwd

__all__ = [
    "blocksparse_attention",
    "blockmask_to_dense",
    "flash_blocksparse_attn_func",
]


def _tiles_for(granularity: Tuple[int, int], d: int) -> BlockSizes:
    """Kernel tiles that evenly subdivide the user block granularity."""
    gq, gk = granularity

    def fit(pref, g):
        t = min(pref, g)
        while g % t:
            t -= 128
        return max(t, 128)

    return BlockSizes(
        block_q=fit(256, gq), block_k=fit(512 if d <= 128 else 256, gk),
        block_q_dkv=fit(128, gq), block_k_dkv=fit(256 if d <= 128 else 128, gk),
        block_q_dq=fit(256 if d <= 128 else 128, gq), block_k_dq=fit(128, gk),
    )


@functools.lru_cache(maxsize=None)
def _make_blocksparse_fn(static):
    sm_scale, causal, gq, gk, dropout_p = static

    def run_fwd(q, k, v, bmask, seed, need_lse):
        return flash_attention_fwd(
            q, k, v,
            sm_scale=sm_scale, causal=causal,
            dropout_p=dropout_p, dropout_seed=seed,
            block_mask=(bmask, gq, gk),
            block_sizes=_tiles_for((gq, gk), q.shape[-1]),
            need_lse=need_lse,
        )

    @jax.custom_vjp
    def attn(q, k, v, bmask, seed):
        out, _ = run_fwd(q, k, v, bmask, seed, need_lse=False)
        return out

    def attn_fwd(q, k, v, bmask, seed):
        out, lse = run_fwd(q, k, v, bmask, seed, need_lse=True)
        return out, (q, k, v, bmask, seed, out, lse)

    def attn_bwd(res, do):
        q, k, v, bmask, seed, out, lse = res
        dq, dk, dv, _ = flash_attention_bwd(
            q, k, v, out, lse, do,
            sm_scale=sm_scale, causal=causal,
            dropout_p=dropout_p, dropout_seed=seed,
            block_mask=(bmask, gq, gk),
            block_sizes=_tiles_for((gq, gk), q.shape[-1]),
        )
        return dq, dk, dv, None, None

    attn.defvjp(attn_fwd, attn_bwd)
    return attn


def blocksparse_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_mask: jax.Array,
    *,
    block_size: Tuple[int, int] | int = (256, 256),
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
):
    """Block-sparse attention on (b, h, s, d) inputs.

    block_mask: (b|1, hm|1, ceil(sq/gq), ceil(sk/gk)) 0/1; an off block is
    skipped entirely (no HBM compute traffic). Granularities must be
    multiples of 128. Differentiable in q, k, v.
    """
    if isinstance(block_size, int):
        block_size = (block_size, block_size)
    gq, gk = int(block_size[0]), int(block_size[1])
    if gq % 128 or gk % 128:
        raise ValueError(f"block_size must be multiples of 128, got {block_size}")
    b, h, sq, d = q.shape
    sk = k.shape[2]
    bm = jnp.asarray(block_mask, jnp.int32)
    if bm.ndim == 2:
        bm = bm[None, None]
    expect = (round_up(sq, gq) // gq, round_up(sk, gk) // gk)
    if bm.shape[2:] != expect:
        raise ValueError(f"block_mask {bm.shape[2:]} != expected {expect}")
    if softmax_scale is None:
        softmax_scale = d ** -0.5
    if dropout_p > 0.0 and dropout_seed is None:
        raise ValueError("dropout requires dropout_seed")
    seed = (jnp.zeros((), jnp.int32) if dropout_seed is None
            else jnp.asarray(dropout_seed, jnp.int32))
    fn = _make_blocksparse_fn(
        (float(softmax_scale), bool(causal), gq, gk, float(dropout_p))
    )
    return fn(q, k, v, bm, seed)


def blockmask_to_dense(
    block_mask: jax.Array, seqlen_q: int, seqlen_k: int,
    block_size: Tuple[int, int] | int,
) -> jax.Array:
    """Expand a block mask to a dense (b|1, hm, sq, sk) boolean mask
    (True = attend). Test/debug utility."""
    if isinstance(block_size, int):
        block_size = (block_size, block_size)
    bm = jnp.asarray(block_mask).astype(bool)
    if bm.ndim == 2:
        bm = bm[None, None]
    m = jnp.repeat(jnp.repeat(bm, block_size[0], 2), block_size[1], 3)
    return m[:, :, :seqlen_q, :seqlen_k]


def flash_blocksparse_attn_func(
    qkv: jax.Array,
    block_mask: jax.Array,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    *,
    block_size: Tuple[int, int] | int = (256, 256),
    dropout_seed: Optional[jax.Array] = None,
):
    """Reference-compat wrapper: qkv packed (b, s, 3, h, d)
    (≙ flash_blocksparse_attn_func, flash_blocksparse_attn_interface.py:135;
    the cu_seqlens varlen form is served by segment ids on the dense API).
    Returns (b, s, h, d)."""
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    out = blocksparse_attention(
        q, k, v, block_mask, block_size=block_size, causal=causal,
        softmax_scale=softmax_scale, dropout_p=dropout_p,
        dropout_seed=dropout_seed,
    )
    return out.transpose(0, 2, 1, 3)
