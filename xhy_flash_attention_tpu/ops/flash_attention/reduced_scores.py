"""calc_reduced_attn_scores — per-key attention mass, recomputed from LSE.

TPU-native equivalent of the reference's standalone kernel
(csrc/flash_attn/src/calc_reduced_attn_scores_kernel.h:14-60, C API
csrc/capi/flash_attn.cu:1107): given q, k and the softmax LSE saved by a
previous flash-attention forward, recompute P = exp(q·kᵀ·scale − lse) and
reduce over queries, producing

    reduced[b, h, j] = Σ_i exp(softmax_scale · (q_i · k_j) − lse_i)

i.e. how much total attention each key receives (used for attention-score
analysis / sparsity decisions).  The reference parallelizes over KV blocks
with atomicAdd into the output (write_reduced_scores,
calc_reduced_attn_scores_kernel.h:93-110); TPUs have no atomics, so the
q-block loop is the innermost sequential grid axis accumulating into VMEM
scratch — which also makes the result deterministic.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import BlockSizes, interpret_mode, pad_to_block

__all__ = ["calc_reduced_attn_scores"]


def _reduced_kernel(q_ref, k_ref, lse_ref, out_ref, acc_scr, *,
                    sm_scale, seqlen_q, seqlen_k, block_q, block_k,
                    num_q_blocks, causal):
    ikv, iq = pl.program_id(2), pl.program_id(3)

    @pl.when(iq == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q_start = iq * block_q
    c_start = ikv * block_k

    @pl.when(q_start < seqlen_q)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s *= sm_scale
        lse = lse_ref[0, 0][:, :1]  # (bq, 1) fp32; +inf on empty rows -> p=0
        p = jnp.exp(s - lse)
        rows = q_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        valid = rows < seqlen_q
        if causal:
            cols = c_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            valid = jnp.logical_and(valid, cols <= rows + (seqlen_k - seqlen_q))
        p = jnp.where(valid, p, 0.0)
        acc_scr[0:1, :] += jnp.sum(p, axis=0, keepdims=True)

    @pl.when(iq == num_q_blocks - 1)
    def _finish():
        out_ref[0, 0] = jnp.broadcast_to(acc_scr[0:1, :], out_ref.shape[2:])


def calc_reduced_attn_scores(
    q: jax.Array,
    k: jax.Array,
    lse: jax.Array,
    *,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Reduced per-key attention scores.

    q: (b, h, sq, d); k: (b, hk, sk, d) with h % hk == 0; lse: (b, h, sq)
    fp32 as returned by flash_attention_fwd. Returns (b, h, sk) fp32.
    ``causal`` restricts the sum to the causal region (superset of the
    reference, which always reduces the full rectangle).
    """
    b, h, sq, d = q.shape
    _, hk, sk, _ = k.shape
    g = h // hk
    if softmax_scale is None:
        softmax_scale = d ** -0.5
    if block_sizes is None:
        block_sizes = BlockSizes.for_shape(sq, sk, d, q.dtype)
    from .common import round_up
    bq = min(block_sizes.block_q, round_up(sq, 128))
    bk = min(block_sizes.block_k, round_up(sk, 128))

    qp = pad_to_block(q, 2, bq)
    kp = pad_to_block(k, 2, bk)
    lsep = pad_to_block(
        jnp.broadcast_to(lse.astype(jnp.float32)[..., None], lse.shape + (8,)),
        2, bq,
    )
    nq, nkv = qp.shape[2] // bq, kp.shape[2] // bk

    out = pl.pallas_call(
        functools.partial(
            _reduced_kernel,
            sm_scale=float(softmax_scale), seqlen_q=sq, seqlen_k=sk,
            block_q=bq, block_k=bk, num_q_blocks=nq, causal=causal,
        ),
        grid=(b, h, nkv, nq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, ikv, iq: (b_, h_, iq, 0)),
            pl.BlockSpec(
                (1, 1, bk, d), lambda b_, h_, ikv, iq, g=g: (b_, h_ // g, ikv, 0)
            ),
            pl.BlockSpec((1, 1, bq, 8), lambda b_, h_, ikv, iq: (b_, h_, iq, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 8, bk), lambda b_, h_, ikv, iq: (b_, h_, 0, ikv)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, 8, kp.shape[2]), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, bk), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode() if interpret is None else interpret,
    )(qp, kp, lsep)
    return out[:, :, 0, :sk]
