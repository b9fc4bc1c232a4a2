"""Dense / MLP ops with tensor- and sequence-parallel variants.

≙ reference csrc/fused_dense_lib (K16, cuBLASLt epilogue fusion) and
flash_attn/ops/fused_dense.py (P5, the Megatron-style TP core).

TPU redesign:
  * `fused_dense` / `fused_mlp`: on TPU, bias-add and GELU fuse into the
    matmul's epilogue via XLA — a plain jnp expression *is* the fused kernel,
    so these exist for API parity and to pin fp32 accumulation.
  * tensor parallelism: `column_parallel_dense` / `row_parallel_dense` are
    shard_map-region functions over a named mesh axis. The reference's
    hand-overlapped async NCCL all-gather (FusedDenseFunc fwd :41-51, bwd
    re-gather :76-100) maps to `jax.lax.all_gather(tiled=True)` whose
    transpose (psum_scatter) XLA schedules/overlaps on ICI; the
    reduce-scatter of RowParallelLinear (:185) is `psum_scatter`.
  * sequence parallelism = the scattered (seq-sharded) activations between
    the row-parallel output and the next column-parallel input (D3).

These compose into ParallelMLP/ParallelMHA (modules/) or can be used raw.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .activations import gelu_tanh, sqrelu, swiglu

__all__ = [
    "fused_dense",
    "fused_mlp",
    "column_parallel_dense",
    "row_parallel_dense",
    "parallel_fused_mlp",
]


def fused_dense(x, weight, bias=None, activation: Optional[str] = None):
    """y = act(x @ weight + bias); weight (in, out). fp32 accumulation.

    ≙ fused_dense_lib linear_act_forward (fused_dense.cpp:213-215) — XLA
    fuses the epilogue; `preferred_element_type` pins the MXU accumulator.
    """
    y = jax.lax.dot_general(
        x, weight,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if activation == "gelu_approx":
        y = gelu_tanh(y)
    elif activation == "relu":
        y = jax.nn.relu(y)
    elif activation == "sqrelu":
        y = sqrelu(y)
    elif activation is not None:
        raise ValueError(activation)
    return y.astype(x.dtype)


def fused_mlp(x, w1, b1, w2, b2, activation: str = "gelu_approx"):
    """≙ FusedMLP (ops/fused_dense.py:405): dense → act → dense."""
    return fused_dense(fused_dense(x, w1, b1, activation), w2, b2)


def column_parallel_dense(x, weight_shard, bias_shard=None,
                          axis: Optional[str] = None,
                          sequence_parallel: bool = True,
                          activation: Optional[str] = None):
    """Inside shard_map: weight (in, out/tp) sharded on the output dim.

    With sequence_parallel, x is (seq/tp, ..., in)-sharded and all-gathered
    here (≙ FusedDenseFunc all_gather_raw overlap, fused_dense.py:41-51);
    the VJP of all_gather is psum_scatter, giving the reference's backward
    reduce-scatter of dx for free.
    """
    if axis is not None and sequence_parallel:
        x = jax.lax.all_gather(x, axis, axis=0, tiled=True)
    return fused_dense(x, weight_shard, bias_shard, activation)


def row_parallel_dense(x, weight_shard, bias=None,
                       axis: Optional[str] = None,
                       sequence_parallel: bool = True,
                       activation: Optional[str] = None):
    """Inside shard_map: weight (in/tp, out) sharded on the input dim;
    partial products summed across the axis — reduce-scatter when
    sequence_parallel (≙ RowParallelLinear, fused_dense.py:164,185),
    all-reduce otherwise. Bias is added post-reduction (unsharded)."""
    y = jax.lax.dot_general(
        x, weight_shard,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if axis is not None:
        if sequence_parallel:
            y = jax.lax.psum_scatter(y, axis, scatter_dimension=0, tiled=True)
        else:
            y = jax.lax.psum(y, axis)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if activation == "gelu_approx":
        y = gelu_tanh(y)
    return y.astype(x.dtype)


def parallel_fused_mlp(x, w1_shard, b1_shard, w2_shard, b2,
                       axis: str, sequence_parallel: bool = True,
                       activation: str = "gelu_approx"):
    """≙ ParallelFusedMLP (ops/fused_dense.py:470): column-parallel fc1 →
    activation → row-parallel fc2, seq-sharded in/out when SP."""
    h = column_parallel_dense(
        x, w1_shard, b1_shard, axis, sequence_parallel, activation
    )
    return row_parallel_dense(h, w2_shard, b2, axis, sequence_parallel)
