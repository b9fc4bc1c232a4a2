"""TP-aware linear layers (≙ reference ColumnParallelLinear /
RowParallelLinear, flash_attn/ops/fused_dense.py:143,164).

These are plain Dense layers outside shard_map; inside a shard_map region
with a tensor axis they add the Megatron collectives:

  * column-parallel: the *caller* all-gathers a sequence-sharded input
    (gather_sp_input) — the weight shard is just a local Dense kernel;
  * row-parallel: partial products are psum'd (or psum_scattered back to
    sequence shards under sequence parallelism) and the bias — stored
    replicated — is added after the reduction, exactly once.

Param layout matches nn.Dense (kernel (in, out), bias (out,)) so checkpoints
and remaps are TP-agnostic; shard/combine lives in parallel/tp.py.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..parallel.collectives import (
    copy_to_tp_region,
    gather_from_sp_region,
    reduce_from_tp_region,
    scatter_to_sp_region,
)


def gather_sp_input(x: jax.Array, tp_axis: Optional[str],
                    sequence_parallel: bool) -> jax.Array:
    """Entry collective for a column-parallel linear: all-gather a
    (b, s/tp, E) sequence-sharded activation to (b, s, E) under SP
    (≙ all_gather_raw overlap in FusedDenseFunc.forward, fused_dense.py:41 —
    its VJP is the reduce-scatter of dx); without SP, the identity/psum
    `f` operator."""
    if tp_axis is None:
        return x
    if sequence_parallel:
        return gather_from_sp_region(x, tp_axis, 1)
    return copy_to_tp_region(x, tp_axis)


def _quant_kernel_params(mod, in_features, out_features, quant_dtype):
    """Declare (kernel_q, kernel_scale) for a weight-only-quantized linear
    (≙ BASELINE config #3's weight-only INT8/INT4 projection matmuls).
    Zeros init — serving weights arrive via quantize_gpt_params."""
    wq = mod.param(
        "kernel_q",
        lambda key, shape: jnp.zeros(shape, quant_dtype),
        (in_features, out_features),
    )
    scale = mod.param(
        "kernel_scale", nn.initializers.ones, (out_features,), jnp.float32
    )
    return wq, scale


class QuantDense(nn.Module):
    """Dense with int8/int4 weights dequantized inside the matmul: XLA
    fuses the convert+scale, so HBM streams the quantized bytes."""

    features: int
    use_bias: bool = True
    quant_dtype: jnp.dtype = jnp.int8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import weight_only_quant_matmul

        wq, scale = _quant_kernel_params(
            self, x.shape[-1], self.features, self.quant_dtype
        )
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        return weight_only_quant_matmul(x, wq, scale, bias)


class RowParallelDense(nn.Module):
    features: int
    use_bias: bool = True
    tp_axis: Optional[str] = None
    sequence_parallel: bool = False
    dtype: jnp.dtype = jnp.float32
    quant_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.quant_dtype is not None:
            kernel, kscale = _quant_kernel_params(
                self, x.shape[-1], self.features, self.quant_dtype
            )
        else:
            kernel = self.param(
                "kernel", nn.initializers.normal(stddev=0.02),
                (x.shape[-1], self.features), jnp.float32,
            )
        y = jax.lax.dot_general(
            x, kernel.astype(x.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if self.quant_dtype is not None:
            y = y * kscale
        if self.tp_axis is not None:
            if self.sequence_parallel:
                # scatter rows back to sequence shards (reduce-scatter,
                # ≙ RowParallelLinear fused_dense.py:185)
                y = scatter_to_sp_region(y, self.tp_axis, 1)
            else:
                y = reduce_from_tp_region(y, self.tp_axis)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias
        return y.astype(x.dtype)
