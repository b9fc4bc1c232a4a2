"""MLP family (≙ reference flash_attn/modules/mlp.py:19-110).

`Mlp` and `GatedMlp` (SwiGLU/GEGLU) as flax modules; the reference's
ParallelMLP/ParallelGatedMlp (TP) are not separate classes — the same
modules run under pjit with fc1 column-sharded and fc2 row-sharded
(parallel/tp.py provides the PartitionSpecs), matching the Megatron layout
without code duplication.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.activations import gelu_tanh, sqrelu, swiglu, geglu
from .linear import RowParallelDense, gather_sp_input


_ACTS = {
    "gelu_approx": gelu_tanh,
    "gelu": jax.nn.gelu,
    "relu": jax.nn.relu,
    "sqrelu": sqrelu,
    "silu": jax.nn.silu,
}


class Mlp(nn.Module):
    hidden_features: int
    out_features: Optional[int] = None
    activation: str = "gelu_approx"
    bias1: bool = True
    bias2: bool = True
    tp_axis: Optional[str] = None
    sequence_parallel: bool = False
    dtype: jnp.dtype = jnp.float32
    weight_quant_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from .linear import QuantDense

        out_features = self.out_features or x.shape[-1]
        init = nn.initializers.normal(stddev=0.02)
        x = gather_sp_input(x, self.tp_axis, self.sequence_parallel)
        if self.weight_quant_dtype is not None:
            fc1 = QuantDense(self.hidden_features, use_bias=self.bias1,
                             quant_dtype=self.weight_quant_dtype,
                             dtype=self.dtype, name="fc1")
        else:
            fc1 = nn.Dense(self.hidden_features, use_bias=self.bias1,
                           dtype=self.dtype, kernel_init=init, name="fc1")
        y = fc1(x)
        y = _ACTS[self.activation](y)
        return RowParallelDense(out_features, use_bias=self.bias2,
                                tp_axis=self.tp_axis,
                                sequence_parallel=self.sequence_parallel,
                                dtype=self.dtype,
                                quant_dtype=self.weight_quant_dtype,
                                name="fc2")(y)


class GatedMlp(nn.Module):
    """SwiGLU/GEGLU (≙ reference GatedMlp, mlp.py:63): fc1 produces
    [gate; up] concatenated, activation gates the up projection."""

    hidden_features: int
    out_features: Optional[int] = None
    activation: str = "silu"  # silu -> SwiGLU, gelu_approx -> GEGLU
    bias1: bool = False
    bias2: bool = False
    multiple_of: int = 128
    tp_axis: Optional[str] = None
    sequence_parallel: bool = False
    dtype: jnp.dtype = jnp.float32
    weight_quant_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from .linear import QuantDense

        out_features = self.out_features or x.shape[-1]
        hidden = self.hidden_features
        hidden = (hidden + self.multiple_of - 1) // self.multiple_of * self.multiple_of
        init = nn.initializers.normal(stddev=0.02)
        x = gather_sp_input(x, self.tp_axis, self.sequence_parallel)
        if self.weight_quant_dtype is not None:
            fc1 = QuantDense(2 * hidden, use_bias=self.bias1,
                             quant_dtype=self.weight_quant_dtype,
                             dtype=self.dtype, name="fc1")
        else:
            fc1 = nn.Dense(2 * hidden, use_bias=self.bias1, dtype=self.dtype,
                           kernel_init=init, name="fc1")
        y = fc1(x)
        gate, up = jnp.split(y, 2, axis=-1)
        if self.activation == "silu":
            y = swiglu(gate, up)
        else:
            y = geglu(gate, up)
        return RowParallelDense(out_features, use_bias=self.bias2,
                                tp_axis=self.tp_axis,
                                sequence_parallel=self.sequence_parallel,
                                dtype=self.dtype,
                                quant_dtype=self.weight_quant_dtype,
                                name="fc2")(y)
