"""Activation functions (≙ reference flash_attn/ops/activations.py).

The reference hand-writes autograd for sqrelu and fast-GELU variants because
torch eager would materialize intermediates; under XLA these fuse into the
surrounding matmuls automatically, so plain jnp expressions are already the
"fused" implementation. Kept as named functions for API parity.
"""

import jax
import jax.numpy as jnp

__all__ = ["sqrelu_fwd", "sqrelu", "bias_gelu", "gelu_tanh", "swiglu", "geglu"]


def sqrelu(x):
    r = jax.nn.relu(x)
    return r * r


sqrelu_fwd = sqrelu


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def bias_gelu(y, bias):
    return gelu_tanh(y + bias)


def swiglu(gate, up):
    return jax.nn.silu(gate) * up


def geglu(gate, up):
    return gelu_tanh(gate) * up
