"""Autograd-wrapped collectives (≙ reference flash_attn/utils/distributed.py
:18-99 — NCCL all_gather/reduce_scatter/all_reduce with hand-written
autograd). On TPU these wrap XLA collectives inside shard_map with explicit
custom VJPs, forming the four Megatron conjugate operators:

    copy_to_tp_region        f: identity fwd        / all-reduce bwd
    reduce_from_tp_region    g: all-reduce fwd      / identity bwd
    gather_from_sp_region       all-gather fwd      / reduce-scatter bwd
    scatter_to_sp_region        reduce-scatter fwd  / all-gather bwd

Explicit VJPs keep the gradients exact regardless of shard_map's replication
checking and guarantee one collective per direction.
"""

from __future__ import annotations

import functools

import jax

__all__ = [
    "copy_to_tp_region",
    "reduce_from_tp_region",
    "gather_from_sp_region",
    "scatter_to_sp_region",
]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def copy_to_tp_region(x, axis: str):
    return x


copy_to_tp_region.defvjp(
    lambda x, axis: (x, None),
    lambda axis, _, g: (jax.lax.psum(g, axis),),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def reduce_from_tp_region(x, axis: str):
    return jax.lax.psum(x, axis)


reduce_from_tp_region.defvjp(
    lambda x, axis: (jax.lax.psum(x, axis), None),
    lambda axis, _, g: (g,),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def gather_from_sp_region(x, axis: str, dim: int = 1):
    return jax.lax.all_gather(x, axis, axis=dim, tiled=True)


gather_from_sp_region.defvjp(
    lambda x, axis, dim: (jax.lax.all_gather(x, axis, axis=dim, tiled=True), None),
    lambda axis, dim, _, g: (
        jax.lax.psum_scatter(g, axis, scatter_dimension=dim, tiled=True),
    ),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def scatter_to_sp_region(x, axis: str, dim: int = 1):
    return jax.lax.psum_scatter(x, axis, scatter_dimension=dim, tiled=True)


scatter_to_sp_region.defvjp(
    lambda x, axis, dim: (
        jax.lax.psum_scatter(x, axis, scatter_dimension=dim, tiled=True), None
    ),
    lambda axis, dim, _, g: (
        jax.lax.all_gather(g, axis, axis=dim, tiled=True),
    ),
)
