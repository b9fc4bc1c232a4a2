"""Tensor-parallel parameter sharding for the GPT skeleton.

≙ reference D2: Megatron-style TP. The reference builds per-rank weights in
ParallelMHA/ParallelMLP and ships checkpoint shard/merge helpers
(shard_state_dict_tp models/gpt.py:507, combine_state_dicts_tp :583). Here:

  * parameters stay ONE logical (global) pytree placed with NamedSharding —
    XLA keeps each rank's shard on its chip;
  * packed projections (Wqkv = [q;k;v], gated fc1 = [gate;up]) are
    **repacked rank-major** so contiguous GSPMD chunks equal Megatron shards
    (each rank's chunk is its own [q_r;k_r;v_r]);
  * the forward runs inside shard_map with config.tensor_parallel_axis set:
    modules insert the psum/all-gather/reduce-scatter collectives
    (modules/linear.py, modules/embedding.py);
  * `param_specs` gives the PartitionSpec tree for placement and for pjit.

Sequence parallelism (D3) is config.sequence_parallel: activations between
blocks are sequence-sharded; embeddings emit scattered rows, column-parallel
inputs all-gather, row-parallel outputs reduce-scatter.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.gpt import GPTConfig

__all__ = [
    "local_config",
    "repack_qkv_kernel",
    "unpack_qkv_kernel",
    "shard_gpt_params",
    "combine_gpt_params",
    "gpt_param_specs",
]


def local_config(config: GPTConfig, tp: int, axis: str = "tp",
                 sequence_parallel: bool = False) -> GPTConfig:
    """Per-rank config: heads/intermediate/vocab divided by tp
    (≙ ParallelMHA 'heads divided by world size', mha.py:585-594)."""
    h = config.num_attention_heads
    hk = config.num_attention_heads_kv or h
    assert h % tp == 0 and hk % tp == 0, (h, hk, tp)
    inner = config.intermediate_size or 4 * config.hidden_size
    assert inner % tp == 0
    assert config.padded_vocab_size % tp == 0, (
        "pad vocab to a multiple of tp (pad_vocab_size_multiple)"
    )
    return dataclasses.replace(
        config,
        num_attention_heads=h // tp,
        num_attention_heads_kv=hk // tp,
        head_dim=config.head_dim or config.hidden_size // h,
        intermediate_size=inner // tp,
        vocab_size=config.padded_vocab_size // tp,
        pad_vocab_size_multiple=1,
        tensor_parallel_axis=axis,
        sequence_parallel=sequence_parallel,
    )


def repack_qkv_kernel(kernel, h, hk, d, tp):
    """[q;k;v] columns -> rank-major [q_0;k_0;v_0;q_1;...] so a contiguous
    tp-way chunking yields Megatron shards."""
    q, k, v = jnp.split(kernel, [h * d, (h + hk) * d], axis=-1)
    qs = jnp.split(q, tp, axis=-1)
    ks = jnp.split(k, tp, axis=-1)
    vs = jnp.split(v, tp, axis=-1)
    return jnp.concatenate(
        [jnp.concatenate([qs[r], ks[r], vs[r]], axis=-1) for r in range(tp)],
        axis=-1,
    )


def unpack_qkv_kernel(kernel, h, hk, d, tp):
    """Inverse of repack_qkv_kernel (≙ combine_state_dicts_tp)."""
    per = (h + 2 * hk) * d // tp
    chunks = jnp.split(kernel, tp, axis=-1)
    qs, ks, vs = [], [], []
    for c in chunks:
        q, k, v = jnp.split(c, [h * d // tp, (h + hk) * d // tp], axis=-1)
        qs.append(q)
        ks.append(k)
        vs.append(v)
    return jnp.concatenate(qs + ks + vs, axis=-1)


def _repack_gated_fc1(kernel, tp):
    g, u = jnp.split(kernel, 2, axis=-1)
    gs = jnp.split(g, tp, axis=-1)
    us = jnp.split(u, tp, axis=-1)
    return jnp.concatenate(
        [jnp.concatenate([gs[r], us[r]], axis=-1) for r in range(tp)], axis=-1
    )


def _unpack_gated_fc1(kernel, tp):
    chunks = jnp.split(kernel, tp, axis=-1)
    gs, us = [], []
    for c in chunks:
        g, u = jnp.split(c, 2, axis=-1)
        gs.append(g)
        us.append(u)
    return jnp.concatenate(gs + us, axis=-1)


def gpt_param_specs(params: Dict[str, Any], axis: str = "tp") -> Dict[str, Any]:
    """PartitionSpec tree matching shard_gpt_params' repacked layout."""

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        name = keys[-1]
        parent = keys[-2] if len(keys) > 1 else ""
        if parent in ("wte", "word_embeddings"):
            return P(axis, None)
        if parent == "position_embeddings" or parent == "project_in":
            return P(*([None] * leaf.ndim))
        if parent in ("Wqkv", "Wq", "Wkv", "fc1", "lm_head"):
            return P(None, axis) if name == "kernel" else P(axis)
        if parent in ("out_proj", "fc2"):
            return P(axis, None) if name == "kernel" else P(None)
        return P(*([None] * leaf.ndim))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_gpt_params(params: Dict[str, Any], config: GPTConfig, tp: int,
                     mesh: Optional[Mesh] = None, axis: str = "tp"):
    """Repack packed projections rank-major and (optionally) place on mesh.

    ≙ shard_state_dict_tp (gpt.py:507) except the result is still the single
    global pytree — placement (NamedSharding) does the sharding.
    Returns (params, specs).
    """
    h = config.num_attention_heads
    hk = config.num_attention_heads_kv or h
    d = config.head_dim or config.hidden_size // h
    gated = config.activation_function in ("swiglu", "geglu")

    def walk(tree):
        out = {}
        for key, val in tree.items():
            if key == "mixer" and "Wqkv" in val:
                new = dict(val)
                wqkv = dict(val["Wqkv"])
                wqkv["kernel"] = repack_qkv_kernel(wqkv["kernel"], h, hk, d, tp)
                if "bias" in wqkv:
                    wqkv["bias"] = repack_qkv_kernel(
                        wqkv["bias"][None], h, hk, d, tp
                    )[0]
                new["Wqkv"] = wqkv
                out[key] = new
            elif key == "mlp" and gated and "fc1" in val:
                new = dict(val)
                fc1 = dict(val["fc1"])
                fc1["kernel"] = _repack_gated_fc1(fc1["kernel"], tp)
                if "bias" in fc1:
                    fc1["bias"] = _repack_gated_fc1(fc1["bias"][None], tp)[0]
                new["fc1"] = fc1
                out[key] = new
            elif isinstance(val, dict):
                out[key] = walk(val)
            else:
                out[key] = val
        return out

    params = {"params": walk(params["params"])}
    specs = gpt_param_specs(params, axis)
    if mesh is not None:
        params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params, specs,
        )
    return params, specs


def combine_gpt_params(params: Dict[str, Any], config: GPTConfig, tp: int):
    """Inverse repack: rank-major packed projections back to [q;k;v] /
    [gate;up] order (≙ combine_state_dicts_tp, gpt.py:583)."""
    h = config.num_attention_heads
    hk = config.num_attention_heads_kv or h
    d = config.head_dim or config.hidden_size // h
    gated = config.activation_function in ("swiglu", "geglu")

    def walk(tree):
        out = {}
        for key, val in tree.items():
            if key == "mixer" and "Wqkv" in val:
                new = dict(val)
                wqkv = dict(val["Wqkv"])
                wqkv["kernel"] = unpack_qkv_kernel(wqkv["kernel"], h, hk, d, tp)
                if "bias" in wqkv:
                    wqkv["bias"] = unpack_qkv_kernel(
                        wqkv["bias"][None], h, hk, d, tp
                    )[0]
                new["Wqkv"] = wqkv
                out[key] = new
            elif key == "mlp" and gated and "fc1" in val:
                new = dict(val)
                fc1 = dict(val["fc1"])
                fc1["kernel"] = _unpack_gated_fc1(fc1["kernel"], tp)
                if "bias" in fc1:
                    fc1["bias"] = _unpack_gated_fc1(fc1["bias"][None], tp)[0]
                new["fc1"] = fc1
                out[key] = new
            elif isinstance(val, dict):
                out[key] = walk(val)
            else:
                out[key] = val
        return out

    return {"params": walk(params["params"])}
