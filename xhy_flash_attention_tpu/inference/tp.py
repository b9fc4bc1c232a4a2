"""Tensor-parallel serving: wrap a TP-sharded model as an engine-compatible
``model_apply``.

≙ the reference's multi-GPU generation path
(flash_attn/utils/generation.py decode with process groups +
tests/models/test_gpt_generation_parallel.py): attention heads, MLP shards
and every KV cache (contiguous scratch or paged) are sharded over the `tp`
mesh axis; logits come back vocab-concatenated so the engine's host-side
sampler is unchanged. The InferenceEngine is cache-structure-agnostic, so
the same wrapper serves its batched prefill (dense scratch caches) and its
continuous-batching decode (PagedKVCache) — multi-chip continuous batching
with one line at engine construction:

    engine = InferenceEngine(tp_model_apply(local_model, specs, mesh,
                                            vocab_size), params_tp, ...)
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from .paged import PagedKVCache

__all__ = ["tp_model_apply"]


def _cache_specs(caches, axis: str):
    """PartitionSpec pytree sharding every cache's KV-head dim over `axis`."""
    def one(c):
        if isinstance(c, PagedKVCache):
            return PagedKVCache(
                kv_pages=P(None, axis, None, None, None),
                page_table=P(), lengths=P(),
                kv_scales=(P(None, axis, None, None)
                           if c.kv_scales is not None else None),
            )
        k_c, v_c = c
        from ..ops.quant import QuantizedKV

        if isinstance(k_c, QuantizedKV):
            qs = QuantizedKV(P(None, axis, None, None),
                             P(None, axis, None, None))
            return (qs, qs)
        return (P(None, axis, None, None), P(None, axis, None, None))

    return [one(c) for c in caches]


def tp_model_apply(model_local, param_specs, mesh, vocab_size: int,
                   axis: str = "tp"):
    """Build an engine-compatible ``model_apply`` running `model_local`
    (a GPTLMHeadModel built from ``parallel.tp.local_config``) under
    shard_map on `mesh`, with params sharded by ``param_specs``
    (from ``parallel.tp.shard_gpt_params``).

    Returns fn(params, input_ids, kv_caches=..., seqlen_offset=...,
    segment_ids=None) -> (full-vocab logits, new kv_caches).
    """

    def apply_fn(params, input_ids, kv_caches=None, seqlen_offset=0,
                 segment_ids: Optional[Any] = None):
        cspecs = _cache_specs(kv_caches, axis)
        off = jnp.asarray(seqlen_offset, jnp.int32)

        if segment_ids is None:
            def local(p, ids, caches, off_):
                return model_local.apply(
                    p, ids, kv_caches=caches, seqlen_offset=off_
                )

            fn = shard_map(
                local, mesh=mesh,
                in_specs=(param_specs, P(), cspecs, P()),
                out_specs=(P(None, None, axis), cspecs),
                check_vma=False,
            )
            logits, new_caches = fn(params, input_ids, kv_caches, off)
        else:
            def local_seg(p, ids, caches, off_, seg):
                return model_local.apply(
                    p, ids, kv_caches=caches, seqlen_offset=off_,
                    segment_ids=seg,
                )

            fn = shard_map(
                local_seg, mesh=mesh,
                in_specs=(param_specs, P(), cspecs, P(), P()),
                out_specs=(P(None, None, axis), cspecs),
                check_vma=False,
            )
            logits, new_caches = fn(
                params, input_ids, kv_caches, off, segment_ids
            )
        # vocab-parallel lm_head emits shards concatenated by the out spec;
        # strip padding so the host sampler sees the true vocabulary
        return logits[..., :vocab_size], new_caches

    return apply_fn
