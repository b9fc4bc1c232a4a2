"""Multi-head attention module (≙ reference flash_attn/modules/mha.py:343).

flax.linen re-design: the torch ``MHA``'s in-place KV-cache mutation
(`_update_kv_cache`, mha.py:255-306) becomes a functional cache — the module
takes this layer's (k_cache, v_cache, offset) and returns the updated arrays;
the generation loop threads them through jit. Tensor parallelism is *not* a
separate module (reference ParallelMHA, mha.py:564): the same module runs
under pjit/GSPMD with the Wqkv kernel sharded column-wise and out_proj
row-wise — see parallel/tp.py for the PartitionSpec rules; head-count
divisibility is the only requirement.

Decode fast path (≙ ft_attention single_query_attention, K14): when the
query is a single step, attention runs against the cache with
length-masking; rotary is applied at the cache offset.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import functools

from ..layers.rotary import RotaryEmbedding
from ..ops.flash_attention import flash_attention
from ..ops.decode import decode_attention
from .linear import RowParallelDense, gather_sp_input


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _split_qkv(qkv, h: int, hk: int, d: int):
    """Slice the packed (b, s, (h+2hk)*d) projection into q/k/v heads.

    The custom backward concatenates dq/dk/dv into ONE materialized dqkv
    (optimization_barrier): without it XLA fuses the concat — and the
    attention kernel's layout transposes behind it — into the operand
    reads of BOTH Wqkv backward matmuls, which then run at ~109 TF/s vs
    ~190 clean (measured on the gpt2m training step,
    benchmarks/profile_training.py)."""
    b, s, _ = qkv.shape
    q = qkv[..., : h * d].reshape(b, s, h, d)
    k = qkv[..., h * d : (h + hk) * d].reshape(b, s, hk, d)
    v = qkv[..., (h + hk) * d :].reshape(b, s, hk, d)
    return q, k, v


def _split_qkv_fwd(qkv, h, hk, d):
    return _split_qkv(qkv, h, hk, d), qkv.shape


def _split_qkv_bwd(h, hk, d, shape, grads):
    dq, dk, dv = grads
    b, s, _ = shape
    dqkv = jnp.concatenate(
        [dq.reshape(b, s, h * d), dk.reshape(b, s, hk * d),
         dv.reshape(b, s, hk * d)], axis=-1)
    return (jax.lax.optimization_barrier(dqkv),)


_split_qkv.defvjp(_split_qkv_fwd, _split_qkv_bwd)


class MHA(nn.Module):
    embed_dim: int
    num_heads: int
    num_heads_kv: Optional[int] = None
    head_dim: Optional[int] = None
    cross_attn: bool = False
    qkv_proj_bias: bool = True
    out_proj_bias: bool = True
    dropout: float = 0.0
    softmax_scale: Optional[float] = None
    causal: bool = False
    window_size: Tuple[int, int] = (-1, -1)
    softcap: float = 0.0
    rotary_emb_dim: int = 0
    rotary_emb_base: float = 10000.0
    rotary_emb_scale_base: Optional[float] = None
    rotary_emb_interleaved: bool = False
    tp_axis: Optional[str] = None       # inside shard_map: Megatron TP
    sequence_parallel: bool = False
    dtype: jnp.dtype = jnp.float32
    # weight-only quantized projections (int8/int4; serving path)
    weight_quant_dtype: Optional[jnp.dtype] = None
    # causal depthwise conv on q/k/v after projection (≙ reference
    # MHA dwconv option: Conv1d(k=3, groups=dim) + [..., :-2])
    dwconv: bool = False
    # inside shard_map with the sequence sharded on this axis: ring
    # attention (context parallelism — new cross-chip long-context design)
    context_parallel_axis: Optional[str] = None
    # balanced llama3-style causal ring layout; the caller feeds
    # zigzag_shard-permuted tokens + position ids (parallel/ring.py)
    context_parallel_zigzag: bool = False

    def setup(self):
        from .linear import QuantDense

        h = self.num_heads
        hk = self.num_heads_kv if self.num_heads_kv is not None else h
        assert h % hk == 0
        d = self.head_dim if self.head_dim is not None else self.embed_dim // h
        self._h, self._hk, self._d = h, hk, d
        init = nn.initializers.normal(stddev=0.02)
        if not self.cross_attn:
            if self.weight_quant_dtype is not None:
                self.Wqkv = QuantDense(
                    (h + 2 * hk) * d, use_bias=self.qkv_proj_bias,
                    quant_dtype=self.weight_quant_dtype, dtype=self.dtype,
                    name="Wqkv",
                )
            else:
                self.Wqkv = nn.Dense(
                    (h + 2 * hk) * d, use_bias=self.qkv_proj_bias,
                    dtype=self.dtype, kernel_init=init, name="Wqkv",
                )
        else:
            self.Wq = nn.Dense(h * d, use_bias=self.qkv_proj_bias,
                               dtype=self.dtype, kernel_init=init, name="Wq")
            self.Wkv = nn.Dense(2 * hk * d, use_bias=self.qkv_proj_bias,
                                dtype=self.dtype, kernel_init=init, name="Wkv")
        self.out_proj = RowParallelDense(
            self.embed_dim, use_bias=self.out_proj_bias,
            tp_axis=self.tp_axis, sequence_parallel=self.sequence_parallel,
            dtype=self.dtype, quant_dtype=self.weight_quant_dtype,
            name="out_proj",
        )
        if self.rotary_emb_dim > 0:
            self.rotary = RotaryEmbedding(
                self.rotary_emb_dim, base=self.rotary_emb_base,
                interleaved=self.rotary_emb_interleaved,
                scale_base=self.rotary_emb_scale_base,
            )
        if self.dwconv and not self.cross_attn:
            self.dwconv_qkv = nn.Conv(
                (h + 2 * hk) * d, kernel_size=(3,), padding="VALID",
                feature_group_count=(h + 2 * hk) * d, dtype=self.dtype,
                name="dwconv_qkv",
            )

    def __call__(
        self,
        x: jax.Array,
        x_kv: Optional[jax.Array] = None,
        *,
        q_segment_ids: Optional[jax.Array] = None,
        kv_segment_ids: Optional[jax.Array] = None,
        kv_cache: Optional[Tuple[jax.Array, jax.Array]] = None,
        seqlen_offset=0,
        deterministic: bool = True,
        dropout_seed=None,
    ):
        """x: (batch, seqlen, embed_dim). Returns (out, new_kv_cache).

        kv_cache: (k_cache, v_cache) each (batch, hk, max_seqlen, d) — the
        head-major layout feeds the decode kernel contiguous (seq, d) tiles
        (≙ the FT packed cache layout idea, reference mha.py:414-428); new
        K/V are written at seqlen_offset and attention runs against the
        valid prefix (prompt-vs-decode switch ≙ mha.py:497-515).
        """
        x = gather_sp_input(x, self.tp_axis, self.sequence_parallel)
        b, sq, _ = x.shape
        h, hk, d = self._h, self._hk, self._d
        if not self.cross_attn:
            qkv = self.Wqkv(x)
            if self.dwconv:
                qkv = self.dwconv_qkv(
                    jnp.pad(qkv, ((0, 0), (2, 0), (0, 0)))
                )  # causal k=3 depthwise (left pad ≙ reference [..., :-2])
            if (kv_cache is None and self.rotary_emb_dim == 0
                    and self.context_parallel_axis is None
                    and q_segment_ids is None and kv_segment_ids is None
                    and h == hk):
                from ..ops.flash_attention.fused_heads import (
                    packed_heads_supported, packed_qkv_attention,
                )
                if packed_heads_supported(
                        (b, sq, h, d), (b, sq, hk, d), causal=self.causal,
                        window_size=self.window_size, softcap=self.softcap):
                    # training hot path: attention DIRECTLY on the packed
                    # projection output — no q/k/v slice copies, no layout
                    # transposes, and the backward emits one packed dqkv
                    # the Wqkv backward consumes as-is (fused_heads.py)
                    dropout_p = 0.0 if deterministic else self.dropout
                    if dropout_p > 0.0 and dropout_seed is None:
                        dropout_seed = jax.random.randint(
                            self.make_rng("dropout"), (), 0, 2**31 - 1
                        )
                    out = packed_qkv_attention(
                        qkv, num_heads=h, num_heads_kv=hk, head_dim=d,
                        softmax_scale=self.softmax_scale,
                        causal=self.causal, softcap=self.softcap,
                        dropout_p=dropout_p, dropout_seed=dropout_seed,
                    )
                    return self.out_proj(out), None
            q, k, v = _split_qkv(qkv, h, hk, d)
        else:
            q = self.Wq(x).reshape(b, sq, h, d)
            kv_in = x_kv if x_kv is not None else x
            kv = self.Wkv(kv_in).reshape(b, -1, 2, hk, d)
            k, v = kv[:, :, 0], kv[:, :, 1]

        from ..inference.paged import PagedKVCache

        paged = isinstance(kv_cache, PagedKVCache)
        zz_cp = (self.context_parallel_zigzag
                 and self.context_parallel_axis is not None
                 and kv_cache is None)
        if self.rotary_emb_dim > 0:
            cos, sin, cos_k, sin_k = self.rotary.cos_sin(
                sq, q.dtype,
                offset=seqlen_offset if isinstance(seqlen_offset, int) else 0,
            )
            if zz_cp:
                # zigzag context parallelism: this shard's tokens sit at
                # two disjoint global chunks — rebuild rotary tables at
                # the zigzag positions (the ring kernel masks by the same
                # positions; a contiguous offset would rotate K against
                # the wrong phases)
                n_cp = jax.lax.psum(1, self.context_parallel_axis)
                me = jax.lax.axis_index(self.context_parallel_axis)
                half = sq // 2
                a = jnp.arange(half, dtype=jnp.int32)
                idx = jnp.concatenate(
                    [me * half + a, (2 * n_cp - 1 - me) * half + a])
                cos_full, sin_full, _, _ = self.rotary.cos_sin(
                    sq * n_cp, q.dtype,
                )
                cos = jnp.take(cos_full, idx, axis=0)
                sin = jnp.take(sin_full, idx, axis=0)
            elif not isinstance(seqlen_offset, int):
                # traced offset (decode / context-parallel shards): rebuild
                # at absolute positions; a (b,) offset vector (ragged
                # continuous batching) yields per-sample (b, sq, ro/2)
                # tables, broadcast over heads
                if paged:
                    max_pos = kv_cache.page_table.shape[1] * kv_cache.page_size
                elif kv_cache is not None:
                    max_pos = kv_cache[0].shape[2]
                elif self.context_parallel_axis is not None:
                    # global sequence length across the cp shards
                    max_pos = sq * jax.lax.psum(1, self.context_parallel_axis)
                else:
                    max_pos = sq
                cos_full, sin_full, _, _ = self.rotary.cos_sin(
                    max_pos, q.dtype,
                )
                off = jnp.asarray(seqlen_offset)
                if off.ndim == 1:
                    idx = off[:, None] + jnp.arange(sq)
                else:
                    idx = off + jnp.arange(sq)
                cos = jnp.take(cos_full, idx, axis=0)
                sin = jnp.take(sin_full, idx, axis=0)
            from ..layers.rotary import apply_rotary_emb
            q = apply_rotary_emb(q, cos, sin, self.rotary_emb_interleaved)
            k = apply_rotary_emb(k, cos, sin, self.rotary_emb_interleaved)

        dropout_p = 0.0 if deterministic else self.dropout
        if dropout_p > 0.0 and dropout_seed is None:
            dropout_seed = jax.random.randint(
                self.make_rng("dropout"), (), 0, 2**31 - 1
            )

        new_cache = None
        if paged:
            # decode (sq == 1) or chunked prefill (sq > 1, uniform chunks)
            # against a paged cache (≙ FA3 paged-KV + append-KV,
            # flash_api.h:100-150 and paged_kv.h prefill)
            from ..inference.paged import append_paged_kv, paged_flash_decode

            cache = append_paged_kv(
                kv_cache, jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
            )
            out = paged_flash_decode(
                q, cache,
                softmax_scale=self.softmax_scale or d ** -0.5,
                window_size=self.window_size,
                softcap=self.softcap,
            )
            out = self.out_proj(out.reshape(b, sq, h * d))
            return out, cache
        if kv_cache is not None:
            from ..ops.quant import QuantizedKV, quantize_kv

            k_cache, v_cache = kv_cache
            idx = _as_idx(seqlen_offset)
            if isinstance(k_cache, QuantizedKV):
                kq = quantize_kv(jnp.swapaxes(k, 1, 2), k_cache.values.dtype)
                vq = quantize_kv(jnp.swapaxes(v, 1, 2), v_cache.values.dtype)
                k_cache = QuantizedKV(
                    jax.lax.dynamic_update_slice(
                        k_cache.values, kq.values, (0, 0, idx, 0)),
                    jax.lax.dynamic_update_slice(
                        k_cache.scales, kq.scales, (0, 0, idx, 0)),
                )
                v_cache = QuantizedKV(
                    jax.lax.dynamic_update_slice(
                        v_cache.values, vq.values, (0, 0, idx, 0)),
                    jax.lax.dynamic_update_slice(
                        v_cache.scales, vq.scales, (0, 0, idx, 0)),
                )
            else:
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, jnp.swapaxes(k, 1, 2).astype(k_cache.dtype),
                    (0, 0, idx, 0),
                )
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, jnp.swapaxes(v, 1, 2).astype(v_cache.dtype),
                    (0, 0, idx, 0),
                )
            new_cache = (k_cache, v_cache)
            length = _as_idx(seqlen_offset) + sq
            if isinstance(seqlen_offset, int) and seqlen_offset == 0:
                # prefill: attend the freshly projected K/V, standard causal
                out = self._attend(q, k, v, dropout_p, dropout_seed,
                                   q_segment_ids, kv_segment_ids)
            else:
                # decode: length-masked attention against the full cache
                out = decode_attention(
                    q, k_cache, v_cache,
                    lengths=jnp.full((b,), length, jnp.int32)
                    if jnp.ndim(length) == 0 else length,
                    softmax_scale=self.softmax_scale or d ** -0.5,
                    window_size=self.window_size,
                    softcap=self.softcap,
                )
        else:
            out = self._attend(q, k, v, dropout_p, dropout_seed,
                               q_segment_ids, kv_segment_ids)
        out = self.out_proj(out.reshape(b, sq, h * d))
        return out, new_cache

    def _attend(self, q, k, v, dropout_p, dropout_seed, q_seg, kv_seg):
        b, sq, h, d = q.shape
        if self.context_parallel_axis is None:
            from ..ops.flash_attention.fused_heads import (
                packed_heads_attention, packed_heads_supported,
            )
            if (q_seg is None and kv_seg is None
                    and packed_heads_supported(
                        q.shape, k.shape, causal=self.causal,
                        window_size=self.window_size,
                        softcap=self.softcap)):
                # training hot path: packed projection-layout kernel — no
                # (b,s,h,d)<->(b,h,s,d) transposes in fwd or bwd
                return packed_heads_attention(
                    q, k, v, softmax_scale=self.softmax_scale,
                    causal=self.causal, softcap=self.softcap,
                    dropout_p=dropout_p, dropout_seed=dropout_seed,
                )
        qt = jnp.swapaxes(q, 1, 2)
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        if self.context_parallel_axis is not None:
            # sequence sharded over the cp mesh axis: ring attention
            # (parallel/ring.py; new cross-chip design, SURVEY D5)
            from ..parallel.ring import ring_flash_attention

            out = ring_flash_attention(
                qt, kt, vt, self.context_parallel_axis, self.causal,
                self.softmax_scale, self.softcap,
                self.context_parallel_zigzag,
            )
            return jnp.swapaxes(out, 1, 2)
        out = flash_attention(
            qt, kt, vt, None, q_seg, kv_seg,
            softmax_scale=self.softmax_scale,
            causal=self.causal,
            window_size=self.window_size,
            softcap=self.softcap,
            dropout_p=dropout_p,
            dropout_seed=dropout_seed,
        )
        return jnp.swapaxes(out, 1, 2)


def _as_idx(x):
    return x if isinstance(x, int) else x.astype(jnp.int32)
