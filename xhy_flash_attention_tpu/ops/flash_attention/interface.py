"""Public flash-attention API — TPU-native equivalent of the reference's
``flash_attn/flash_attn_interface.py`` (six public functions :282-492).

Differences by design:
  * layout conversion (b, s, h, d) <-> kernel-native (b, h, s, d) happens
    here; models built on this package can call :func:`flash_attention`
    directly in kernel layout and skip the transposes;
  * ``torch.autograd.Function`` becomes ``jax.custom_vjp`` (one per static
    configuration, cached — the JIT plays the role of BOOL_SWITCH dispatch);
  * varlen is packed-sequence attention with segment ids derived from
    ``cu_seqlens`` (TPUs have no ragged grids) — see bert_padding;
  * dropout takes an explicit integer seed (stateless, reproducible) instead
    of torch's global RNG; fwd and bwd regenerate identical masks because
    they share tile sizes and per-block seeds;
  * everything is deterministic (no atomics), so there is no
    ``deterministic`` flag to pass — it is accepted and ignored for parity.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .common import BlockSizes, round_up
from .fwd import flash_attention_fwd
from .bwd import flash_attention_bwd
from ...layers.rotary import apply_rotary_emb

__all__ = [
    "flash_attention",
    "flash_attn_fp8_func",
    "flash_attn_with_kvcache",
    "flash_attn_func",
    "flash_attn_qkvpacked_func",
    "flash_attn_kvpacked_func",
    "flash_attn_varlen_func",
    "flash_attn_varlen_qkvpacked_func",
    "flash_attn_varlen_kvpacked_func",
]


class _Static(NamedTuple):
    sm_scale: float
    causal: bool
    window_size: Tuple[int, int]
    softcap: float
    dropout_p: float
    block_q: int
    block_k: int
    block_q_dkv: int
    block_k_dkv: int
    block_q_dq: int
    block_k_dq: int

    def fwd_blocks(self) -> BlockSizes:
        return BlockSizes(
            block_q=self.block_q, block_k=self.block_k,
            block_q_dkv=self.block_q_dkv, block_k_dkv=self.block_k_dkv,
            block_q_dq=self.block_q_dq, block_k_dq=self.block_k_dq,
        )


def _resolve_static(sm_scale, causal, window_size, softcap, dropout_p,
                    block_sizes: Optional[BlockSizes],
                    sq: int, sk: int, d: int) -> _Static:
    if block_sizes is None:
        block_sizes = BlockSizes.for_shape(sq, sk, d)
    bs = block_sizes
    # dropout uses a position-keyed counter RNG, so fwd/bwd tilings are free
    # to differ (≙ reference Philox counters).
    return _Static(
        sm_scale=float(sm_scale), causal=bool(causal),
        window_size=(int(window_size[0]), int(window_size[1])),
        softcap=float(softcap), dropout_p=float(dropout_p),
        block_q=bs.block_q, block_k=bs.block_k,
        block_q_dkv=bs.block_q_dkv, block_k_dkv=bs.block_k_dkv,
        block_q_dq=bs.block_q_dq, block_k_dq=bs.block_k_dq,
    )


@functools.lru_cache(maxsize=None)
def _make_attention_fn(static: _Static, return_lse: bool):
    kw = dict(
        sm_scale=static.sm_scale,
        causal=static.causal,
        window_size=static.window_size,
        softcap=static.softcap,
        dropout_p=static.dropout_p,
        block_sizes=static.fwd_blocks(),
    )

    @jax.custom_vjp
    def attn(q, k, v, bias, q_seg, kv_seg, qpos, kpos, seed):
        out, lse = flash_attention_fwd(
            q, k, v, bias, q_seg, kv_seg, dropout_seed=seed,
            q_positions=qpos, kv_positions=kpos, **kw
        )
        return (out, lse) if return_lse else out

    def attn_fwd(q, k, v, bias, q_seg, kv_seg, qpos, kpos, seed):
        out, lse = flash_attention_fwd(
            q, k, v, bias, q_seg, kv_seg, dropout_seed=seed,
            q_positions=qpos, kv_positions=kpos, **kw
        )
        # named for remat policies: with GPTConfig.remat_policy =
        # "save_attn" (jax save_only_these_names), the backward reuses
        # these residuals instead of re-running the forward kernel —
        # remat then skips exactly the most expensive recompute
        from jax.ad_checkpoint import checkpoint_name

        out = checkpoint_name(out, "attn_out")
        lse = checkpoint_name(lse, "attn_lse")
        res = (q, k, v, bias, q_seg, kv_seg, qpos, kpos, seed, out, lse)
        return ((out, lse) if return_lse else out), res

    def attn_bwd(res, g):
        q, k, v, bias, q_seg, kv_seg, qpos, kpos, seed, out, lse = res
        do = g[0] if return_lse else g
        dq, dk, dv, dbias = flash_attention_bwd(
            q, k, v, out, lse, do, bias, q_seg, kv_seg,
            dropout_seed=seed, q_positions=qpos, kv_positions=kpos, **kw
        )
        if dbias is not None:
            dbias = dbias.reshape(bias.shape)
        return dq, dk, dv, dbias, None, None, None, None, None

    attn.defvjp(attn_fwd, attn_bwd)
    return attn


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    *,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    dropout_p: float = 0.0,
    dropout_seed=None,
    block_sizes: Optional[BlockSizes] = None,
    return_lse: bool = False,
    q_positions: Optional[jax.Array] = None,
    kv_positions: Optional[jax.Array] = None,
):
    """Kernel-layout flash attention: q (b, h, sq, d), k/v (b, hk, sk, d).

    Differentiable in q, k, v, bias. Returns out (b, h, sq, d) and, when
    ``return_lse``, the fp32 logsumexp (b, h, sq).

    q_positions/kv_positions ((b, sq)/(b, sk) int32): when given, keys are
    additionally masked to ``kpos <= qpos`` — the decoupled causal mask used
    by ring attention (shard offsets) and varlen causal with different q/k
    packings (per-sequence bottom-right alignment, ≙ the reference's
    BlockInfo seqlen handling in csrc/flash_attn/src/block_info.h).
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    static = _resolve_static(
        softmax_scale, causal, window_size, softcap, dropout_p,
        block_sizes, sq, sk, d,
    )
    if dropout_p > 0.0 and dropout_seed is None:
        raise ValueError("dropout_p > 0 requires dropout_seed")
    seed = None
    if dropout_seed is not None and dropout_p > 0.0:
        seed = jnp.asarray(dropout_seed, jnp.int32).reshape(())
    fn = _make_attention_fn(static, return_lse)
    return fn(q, k, v, bias, q_segment_ids, kv_segment_ids,
              q_positions, kv_positions, seed)


def _bshd_to_bhsd(x):
    return jnp.swapaxes(x, 1, 2)


def _attn_probs_debug(qt, kt, lse, *, softmax_scale, causal, window_size,
                      softcap, dropout_p, dropout_seed,
                      q_seg=None, k_seg=None, qpos=None, kpos=None):
    """S_dmask debug tensor (b, h, sq, sk): softmax probabilities
    recomputed from the saved LSE, with DROPPED entries negated — the
    reference's return_attn_probs S_dmask encoding (its dropout tests
    recover the mask as S >= 0, tests/test_flash_attn.py:218-301).

    Debug only: materializes the full O(sq*sk) matrix with plain XLA ops
    (the production kernels never do).
    """
    from .common import NEG_INF, dropout_keep_mask

    b, h, sq, d = qt.shape
    hk, sk = kt.shape[1], kt.shape[2]
    if hk != h:
        kt = jnp.repeat(kt, h // hk, axis=1)
    s = jnp.einsum(
        "bhsd,bhtd->bhst", qt.astype(jnp.float32), kt.astype(jnp.float32)
    ) * softmax_scale
    if softcap > 0.0:
        s = jnp.tanh(s / softcap) * softcap
    if causal:
        window_size = (window_size[0], 0)
    if qpos is not None:
        qp = qpos[:, None, :, None].astype(jnp.int32)
        kp = kpos[:, None, None, :].astype(jnp.int32)
        if window_size[1] >= 0:
            s = jnp.where(kp <= qp + window_size[1], s, NEG_INF)
        if window_size[0] >= 0:
            s = jnp.where(kp >= qp - window_size[0], s, NEG_INF)
    else:
        rows = jnp.arange(sq, dtype=jnp.int32)[:, None]
        cols = jnp.arange(sk, dtype=jnp.int32)[None, :]
        offset = sk - sq
        if window_size[1] >= 0:
            s = jnp.where(cols <= rows + offset + window_size[1], s, NEG_INF)
        if window_size[0] >= 0:
            s = jnp.where(cols >= rows + offset - window_size[0], s, NEG_INF)
    if q_seg is not None:
        s = jnp.where(
            q_seg[:, None, :, None] == k_seg[:, None, None, :], s, NEG_INF
        )
    p = jnp.exp(s - lse[..., None])  # lse = +inf on empty rows -> p = 0
    if dropout_p > 0.0:
        rows = jnp.arange(sq, dtype=jnp.int32)[:, None]
        cols = jnp.arange(sk, dtype=jnp.int32)[None, :]
        salts = (jnp.arange(b, dtype=jnp.int32)[:, None] * h
                 + jnp.arange(h, dtype=jnp.int32)[None, :])
        seed = jnp.asarray(dropout_seed, jnp.int32).reshape(())
        keep = jax.vmap(jax.vmap(
            lambda salt: dropout_keep_mask(seed, salt, rows, cols, dropout_p)
        ))(salts)
        p = jnp.where(keep, p, -p)
    return p


def flash_attn_func(
    q, k, v,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    return_attn_probs: bool = False,
    deterministic: bool = True,  # always deterministic on TPU; accepted for parity
    dropout_seed=None,
    block_sizes: Optional[BlockSizes] = None,
):
    """≙ reference flash_attn_func (flash_attn_interface.py:345).

    q: (batch, seqlen_q, nheads, head_dim); k/v: (batch, seqlen_k, nheads_k,
    head_dim). Returns out in the same layout; with ``return_attn_probs``
    returns (out, softmax_lse, S_dmask) where S_dmask (b, h, sq, sk) holds
    the softmax probabilities with dropped entries negated (≙ the
    reference's encoding — recover the keep mask as S_dmask >= 0). Debug
    only: S_dmask is recomputed with plain XLA ops and materializes the
    full score matrix.
    """
    # Layout note: the kernel consumes (b, h, s, d). A strided-block
    # "native (b, s, h, d)" forward was built and measured SLOWER than
    # these transposes on the causal headline (112 vs 118.5 TFLOP/s —
    # Mosaic's strided q/out DMA costs more than two full-bandwidth
    # transposes), so the transpose path stays.
    del deterministic
    qt, kt, vt = map(_bshd_to_bhsd, (q, k, v))
    res = flash_attention(
        qt, kt, vt,
        softmax_scale=softmax_scale, causal=causal, window_size=window_size,
        softcap=softcap, dropout_p=dropout_p, dropout_seed=dropout_seed,
        block_sizes=block_sizes, return_lse=return_attn_probs,
    )
    if return_attn_probs:
        out, lse = res
        scale = softmax_scale if softmax_scale is not None \
            else 1.0 / math.sqrt(q.shape[-1])
        s_dmask = _attn_probs_debug(
            qt, kt, lse, softmax_scale=scale, causal=causal,
            window_size=window_size, softcap=softcap, dropout_p=dropout_p,
            dropout_seed=dropout_seed,
        )
        return _bshd_to_bhsd(out), lse, s_dmask
    return _bshd_to_bhsd(res)


def flash_attn_fp8_func(
    q, k, v,
    q_descale: Optional[jax.Array] = None,
    k_descale: Optional[jax.Array] = None,
    v_descale: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    return_lse: bool = False,
):
    """FP8 (e4m3) prefill/training attention forward with per-head descale
    — ≙ the reference FA3 fp8 forward (csrc/flash_attn_v3/flash_api.h:69-78,
    mainloop mainloop_fwd_sm90_tma_gmma_ws.hpp).

    q: (batch, seqlen_q, nheads, head_dim) float8_e4m3fn; k/v: (batch,
    seqlen_k, nheads_k, head_dim) float8_e4m3fn. q_descale/k_descale/
    v_descale: optional (batch, nheads_k) fp32 dequant scales (default 1.0);
    like the reference, q_descale is shared across each GQA group (FA3
    indexes it by `bidh / qhead_per_khead`). Returns out in bf16, plus the
    fp32 logsumexp (b, h, sq) of the DESCALED scores when ``return_lse``.

    Forward-only (the reference's fp8 path has no backward — FA3 bwd
    requires fp16/bf16) and no bias/dropout, matching FA3. On TPU the fp8
    payload halves HBM input traffic; dequant fuses into the kernel at the
    MXU input (v5e converts on the VPU; v6e+ natively).
    """
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(q.shape[-1])
    qt, kt, vt = map(_bshd_to_bhsd, (q, k, v))
    sq, sk, d = qt.shape[2], kt.shape[2], qt.shape[3]
    out, lse = flash_attention_fwd(
        qt, kt, vt,
        sm_scale=float(softmax_scale), causal=causal,
        window_size=(int(window_size[0]), int(window_size[1])),
        softcap=float(softcap), need_lse=return_lse,
        block_sizes=BlockSizes.for_shape(sq, sk, d),
        q_descale=q_descale, k_descale=k_descale, v_descale=v_descale,
    )
    out = _bshd_to_bhsd(out)
    return (out, lse) if return_lse else out


def flash_attn_qkvpacked_func(qkv, dropout_p=0.0, softmax_scale=None,
                              causal=False, window_size=(-1, -1), softcap=0.0,
                              return_attn_probs=False, deterministic=True,
                              dropout_seed=None):
    """≙ flash_attn_qkvpacked_func: qkv (batch, seqlen, 3, nheads, head_dim)."""
    assert qkv.ndim == 5 and qkv.shape[2] == 3, qkv.shape
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    return flash_attn_func(
        q, k, v, dropout_p=dropout_p, softmax_scale=softmax_scale,
        causal=causal, window_size=window_size, softcap=softcap,
        return_attn_probs=return_attn_probs, deterministic=deterministic,
        dropout_seed=dropout_seed,
    )


def flash_attn_kvpacked_func(q, kv, dropout_p=0.0, softmax_scale=None,
                             causal=False, window_size=(-1, -1), softcap=0.0,
                             return_attn_probs=False, deterministic=True,
                             dropout_seed=None):
    """≙ flash_attn_kvpacked_func: kv (batch, seqlen, 2, nheads_k, head_dim)."""
    assert kv.ndim == 5 and kv.shape[2] == 2, kv.shape
    k, v = kv[:, :, 0], kv[:, :, 1]
    return flash_attn_func(
        q, k, v, dropout_p=dropout_p, softmax_scale=softmax_scale,
        causal=causal, window_size=window_size, softcap=softcap,
        return_attn_probs=return_attn_probs, deterministic=deterministic,
        dropout_seed=dropout_seed,
    )


def _segment_ids_from_cu_seqlens(cu_seqlens: jax.Array, total: int) -> jax.Array:
    """seg[t] = 1 + index of the sequence containing token t (0 never used:
    every packed token belongs to a sequence; padding after cu_seqlens[-1]
    gets id batch+1 ... no — tokens past the last boundary get id = batch
    count + 1 via searchsorted, which never equals a q-side id of a different
    position only if both sides use the same cu_seqlens)."""
    positions = jnp.arange(total, dtype=jnp.int32)
    return jnp.searchsorted(
        cu_seqlens.astype(jnp.int32), positions, side="right"
    ).astype(jnp.int32)


def flash_attn_varlen_func(
    q, k, v,
    cu_seqlens_q, cu_seqlens_k,
    max_seqlen_q: int, max_seqlen_k: int,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    return_attn_probs: bool = False,
    deterministic: bool = True,
    dropout_seed=None,
    return_lse: bool = False,
):
    """≙ flash_attn_varlen_func (flash_attn_interface.py:454).
    ``return_lse`` returns (out, lse (h, total_q) fp32) without the
    O(total²) S_dmask debug tensor (the C API's varlen_fwd uses this,
    ≙ the softmax_lse_ptr output of capi/flash_attn.h:57).

    q: (total_q, nheads, head_dim) packed; cu_seqlens_q: (batch+1,) int32.
    On TPU varlen is packed attention with segment-id masking — the
    cu_seqlens/BlockInfo design of the reference maps to per-token segment
    ids plus per-block segment-range DMA/compute skip, so total work is
    ~sum(len_i * len_i), not total_q * total_k (SURVEY §7 "Varlen on TPU").

    Causal and sliding-window masks support *different* q/k packings
    (cu_seqlens_q != cu_seqlens_k): each sequence is bottom-right aligned —
    query at local index i attends keys with local index j <= i + (lk - lq)
    — exactly the reference's BlockInfo semantics
    (csrc/flash_attn/src/block_info.h). Implemented with per-token position
    arrays derived from cu_seqlens (the kernels' position-window path).
    """
    del max_seqlen_q, max_seqlen_k, deterministic
    total_q = q.shape[0]
    total_k = k.shape[0]
    cu_q = jnp.asarray(cu_seqlens_q, jnp.int32)
    cu_k = jnp.asarray(cu_seqlens_k, jnp.int32)
    q_seg = _segment_ids_from_cu_seqlens(cu_q, total_q)[None]
    k_seg = _segment_ids_from_cu_seqlens(cu_k, total_k)[None]
    qpos = kpos = None
    if causal or window_size[0] >= 0 or window_size[1] >= 0:
        # per-sequence local positions, bottom-right aligned: qpos = local_q
        # + (lk - lq) of the token's sequence, kpos = local_k. The position
        # mask only acts within a sequence (the segment mask kills
        # cross-sequence pairs regardless of positions).
        def local_pos(cu, total):
            t = jnp.arange(total, dtype=jnp.int32)
            seq = jnp.searchsorted(cu, t, side="right") - 1
            seq = jnp.clip(seq, 0, cu.shape[0] - 2)
            return t - cu[seq], seq
        lq_pos, q_seq = local_pos(cu_q, total_q)
        lk_pos, _ = local_pos(cu_k, total_k)
        seq_lens_q = cu_q[1:] - cu_q[:-1]
        seq_lens_k = cu_k[1:] - cu_k[:-1]
        off = (seq_lens_k - seq_lens_q)[q_seq]
        qpos = (lq_pos + off)[None]
        kpos = lk_pos[None]
    qt = jnp.swapaxes(q[None], 1, 2)  # (1, h, total_q, d)
    kt = jnp.swapaxes(k[None], 1, 2)
    vt = jnp.swapaxes(v[None], 1, 2)
    res = flash_attention(
        qt, kt, vt, None, q_seg, k_seg,
        softmax_scale=softmax_scale, causal=causal, window_size=window_size,
        softcap=softcap, dropout_p=dropout_p, dropout_seed=dropout_seed,
        return_lse=return_attn_probs or return_lse,
        q_positions=qpos, kv_positions=kpos,
    )
    if return_lse and not return_attn_probs:
        out, lse = res
        return jnp.swapaxes(out, 1, 2)[0], lse[0]
    if return_attn_probs:
        out, lse = res
        scale = softmax_scale if softmax_scale is not None \
            else 1.0 / math.sqrt(q.shape[-1])
        s_dmask = _attn_probs_debug(
            qt, kt, lse, softmax_scale=scale, causal=causal,
            window_size=window_size, softcap=softcap, dropout_p=dropout_p,
            dropout_seed=dropout_seed, q_seg=q_seg, k_seg=k_seg,
            qpos=qpos, kpos=kpos,
        )
        return jnp.swapaxes(out, 1, 2)[0], lse[0], s_dmask[0]
    return jnp.swapaxes(res, 1, 2)[0]


def flash_attn_varlen_qkvpacked_func(qkv, cu_seqlens, max_seqlen,
                                     dropout_p=0.0, softmax_scale=None,
                                     causal=False, window_size=(-1, -1),
                                     softcap=0.0, return_attn_probs=False,
                                     deterministic=True, dropout_seed=None):
    """qkv: (total, 3, nheads, head_dim)."""
    assert qkv.ndim == 4 and qkv.shape[1] == 3, qkv.shape
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    return flash_attn_varlen_func(
        q, k, v, cu_seqlens, cu_seqlens, max_seqlen, max_seqlen,
        dropout_p=dropout_p, softmax_scale=softmax_scale, causal=causal,
        window_size=window_size, softcap=softcap,
        return_attn_probs=return_attn_probs, deterministic=deterministic,
        dropout_seed=dropout_seed,
    )


def flash_attn_varlen_kvpacked_func(q, kv, cu_seqlens_q, cu_seqlens_k,
                                    max_seqlen_q, max_seqlen_k,
                                    dropout_p=0.0, softmax_scale=None,
                                    causal=False, window_size=(-1, -1),
                                    softcap=0.0, return_attn_probs=False,
                                    deterministic=True, dropout_seed=None):
    """kv: (total_k, 2, nheads_k, head_dim)."""
    assert kv.ndim == 4 and kv.shape[1] == 2, kv.shape
    k, v = kv[:, 0], kv[:, 1]
    return flash_attn_varlen_func(
        q, k, v, cu_seqlens_q, cu_seqlens_k, max_seqlen_q, max_seqlen_k,
        dropout_p=dropout_p, softmax_scale=softmax_scale, causal=causal,
        window_size=window_size, softcap=softcap,
        return_attn_probs=return_attn_probs, deterministic=deterministic,
        dropout_seed=dropout_seed,
    )


def flash_attn_with_kvcache(
    q,
    k_cache,
    v_cache,
    k=None,
    v=None,
    rotary_cos=None,
    rotary_sin=None,
    cache_seqlens=None,
    cache_batch_idx=None,
    cache_leftpad=None,
    softmax_scale=None,
    causal: bool = True,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    rotary_interleaved: bool = False,
    num_splits: int = 1,
):
    """Decode against a growing KV cache under the mainline-FA2 name —
    migration surface for ``flash_attn_with_kvcache`` users (the pinned
    reference exposes the same capabilities only through the FA3 C params,
    csrc/flash_attn_v3/flash_api.h:100-150: knew/vnew append, rotary,
    seqused_k, kv_batch_idx, leftpad_k, num_splits).

    q: (b, sq, h, d). k_cache/v_cache: (b, S, hk, d) dense arrays in the
    reference's cache layout, or this package's QuantizedKV pair (already
    (b, hk, S, d) + per-token scales). k/v: optional (b, sq, hk, d) new
    tokens appended at position ``cache_seqlens`` before attending.
    rotary_cos/sin: (max_s, rot/2) tables applied to q AND the new k at
    each sample's absolute positions. cache_seqlens: int or (b,) tokens
    already in the cache. cache_batch_idx: (b,) cache row serving query
    row i (requires k is None — appends would race shared rows).
    cache_leftpad: (b,) first valid cache column. num_splits != 1 routes
    through the split-KV kernels (0 = heuristic).

    JAX is functional, so the cache CANNOT be mutated in place like the
    reference: with k/v given the call returns ``(out, k_cache, v_cache)``
    — thread the updated cache into the next step (donate it under jit
    for in-place buffer reuse). Without k/v it returns just ``out``.
    With sq > 1 the new queries attend causally at their positions
    (``causal=False`` whole-block visibility is only meaningful for
    sq == 1, where the two coincide).
    """
    from ...ops.quant import QuantizedKV, quantize_kv

    b, sq, h, d = q.shape
    if softmax_scale is None:
        softmax_scale = d ** -0.5
    if sq > 1 and not causal:
        raise NotImplementedError(
            "sq > 1 with causal=False: new queries always attend at "
            "their causal positions here")

    # paged cache (≙ FA3 page_table): k_cache is a PagedKVCache carrying
    # both K and V plus its own lengths/page table; v_cache must be None
    from ...inference.paged import PagedKVCache

    if isinstance(k_cache, PagedKVCache):
        if v_cache is not None:
            raise ValueError(
                "a PagedKVCache carries both K and V — pass v_cache=None")
        for bad, name in ((cache_batch_idx, "cache_batch_idx"),
                          (cache_leftpad, "cache_leftpad")):
            if bad is not None:
                raise NotImplementedError(f"{name} with a paged cache")
        from ...inference.paged import append_paged_kv, paged_flash_decode

        cache = k_cache
        if k is not None:
            if rotary_cos is not None:
                pos = cache.lengths[:, None] + jnp.arange(sq)[None, :]
                cos = jnp.asarray(rotary_cos)[pos]
                sin = jnp.asarray(rotary_sin)[pos]
                q = apply_rotary_emb(q, cos, sin, rotary_interleaved)
                k = apply_rotary_emb(k, cos, sin, rotary_interleaved)
            cache = append_paged_kv(cache, jnp.swapaxes(k, 1, 2),
                                    jnp.swapaxes(v, 1, 2))
        elif rotary_cos is not None:
            pos = cache.lengths[:, None] - sq + jnp.arange(sq)[None, :]
            q = apply_rotary_emb(q, jnp.asarray(rotary_cos)[pos],
                                 jnp.asarray(rotary_sin)[pos],
                                 rotary_interleaved)
        out = paged_flash_decode(
            q, cache, softmax_scale=float(softmax_scale),
            window_size=(int(window_size[0]), int(window_size[1])),
            softcap=float(softcap))
        return (out, cache) if k is not None else out

    quantized = isinstance(k_cache, QuantizedKV)
    if quantized:
        S = k_cache.values.shape[2]
        hk = k_cache.values.shape[1]
    else:
        S, hk = k_cache.shape[1], k_cache.shape[2]
        # reference cache layout (b, S, hk, d) -> kernel layout
        k_cache = jnp.swapaxes(k_cache, 1, 2)
        v_cache = jnp.swapaxes(v_cache, 1, 2)

    if cache_seqlens is None:
        if k is not None:
            raise ValueError("appending k/v requires cache_seqlens")
        lens0 = jnp.full((b,), S, jnp.int32)
    else:
        lens0 = jnp.broadcast_to(
            jnp.asarray(cache_seqlens, jnp.int32), (b,))

    appending = k is not None
    if appending:
        if cache_batch_idx is not None:
            raise NotImplementedError(
                "cache_batch_idx with k/v append: shared cache rows would "
                "be written once per query row — append first, then call "
                "with k=None")
        if rotary_cos is not None:
            pos = lens0[:, None] + jnp.arange(sq)[None, :]   # (b, sq)
            cos = jnp.asarray(rotary_cos)[pos]               # (b, sq, r/2)
            sin = jnp.asarray(rotary_sin)[pos]
            q = apply_rotary_emb(q, cos, sin, rotary_interleaved)
            k = apply_rotary_emb(k, cos, sin, rotary_interleaved)
        kn = jnp.swapaxes(k, 1, 2)   # (b, hk, sq, d)
        vn = jnp.swapaxes(v, 1, 2)
        off = lens0 + (jnp.asarray(cache_leftpad, jnp.int32)
                       if cache_leftpad is not None else 0)

        def upd(cache, new):
            def one(c, n, o):
                return jax.lax.dynamic_update_slice(
                    c, n.astype(c.dtype), (0, o, 0))
            return jax.vmap(one)(cache, new, off)

        if quantized:
            knq = quantize_kv(kn, k_cache.values.dtype)
            vnq = quantize_kv(vn, v_cache.values.dtype)
            k_cache = QuantizedKV(upd(k_cache.values, knq.values),
                                  upd(k_cache.scales, knq.scales))
            v_cache = QuantizedKV(upd(v_cache.values, vnq.values),
                                  upd(v_cache.scales, vnq.scales))
        else:
            k_cache = upd(k_cache, kn)
            v_cache = upd(v_cache, vn)
    elif rotary_cos is not None:
        pos = lens0[:, None] - sq + jnp.arange(sq)[None, :]
        cos = jnp.asarray(rotary_cos)[pos]
        sin = jnp.asarray(rotary_sin)[pos]
        q = apply_rotary_emb(q, cos, sin, rotary_interleaved)

    lengths = lens0 + (sq if appending else 0)

    from .decode_kernel import flash_decode

    if num_splits != 1 and cache_batch_idx is None \
            and cache_leftpad is None:
        from ...inference.combine import flash_decode_splitkv

        out = flash_decode_splitkv(
            q, k_cache, v_cache, lengths,
            softmax_scale=float(softmax_scale), num_splits=num_splits,
            window_size=(int(window_size[0]), int(window_size[1])),
            softcap=float(softcap))
    else:
        out = flash_decode(
            q, k_cache, v_cache, lengths,
            softmax_scale=float(softmax_scale),
            window_size=(int(window_size[0]), int(window_size[1])),
            softcap=float(softcap),
            kv_batch_idx=cache_batch_idx, leftpad_k=cache_leftpad)
    if not appending:
        return out
    if quantized:
        return out, k_cache, v_cache
    return (out, jnp.swapaxes(k_cache, 1, 2),
            jnp.swapaxes(v_cache, 1, 2))
