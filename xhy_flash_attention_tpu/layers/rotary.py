"""Rotary position embeddings (≙ reference flash_attn/layers/rotary.py and
the csrc/rotary/rotary.cpp:40 `apply_rotary` kernel).

On TPU the rotation is a pure VPU elementwise op that XLA fuses into the
surrounding matmuls, so the CUDA kernel (K18) becomes a jnp expression with a
hand-written VJP (the backward is rotation by -θ, matching
ApplyRotaryEmb.backward in the reference). Both layouts are supported:
GPT-J "interleaved" and GPT-NeoX "block" (reference rotary.py:199 docstring),
plus xPos scaling (`scale_base`) and partial-dim rotary
(`rotary_emb_fraction`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "apply_rotary_emb",
    "apply_rotary_emb_qkv",
    "apply_rotary_emb_kv",
    "RotaryEmbedding",
]


def _rotate(x, cos, sin, interleaved: bool):
    """Rotate the leading rotary_dim of x. x: (..., s, h, d_ro);
    cos/sin: (s, d_ro/2) broadcast over batch and heads."""
    ro_dim = cos.shape[-1] * 2
    assert x.shape[-1] == ro_dim
    # broadcast cos/sin to (..., s, 1, d_ro/2)
    cos = cos[..., :, None, :]
    sin = sin[..., :, None, :]
    if not interleaved:
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        )
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    return jnp.stack([o1, o2], axis=-1).reshape(x.shape)


def _apply(x, cos, sin, interleaved: bool, conj: bool):
    ro_dim = cos.shape[-1] * 2
    if conj:
        sin = -sin
    x_ro = _rotate(x[..., :ro_dim].astype(jnp.float32),
                   cos.astype(jnp.float32), sin.astype(jnp.float32),
                   interleaved).astype(x.dtype)
    if ro_dim == x.shape[-1]:
        return x_ro
    return jnp.concatenate([x_ro, x[..., ro_dim:]], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def apply_rotary_emb(x, cos, sin, interleaved: bool = False):
    """x: (batch, seqlen, nheads, head_dim); cos/sin: (seqlen, rotary_dim/2).

    rotary_dim = 2 * cos.shape[-1] may be smaller than head_dim (partial
    rotary, ≙ reference rotary_emb_fraction).
    """
    return _apply(x, cos, sin, interleaved, conj=False)


def _rot_fwd(x, cos, sin, interleaved):
    return _apply(x, cos, sin, interleaved, conj=False), (cos, sin)


def _rot_bwd(interleaved, res, g):
    cos, sin = res
    return _apply(g, cos, sin, interleaved, conj=True), None, None


apply_rotary_emb.defvjp(_rot_fwd, _rot_bwd)


def apply_rotary_emb_qkv(qkv, cos, sin, cos_k=None, sin_k=None,
                         interleaved: bool = False):
    """qkv: (batch, seqlen, 3, nheads, head_dim); rotates q and k only
    (≙ ApplyRotaryEmbQKV_, reference rotary.py:98)."""
    cos_k = cos if cos_k is None else cos_k
    sin_k = sin if sin_k is None else sin_k
    q = apply_rotary_emb(qkv[:, :, 0], cos, sin, interleaved)
    k = apply_rotary_emb(qkv[:, :, 1], cos_k, sin_k, interleaved)
    return jnp.stack([q, k, qkv[:, :, 2]], axis=2)


def apply_rotary_emb_kv(kv, cos, sin, interleaved: bool = False):
    """kv: (batch, seqlen, 2, nheads_k, head_dim); rotates k only
    (≙ ApplyRotaryEmbKV_, reference rotary.py:154)."""
    k = apply_rotary_emb(kv[:, :, 0], cos, sin, interleaved)
    return jnp.stack([k, kv[:, :, 1]], axis=2)


class RotaryEmbedding:
    """Stateless rotary-embedding table (≙ reference RotaryEmbedding,
    rotary.py:199). Computes cos/sin once per (seqlen, dtype) and applies
    them to qkv/kv/q, with:

      * `interleaved`: GPT-J layout vs GPT-NeoX block layout;
      * `base`: inverse-frequency base (default 10000);
      * `scale_base`: xPos scaling;
      * `seqlen_offset`: decode-time offset so cached tokens keep their
        original positions;
      * `pos_idx_in_fp32`: positions computed in fp32 for long sequences.
    """

    def __init__(self, dim: int, base: float = 10000.0,
                 interleaved: bool = False,
                 scale_base: Optional[float] = None,
                 pos_idx_in_fp32: bool = True):
        self.dim = dim
        self.base = float(base)
        self.interleaved = interleaved
        self.scale_base = scale_base
        self.pos_idx_in_fp32 = pos_idx_in_fp32

    def _inv_freq(self, dtype=jnp.float32):
        return 1.0 / (
            self.base ** (jnp.arange(0, self.dim, 2, dtype=jnp.float32) / self.dim)
        )

    def cos_sin(self, seqlen: int, dtype=jnp.float32, offset: int = 0):
        t = jnp.arange(
            offset, offset + seqlen,
            dtype=jnp.float32 if self.pos_idx_in_fp32 else dtype,
        )
        freqs = jnp.outer(t, self._inv_freq())
        if self.scale_base is None:
            return jnp.cos(freqs).astype(dtype), jnp.sin(freqs).astype(dtype), None, None
        power = (t - seqlen // 2) / self.scale_base
        scale_vec = (
            jnp.arange(0, self.dim, 2, dtype=jnp.float32) + 0.4 * self.dim
        ) / (1.4 * self.dim)
        scale = scale_vec[None, :] ** power[:, None]
        cos, sin = jnp.cos(freqs), jnp.sin(freqs)
        return (
            (cos * scale).astype(dtype), (sin * scale).astype(dtype),
            (cos / scale).astype(dtype), (sin / scale).astype(dtype),
        )

    def __call__(self, qkv, kv=None, seqlen_offset: int = 0):
        """qkv (b, s, 3, h, d) or q (b, s, h, d) when kv is given."""
        seqlen = qkv.shape[1]
        cos, sin, cos_k, sin_k = self.cos_sin(
            seqlen if kv is None else max(seqlen, kv.shape[1]),
            qkv.dtype, offset=seqlen_offset,
        )
        if kv is None:
            if self.scale_base is None:
                return apply_rotary_emb_qkv(
                    qkv, cos[:seqlen], sin[:seqlen], interleaved=self.interleaved
                )
            return apply_rotary_emb_qkv(
                qkv, cos[:seqlen], sin[:seqlen], cos_k[:seqlen], sin_k[:seqlen],
                interleaved=self.interleaved,
            )
        q = apply_rotary_emb(qkv, cos[:seqlen], sin[:seqlen], self.interleaved)
        kv = apply_rotary_emb_kv(
            kv,
            (cos if cos_k is None else cos_k)[: kv.shape[1]],
            (sin if sin_k is None else sin_k)[: kv.shape[1]],
            interleaved=self.interleaved,
        )
        return q, kv
