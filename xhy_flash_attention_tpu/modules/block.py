"""Transformer block (≙ reference flash_attn/modules/block.py:37 Block and
:217 ParallelBlock).

Prenorm wiring uses the fused dropout-add-norm kernel exactly like the
reference's fused path (block.py:111-216):

    normed, residual = dropout_add_norm(x, residual, prenorm=True)
    x = mixer(normed); normed2, residual = dropout_add_norm(x, residual, ...)
    x = mlp(normed2)

and the model applies the final norm to (x, residual). residual_in_fp32 and
RMSNorm supported. ParallelBlock computes attention and MLP from one shared
norm (GPT-J/NeoX/Falcon style) and sums their outputs.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.layer_norm import dropout_add_layer_norm, dropout_add_rms_norm


class _Norm(nn.Module):
    """Parameter holder for a fused-norm call."""

    rms: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x0, residual, dropout_p, prenorm, residual_in_fp32,
                 seed=None, rowscale=None):
        h = x0.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (h,), jnp.float32)
        if self.rms:
            return dropout_add_rms_norm(
                x0, residual, weight, None, dropout_p, self.eps,
                rowscale=rowscale, prenorm=prenorm,
                residual_in_fp32=residual_in_fp32, seed=seed,
            )
        bias = self.param("bias", nn.initializers.zeros, (h,), jnp.float32)
        return dropout_add_layer_norm(
            x0, residual, weight, bias, dropout_p, self.eps,
            rowscale=rowscale, prenorm=prenorm,
            residual_in_fp32=residual_in_fp32, seed=seed,
        )


class Block(nn.Module):
    dim: int
    mixer: Any  # constructor closure -> nn.Module
    mlp: Any
    norm_eps: float = 1e-5
    rms_norm: bool = False
    prenorm: bool = True
    resid_dropout1: float = 0.0
    resid_dropout2: float = 0.0
    residual_in_fp32: bool = False
    parallel_block: bool = False
    # parallel block with untied norms: attention reads norm1, MLP reads
    # norm2, both over the same residual stream (GPT-NeoX / Falcon-40B style;
    # ≙ reference parallel_block_tied_norm=False and the dual-LN
    # dropout_add_layer_norm_parallel_residual kernel, csrc/layer_norm)
    parallel_block_tied_norm: bool = True

    @nn.compact
    def __call__(self, hidden_states, residual=None, deterministic=True,
                 seeds=(None, None), kv_cache=None, seqlen_offset=0,
                 q_segment_ids=None, kv_segment_ids=None):
        """Prenorm: (hidden_states, residual) -> (hidden_states, residual).

        hidden_states is the previous sublayer's un-dropped output; residual
        the running fp32 stream (None on the first block).
        """
        p1 = 0.0 if deterministic else self.resid_dropout1
        p2 = 0.0 if deterministic else self.resid_dropout2
        mixer = self.mixer(name="mixer")
        mlp = self.mlp(name="mlp") if self.mlp is not None else None
        norm1 = _Norm(rms=self.rms_norm, eps=self.norm_eps, name="norm1")

        if not self.prenorm:
            # postnorm (BERT-style): x = norm(residual + dropout(sublayer(x)))
            attn_out, new_cache = mixer(
                hidden_states, kv_cache=kv_cache, seqlen_offset=seqlen_offset,
                deterministic=deterministic,
                q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
            )
            hidden_states = norm1(attn_out, hidden_states, p1, False, False,
                                  seed=seeds[0])
            if mlp is not None:
                norm2 = _Norm(rms=self.rms_norm, eps=self.norm_eps, name="norm2")
                mlp_out = mlp(hidden_states)
                hidden_states = norm2(mlp_out, hidden_states, p2, False,
                                      False, seed=seeds[1])
            return hidden_states, None, new_cache

        normed, residual = norm1(
            hidden_states, residual, p1, True, self.residual_in_fp32,
            seed=seeds[0],
        )
        if self.parallel_block:
            # GPT-J style: attention and MLP share the norm; outputs add.
            attn_out, new_cache = mixer(
                normed, kv_cache=kv_cache, seqlen_offset=seqlen_offset,
                deterministic=deterministic,
                q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
            )
            if self.parallel_block_tied_norm:
                normed_mlp = normed
            else:
                # dual-LN parallel residual: norm2 re-normalizes the same
                # post-dropout-add residual for the MLP branch
                norm2 = _Norm(rms=self.rms_norm, eps=self.norm_eps,
                              name="norm2")
                normed_mlp = norm2(
                    residual.astype(normed.dtype), None, 0.0, False, False
                )
            mlp_out = mlp(normed_mlp) if mlp is not None else 0.0
            return attn_out + mlp_out, residual, new_cache

        attn_out, new_cache = mixer(
            normed, kv_cache=kv_cache, seqlen_offset=seqlen_offset,
            deterministic=deterministic,
            q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
        )
        if mlp is None:
            return attn_out, residual, new_cache
        norm2 = _Norm(rms=self.rms_norm, eps=self.norm_eps, name="norm2")
        normed2, residual = norm2(
            attn_out, residual, p2, True, self.residual_in_fp32,
            seed=seeds[1],
        )
        mlp_out = mlp(normed2)
        return mlp_out, residual, new_cache
