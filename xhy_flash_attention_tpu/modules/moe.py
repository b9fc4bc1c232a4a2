"""Mixture-of-experts MLP (Mixtral-style top-k routing).

The reference has no MoE (SURVEY D5: no expert parallelism anywhere), but
the build targets include Mixtral-8x7B prefill (BASELINE config #4), so the
expert layer is new TPU-first design rather than a port:

  * routing is a dense (tokens, E) softmax top-k — tiny;
  * two dispatch strategies, both exact (no token dropping, so
    capacity-factor load-balancing pathologies can't occur):
      - dense (small E): every expert sees every token, weighted post-hoc
        by a combine tensor — E/k extra FLOPs but every matmul is
        MXU-shaped with static shapes;
      - grouped (E >= 8, megablocks-style): sort the (token, slot)
        assignments by expert and run ONE ragged grouped matmul per FFN
        layer (jax.lax.ragged_dot — Mosaic's native grouped-GEMM), doing
        exactly sum(group_i) rows of work: n*k rows instead of n*E.
        Tokens routed to other ranks' experts sort to the tail, where
        ragged_dot emits zeros — EP composes with no masking;
  * expert parallelism (EP): inside shard_map with `ep_axis` set, this
    module holds only its rank's expert shard (`num_experts` = local count,
    `num_experts_global` = full count; ≙ parallel/tp.py local_config
    pattern). The router is replicated; each rank computes its experts'
    outputs and a psum over the axis reassembles tokens.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["MoEMlp"]


class MoEMlp(nn.Module):
    """Top-k routed SwiGLU experts (≙ Mixtral block_sparse_moe)."""

    num_experts: int = 8           # local count under EP, global otherwise
    num_experts_per_tok: int = 2
    hidden_features: Optional[int] = None
    ep_axis: Optional[str] = None
    num_experts_global: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    # None = auto: grouped when the GLOBAL expert count is >= 8 (where the
    # dense dispatch's E/k-fold waste outweighs the sort/gather cost)
    grouped: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (..., d) -> (..., d)."""
        d = x.shape[-1]
        inner = self.hidden_features or 4 * d
        e_local = self.num_experts
        e_global = self.num_experts_global or e_local
        k = self.num_experts_per_tok
        shape = x.shape
        xt = x.reshape(-1, d)  # (n, d)
        n = xt.shape[0]

        gate = nn.Dense(e_global, use_bias=False, dtype=self.dtype,
                        name="gate")
        logits = gate(xt).astype(jnp.float32)  # (n, E)
        weights, sel = jax.lax.top_k(logits, k)  # (n, k)
        weights = jax.nn.softmax(weights, axis=-1).astype(x.dtype)

        # batched local expert params: (E, d, 2*inner), (E, inner, d)
        init = nn.initializers.normal(stddev=0.02)
        w1 = self.param("w1", init, (e_local, d, 2 * inner),
                        jnp.float32).astype(self.dtype)
        w2 = self.param("w2", init, (e_local, inner, d),
                        jnp.float32).astype(self.dtype)

        grouped = self.grouped
        if grouped is None:
            grouped = e_global >= 8

        if grouped:
            # megablocks-style grouped dispatch: sort assignments by
            # expert, gather tokens, one ragged grouped matmul per layer.
            start = (
                jax.lax.axis_index(self.ep_axis) * e_local
                if self.ep_axis is not None else 0
            )
            flat_sel = sel.reshape(-1)                      # (n*k,)
            # local experts sort to the FRONT: rows past the local groups
            # come out of ragged_dot as zeros (no masking needed for EP)
            key = jnp.mod(flat_sel - start, e_global)
            order = jnp.argsort(key)
            tok = order // k
            xs = jnp.take(xt, tok, axis=0)                  # (n*k, d)
            counts = jnp.bincount(
                jnp.take(key, order), length=e_global
            )[:e_local].astype(jnp.int32)
            h = jax.lax.ragged_dot(xs, w1, counts)          # (n*k, 2*inner)
            gate_h, up_h = jnp.split(h, 2, axis=-1)
            act = jax.nn.silu(gate_h) * up_h
            ys = jax.lax.ragged_dot(act.astype(w2.dtype), w2, counts)
            wts = jnp.take(weights.reshape(-1), order)
            out = jnp.zeros((n, d), ys.dtype).at[tok].add(
                ys * wts[:, None]
            ).astype(x.dtype)
        else:
            # dense dispatch: every local expert sees every token, weighted
            # post-hoc by the combine tensor (n, E)
            combine = jnp.zeros((n, e_global), x.dtype)
            combine = jax.vmap(lambda c, s, w: c.at[s].set(w))(
                combine, sel, weights
            )
            if self.ep_axis is not None:
                start = jax.lax.axis_index(self.ep_axis) * e_local
                combine = jax.lax.dynamic_slice(
                    combine, (0, start), (n, e_local)
                )
            h = jnp.einsum("nd,edf->enf", xt, w1)  # (e, n, 2*inner)
            gate_h, up_h = jnp.split(h, 2, axis=-1)
            act = jax.nn.silu(gate_h) * up_h
            out_e = jnp.einsum("enf,efd->end", act, w2)  # (e, n, d)
            out = jnp.einsum("end,ne->nd", out_e, combine)
        if self.ep_axis is not None:
            out = jax.lax.psum(out, self.ep_axis)
        return out.reshape(shape)
