"""Mixture-of-experts MLP (Mixtral-style top-k routing).

The reference has no MoE (SURVEY D5: no expert parallelism anywhere), but
the build targets include Mixtral-8x7B prefill (BASELINE config #4), so the
expert layer is new TPU-first design rather than a port:

  * routing is a dense (tokens, E) softmax top-k — tiny;
  * expert FFNs run as one batched einsum over a combine tensor (tokens
    weighted per expert). Dense dispatch does E/k times extra FLOPs but
    keeps every matmul MXU-shaped with static shapes — the right trade
    below ~16 experts on TPU, where gather/scatter regrouping costs more
    than it saves (megablocks-style grouped matmuls only pay at large E);
    no token dropping, so capacity-factor load-balancing pathologies can't
    occur;
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
        # combine tensor: (n, E) routing weight (0 for unselected)
        combine = jnp.zeros((n, e_global), x.dtype)
        combine = jax.vmap(lambda c, s, w: c.at[s].set(w))(
            combine, sel, weights
        )
        if self.ep_axis is not None:
            start = jax.lax.axis_index(self.ep_axis) * e_local
            combine = jax.lax.dynamic_slice(combine, (0, start), (n, e_local))

        # batched local expert params: (E, d, 2*inner), (E, inner, d)
        init = nn.initializers.normal(stddev=0.02)
        w1 = self.param("w1", init, (e_local, d, 2 * inner),
                        jnp.float32).astype(self.dtype)
        w2 = self.param("w2", init, (e_local, inner, d),
                        jnp.float32).astype(self.dtype)

        # dense dispatch: every local expert sees every token, weighted
        # post-hoc by the combine tensor
        h = jnp.einsum("nd,edf->enf", xt, w1)  # (e, n, 2*inner)
        gate_h, up_h = jnp.split(h, 2, axis=-1)
        act = jax.nn.silu(gate_h) * up_h
        out_e = jnp.einsum("enf,efd->end", act, w2)  # (e, n, d)
        out = jnp.einsum("end,ne->nd", out_e, combine)
        if self.ep_axis is not None:
            out = jax.lax.psum(out, self.ep_axis)
        return out.reshape(shape)
