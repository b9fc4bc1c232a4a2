"""Pipeline parallelism — GPipe-style microbatch pipelining over a mesh axis.

The reference explicitly scopes pipeline parallelism out
(training/README.md:23-27; SURVEY.md D5 "No ring attention, no Ulysses, no
CP, no EP" — and no PP); like the ring-attention context parallelism in
`ring.py`, this is new TPU-native design that completes the tp/pp/dp/sp/ep
matrix rather than a port.

Design (idiomatic JAX, runs inside shard_map over a ``pp`` mesh axis):

- Every rank holds ONE stage's parameters (the per-layer block params are
  stacked to a ``(pp, layers_per_stage, ...)`` leading axis and sharded over
  the pipeline axis) plus a replicated copy of the embedding/head params.
- ``pipeline_apply`` runs the classic GPipe schedule as a single
  ``lax.scan`` over ``num_microbatches + pp - 1`` ticks: each tick every
  rank applies its stage to its current microbatch and the activations
  rotate one hop along the ICI ring via ``jax.lax.ppermute`` (rank 0
  injects fresh microbatches, the last rank collects outputs). XLA
  overlaps each tick's ppermute with the next tick's compute — the same
  overlap the reference gets from NCCL async sends in DDP, applied to
  activations.
- The backward needs no hand-written schedule: ``jax.grad`` through the
  scan transposes every ``ppermute`` into the reverse-ring hop, yielding
  the standard GPipe all-forward-then-all-backward schedule, with
  ``jax.checkpoint`` around the stage body so only the (mb, s, d)
  stage boundaries are stored per tick (1F1B's memory shape).
- No atomics, no semaphores: the schedule is deterministic by
  construction, like everything else in this package.

Bubble accounting: utilization = M / (M + P - 1) for M microbatches on P
stages — choose M >= 4*P for <=20% bubble (printed by ``GPTPipeline``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pipeline_apply", "split_stage_params", "GPTPipeline"]


def pipeline_apply(
    stage_fn: Callable[[Any, Any], Any],
    stage_params: Any,
    x: Any,
    axis_name: str,
    *,
    collect: str = "last",
    remat: bool = True,
):
    """Run a P-stage GPipe pipeline inside shard_map over ``axis_name``.

    stage_fn(stage_params, act) -> act — every rank applies its own stage's
    params; the activation pytree must be shape/dtype-stable across stages
    (it is the ring payload).

    x: pytree with a leading ``(num_microbatches, ...)`` axis on every
    leaf, replicated across the pipeline axis (rank 0 injects microbatch
    ``t`` at tick ``t``).

    Returns the last stage's outputs with the same leading axis:

    - collect="last": valid ONLY on the last rank (zeros elsewhere) — the
      cheap path when the caller reduces to a scalar loss and psums it.
    - collect="psum": replicated on every rank (one extra all-reduce of
      the activations).
    """
    P = jax.lax.psum(1, axis_name)  # static under shard_map tracing
    r = jax.lax.axis_index(axis_name)
    M = jax.tree.leaves(x)[0].shape[0]
    fn = jax.checkpoint(stage_fn) if remat else stage_fn
    perm = [(i, i + 1) for i in range(P - 1)]  # no wraparound: rank 0
    # receives zeros (unused — it injects fresh input every tick)

    def pick(t):
        return jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(
                a, jnp.minimum(t, M - 1), 0, keepdims=False
            ),
            x,
        )

    act0 = jax.tree.map(jnp.zeros_like, pick(jnp.int32(0)))
    # the output buffer assumes stage output ~ stage input structure
    outs0 = jax.tree.map(jnp.zeros_like, x)

    def tick(carry, t):
        act, outs = carry
        inp = jax.tree.map(
            lambda a, b: jnp.where(r == 0, a, b), pick(t), act
        )
        y = fn(stage_params, inp)
        idx = jnp.clip(t - (P - 1), 0, M - 1)
        valid = t >= (P - 1)

        def write(buf, ymb):
            cur = jax.lax.dynamic_index_in_dim(buf, idx, 0, keepdims=False)
            return jax.lax.dynamic_update_index_in_dim(
                buf, jnp.where(valid, ymb, cur), idx, 0
            )

        outs = jax.tree.map(write, outs, y)
        act = jax.tree.map(
            lambda a: jax.lax.ppermute(a, axis_name, perm), y
        )
        return (act, outs), None

    (_, outs), _ = jax.lax.scan(
        tick, (act0, outs0), jnp.arange(M + P - 1, dtype=jnp.int32)
    )
    last = r == (P - 1)
    if collect == "psum":
        return jax.tree.map(
            lambda a: jax.lax.psum(
                jnp.where(last, a, jnp.zeros_like(a)), axis_name
            ),
            outs,
        )
    if collect == "last":
        # zero the garbage on non-last ranks so callers can mask-reduce
        return jax.tree.map(
            lambda a: jnp.where(last, a, jnp.zeros_like(a)), outs
        )
    raise ValueError(f"unknown collect mode {collect!r}")


def split_stage_params(layer_params: list, pp: int):
    """Stack homogeneous per-layer param trees into (pp, L/pp, ...) leaves.

    Host-side; the result is placed with a ``P('pp', ...)`` leading spec so
    each rank holds one ``(L/pp, ...)`` stage slice.
    """
    L = len(layer_params)
    if L % pp != 0:
        raise ValueError(f"{L} layers do not split into {pp} equal stages")
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)
    return jax.tree.map(
        lambda a: a.reshape((pp, L // pp) + a.shape[1:]), stacked
    )


class GPTPipeline:
    """Pipeline-parallel training step for the GPT skeleton.

    Splits the transformer trunk (the ``layers_i`` blocks) into ``pp``
    equal stages over ``axis_name``; embeddings and the LM head stay
    replicated (their compute is shared work, their grads are psum'd over
    the pipeline axis). Usage — see tests/parallel/test_pipeline.py:

        pipe = GPTPipeline(cfg, pp=4, num_microbatches=8)
        stage_p, rest_p = pipe.prepare(params)         # host-side split

        def local_step(stage_local, rest, ids, labels):
            loss, (gs, gr) = jax.value_and_grad(
                pipe.local_loss, argnums=(0, 1))(stage_local, rest,
                                                 ids, labels)
            return (jax.lax.psum(loss, "pp"), gs,
                    pipe.reduce_rest_grads(gr))

        loss, g_stage, g_rest = shard_map(
            local_step, mesh=mesh,
            in_specs=(pipe.stage_spec, P(), P(None), P(None)),
            out_specs=(P(), pipe.stage_spec, P()), check_vma=False,
        )(stage_p, rest_p, ids, labels)

    Numerics are exactly the sequential model's (same blocks, same order,
    per-microbatch); dropout must be off (deterministic) in v1.
    """

    def __init__(self, config, pp: int, num_microbatches: int,
                 axis_name: str = "pp"):
        if config.num_hidden_layers % pp != 0:
            raise ValueError("layers must divide evenly into stages")
        if config.embd_pdrop or config.resid_pdrop or config.attn_pdrop:
            raise ValueError("pipeline v1 runs deterministic (dropout=0)")
        if config.word_embed_proj_dim is not None:
            raise ValueError("factorized (OPT-350m style) embeddings are "
                             "not supported in the pipeline path")
        self.config = config
        self.pp = pp
        self.num_microbatches = num_microbatches
        self.axis_name = axis_name

    # -- parameter plumbing --------------------------------------------
    def prepare(self, params):
        """Split init params into (stacked stage params, replicated rest)."""
        p = dict(params["params"])
        tr = dict(p.pop("transformer"))
        L = self.config.num_hidden_layers
        layers = [tr.pop(f"layers_{i}") for i in range(L)]
        stage = split_stage_params(layers, self.pp)
        rest = {"params": {**p, "transformer": tr}}
        return stage, rest

    def merge(self, stage, rest):
        """Inverse of prepare — back to the sequential model's pytree."""
        L = self.config.num_hidden_layers
        flat = jax.tree.map(
            lambda a: a.reshape((L,) + a.shape[2:]), stage
        )
        tr = dict(rest["params"]["transformer"])
        for i in range(L):
            tr[f"layers_{i}"] = jax.tree.map(lambda a: a[i], flat)
        p = dict(rest["params"])
        p["transformer"] = tr
        return {"params": p}

    @property
    def stage_spec(self):
        from jax.sharding import PartitionSpec

        return PartitionSpec(self.axis_name)

    # -- model plumbing -------------------------------------------------
    def _block(self):
        from ..models.gpt import _mixer_cls, _mlp_cls
        from ..modules.block import Block

        c = self.config
        return Block(
            dim=c.hidden_size,
            mixer=_mixer_cls(c),
            mlp=_mlp_cls(c),
            norm_eps=c.layer_norm_epsilon,
            rms_norm=c.rms_norm,
            prenorm=c.prenorm,
            resid_dropout1=0.0,
            resid_dropout2=0.0,
            residual_in_fp32=c.residual_in_fp32,
            parallel_block=c.parallel_block,
            parallel_block_tied_norm=c.parallel_block_tied_norm,
        )

    def _stage_fn(self):
        block = self._block()

        def apply_layer(carry, layer_p):
            hidden, residual = carry
            hidden, residual, _ = block.apply(
                {"params": layer_p}, hidden, residual, True, (None, None),
                None, 0, None, None,
            )
            return (hidden, residual), None

        def stage_fn(stage_local, act):
            # stage_local leaves: (1, L/pp, ...) — the shard of the pp axis
            local = jax.tree.map(lambda a: a[0], stage_local)
            carry, _ = jax.lax.scan(apply_layer, act, local)
            return carry

        return stage_fn

    def microbatch(self, a):
        """(b, ...) -> (M, b/M, ...) on the leading axis."""
        M = self.num_microbatches
        return a.reshape((M, a.shape[0] // M) + a.shape[1:])

    def local_loss(self, stage_local, rest, ids, labels):
        """Per-rank masked LM loss; call inside shard_map over the pp axis.

        ids/labels: (b, s) replicated over the axis. Embedding/head run
        replicated; only the last rank's head output contributes (the trunk
        output is collected there). Differentiate this, THEN
        ``jax.lax.psum`` the returned value and ``reduce_rest_grads`` the
        replicated-param grads — see the class docstring example.
        """
        from ..losses.cross_entropy import cross_entropy_loss
        from ..modules.embedding import GPT2Embeddings

        c = self.config
        rp = rest["params"]
        wte = None
        if c.tie_word_embeddings:
            # tied table (≙ reference tie_weights): manual lookup/attend —
            # the shared nn.Embed's scope lives outside the trunk. Grads
            # reach it from rank 0 (lookup) and the last rank (attend);
            # reduce_rest_grads' psum sums them.
            wte = rp["wte"]["embedding"].astype(c.dtype)
            x = jnp.take(wte, ids, axis=0)
            if c.max_position_embeddings > 0:
                pos = rp["transformer"]["embeddings"][
                    "position_embeddings"]["embedding"].astype(c.dtype)
                x = x + pos[: ids.shape[1]][None]
        else:
            emb = GPT2Embeddings(
                embed_dim=c.hidden_size,
                vocab_size=c.padded_vocab_size,
                max_position_embeddings=c.max_position_embeddings,
                dtype=c.dtype,
            )
            x = emb.apply({"params": rp["transformer"]["embeddings"]}, ids)
        res0 = jnp.zeros(
            x.shape, jnp.float32 if c.residual_in_fp32 else x.dtype
        )
        acts = (self.microbatch(x), self.microbatch(res0))
        hidden, residual = pipeline_apply(
            self._stage_fn(), stage_local, acts, self.axis_name,
            collect="last",
        )
        hidden = hidden.reshape((-1,) + hidden.shape[2:])
        residual = residual.reshape((-1,) + residual.shape[2:])

        r = jax.lax.axis_index(self.axis_name)
        P_ = jax.lax.psum(1, self.axis_name)
        if c.prenorm:
            from ..modules.block import _Norm

            normf = _Norm(rms=c.rms_norm, eps=c.layer_norm_epsilon)
            hidden = normf.apply(
                {"params": rp["transformer"]["norm_f"]}, hidden, residual,
                0.0, False, c.residual_in_fp32,
            )
        if c.tie_word_embeddings:
            logits = hidden.astype(c.dtype) @ wte.T  # ≙ nn.Embed.attend
        else:
            import flax.linen as nn

            head = nn.Dense(c.padded_vocab_size, use_bias=c.lm_head_bias,
                            dtype=c.dtype)
            logits = head.apply({"params": rp["lm_head"]}, hidden)
        losses = cross_entropy_loss(
            logits.reshape(-1, logits.shape[-1]), labels.reshape(-1)
        )
        # Per-rank masked scalar — only the last rank saw real activations.
        # Deliberately NOT psum'd here: differentiate THIS (SPMD AD seeds
        # every rank's scalar and routes cotangents back through the
        # ppermute ring), then psum the value and the replicated-param
        # grads afterwards (under check_vma=False a psum inside the grad
        # would transpose to another psum and scale grads by pp).
        return jnp.where(r == P_ - 1, losses.mean(), 0.0)

    def reduce_rest_grads(self, rest_grads):
        """psum the replicated (embedding/head) grads over the pp axis.

        Stage grads are already local to their rank — leave them sharded.
        """
        return jax.tree.map(
            lambda g: jax.lax.psum(g, self.axis_name), rest_grads
        )
