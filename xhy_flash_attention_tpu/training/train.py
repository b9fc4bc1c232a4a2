"""Train driver (≙ reference training/run.py + src/train.py + tasks/seq.py).

The reference drives PyTorch-Lightning: Hydra instantiates a SequenceLMModel
task, Trainer.fit spawns one process per GPU with NCCL DDP, and callbacks
handle speed/FLOPs/ckpt. Here the same responsibilities are a single jitted
train step over a jax Mesh:

  * DDP           -> `dp` mesh axis, gradient pmean inside shard_map
  * Megatron TP/SP-> `tp` mesh axis via parallel/tp.py sharding rules
  * ZeRO-1        -> optimizer state shards like its parameter under the
                     same NamedSharding (jit partitions the update;
                     ≙ ddp_zero1.py's ZeroRedundancyOptimizer)
  * auto-resume   -> newest checkpoint in ckpt_dir (≙ train.py:70-92
                     last.ckpt/.pl_auto_save.ckpt logic), exact data order
                     via the datamodule's integer step cursor
"""

from __future__ import annotations

import os
import pickle
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses.cross_entropy import cross_entropy_loss
from ..models.gpt import GPTConfig, GPTLMHeadModel
from .callbacks import NumTokens, Perplexity, SpeedMonitor, gpt_flops_per_token, grad_norm
from .config import TrainConfig, model_dtype
from .data import LMDataModule
from .optim import make_optimizer

__all__ = ["Trainer", "train"]


def _zero1_moment_specs(specs, params, dp: int):
    """PartitionSpecs for dp-sharded optimizer moments (ZeRO-1): each
    param-shaped moment gets 'dp' on its largest dp-divisible dimension not
    already sharded by tp; indivisible (small) leaves stay replicated."""
    from jax.sharding import PartitionSpec as P

    def one(spec, p):
        if p.ndim == 0:
            return spec
        entries = list(spec) + [None] * (p.ndim - len(spec))
        best = -1
        for i in range(p.ndim):
            if entries[i] is None and p.shape[i] % dp == 0 and p.shape[i] > 1:
                if best < 0 or p.shape[i] > p.shape[best]:
                    best = i
        if best < 0:
            return spec
        entries[best] = "dp"
        return P(*entries)

    from jax.sharding import PartitionSpec
    return jax.tree.map(
        one, specs, params,
        is_leaf=lambda x: isinstance(x, PartitionSpec),
    )


def _zero2_scatter(grads, specs, zspecs, dp: int):
    """ZeRO-2 gradient reduce-scatter (≙ reference ddp_zero2.py:26-133 —
    apex DistributedFusedAdam shards the grad reduction): inside shard_map,
    reduce each grad over dp directly onto the dp shard its moment lives
    on, instead of all-reducing (pmean) a replicated copy. Leaves whose
    moment spec gained no 'dp' dim (small/indivisible) fall back to pmean."""

    def one(g, spec, zspec):
        s = list(spec) + [None] * (g.ndim - len(spec))
        z = list(zspec) + [None] * (g.ndim - len(zspec))
        dim = next((i for i in range(g.ndim) if s[i] != z[i]), None)
        if dim is None:
            return jax.lax.pmean(g, "dp")
        return jax.lax.psum_scatter(
            g, "dp", scatter_dimension=dim, tiled=True) / dp

    return jax.tree.map(one, grads, specs, zspecs)


def _map_param_subtrees(f, opt_state, params):
    """Apply f to every subtree of opt_state congruent to the params tree
    (optax moment trees: Adam mu/nu, EMA, ...), leaving scalars (count)
    and everything else untouched."""
    pstruct = jax.tree.structure(params)

    def rec(node):
        try:
            if jax.tree.structure(node) == pstruct:
                return f(node)
        except Exception:
            pass
        if isinstance(node, tuple):
            vals = [rec(c) for c in node]
            return type(node)(*vals) if hasattr(node, "_fields") \
                else tuple(vals)
        if isinstance(node, list):
            return [rec(c) for c in node]
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(opt_state)


class Trainer:
    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        self.dtype = model_dtype(cfg)
        self.model_cfg = GPTConfig(**{**cfg.model, "dtype": self.dtype})
        self.model = GPTLMHeadModel(self.model_cfg)
        self.data = LMDataModule(
            cfg.data.path, cfg.data.seqlen, cfg.data.batch_size,
            seed=cfg.data.seed, dtype=np.dtype(cfg.data.dtype),
        )
        self.opt = make_optimizer(cfg.optimizer, cfg.scheduler)
        self.step = 0
        self.num_tokens = NumTokens()
        self.ppl = Perplexity()
        self.params = None
        self.opt_state = None
        dp, tp = cfg.mesh
        self.mesh = None
        self._pipe = None
        pp = getattr(cfg, "pipeline_parallel", 1)
        if pp > 1:
            if tp != 1:
                raise ValueError("pipeline_parallel composes with dp only "
                                 "(set mesh tp=1)")
            from ..parallel import make_mesh

            self.mesh = make_mesh(dp=dp, tp=pp, axis_names=("dp", "pp"))
        elif dp * tp > 1:
            from ..parallel import make_mesh

            self.mesh = make_mesh(dp=dp, tp=tp)
        self._step_fn = None

    # ---- setup ----------------------------------------------------------

    def init_params(self, rng: Optional[jax.Array] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        ids = jnp.zeros((2, 8), jnp.int32)
        self.params = self.model.init(rng, ids)
        self.opt_state = self.opt.init(self.params)

    def _loss_fn(self, params, ids, labels):
        logits, _ = self.model.apply(params, ids)
        losses = cross_entropy_loss(
            logits.reshape(-1, logits.shape[-1]),
            labels.reshape(-1),
        )
        return losses.mean()

    def _build_step(self):
        if getattr(self.cfg, "pipeline_parallel", 1) > 1:
            return self._build_step_pipeline()
        if self.mesh is not None:
            return self._build_step_mesh()

        def step_fn(params, opt_state, ids, labels):
            loss, grads = jax.value_and_grad(self._loss_fn)(
                params, ids, labels
            )
            gnorm = grad_norm(grads)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, gnorm

        return jax.jit(step_fn, donate_argnums=(0, 1))

    def _build_step_pipeline(self):
        """dp × pp training step (≙ nothing in the reference — it scopes
        pipeline parallelism out; see parallel/pipeline.py).

        Params are held in pipeline form {"stage": (pp, L/pp, ...) stacked
        blocks sharded over 'pp', "rest": replicated embeddings/head};
        checkpoints store the canonical sequential tree (portable across
        pp configs)."""
        import functools

        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.pipeline import GPTPipeline
        from .optim import decay_mask, make_optimizer

        cfg = self.cfg
        dp, _ = cfg.mesh
        pp = cfg.pipeline_parallel
        M = cfg.pipeline_microbatches or 4 * pp
        per_dp = cfg.data.batch_size // max(dp, 1)
        if per_dp % M:
            raise ValueError(
                f"per-dp-rank batch {per_dp} must divide into "
                f"{M} microbatches")
        pipe = GPTPipeline(self.model_cfg, pp=pp, num_microbatches=M,
                           axis_name="pp")
        self._pipe = pipe

        # decay decisions must see per-layer rank under the (pp, L/pp)
        # stacking; rebuild the optimizer with a stacking-aware mask
        def pp_mask(params):
            return {"stage": decay_mask(params["stage"], stacked_dims=2),
                    "rest": decay_mask(params["rest"])}

        self.opt = make_optimizer(cfg.optimizer, cfg.scheduler, mask=pp_mask)

        mesh = self.mesh
        sspec, rspec = P("pp"), P()

        def to_pp(sub):
            st, rs = pipe.prepare(sub)
            st = jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(mesh, sspec)), st)
            rs = jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(mesh, rspec)), rs)
            return {"stage": st, "rest": rs}

        canonical = self.params
        self.params = to_pp(canonical)
        if self.opt_state is None:
            self.opt_state = self.opt.init(self.params)
        else:
            # loaded/fresh moments are canonical trees (the adamw mask only
            # wraps the stateless decay transform) — convert, don't re-init,
            # so resume keeps the Adam state
            self.opt_state = _map_param_subtrees(
                to_pp, self.opt_state, canonical)

        def local_step(stage_local, rest, ids, labels):
            loss, (gs, gr) = jax.value_and_grad(
                pipe.local_loss, argnums=(0, 1)
            )(stage_local, rest, ids, labels)
            loss = jax.lax.psum(loss, "pp")
            gr = pipe.reduce_rest_grads(gr)
            if dp > 1:
                loss = jax.lax.pmean(loss, "dp")
                gs = jax.tree.map(lambda g: jax.lax.pmean(g, "dp"), gs)
                gr = jax.tree.map(lambda g: jax.lax.pmean(g, "dp"), gr)
            return loss, gs, gr

        grad_fn = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(sspec, rspec, P("dp"), P("dp")),
            out_specs=(P(), sspec, rspec),
            check_vma=False,
        )

        def step_fn(params, opt_state, ids, labels):
            loss, gs, gr = grad_fn(params["stage"], params["rest"],
                                   ids, labels)
            grads = {"stage": gs, "rest": gr}
            gnorm = grad_norm(grads)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # pin the layouts across steps
            params = {
                "stage": jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(
                        x, NamedSharding(mesh, sspec)), params["stage"]),
                "rest": jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(
                        x, NamedSharding(mesh, rspec)), params["rest"]),
            }
            return params, opt_state, loss, gnorm

        return jax.jit(step_fn, donate_argnums=(0, 1))

    def _canonical_params(self):
        """Sequential-model param tree regardless of internal layout."""
        if self._pipe is not None and isinstance(self.params, dict) \
                and "stage" in self.params:
            return self._pipe.merge(self.params["stage"],
                                    self.params["rest"])
        return self.params

    def _build_step_mesh(self):
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.tp import local_config, shard_gpt_params

        dp, tp = self.cfg.mesh
        lc = local_config(self.model_cfg, tp,
                          sequence_parallel=self.cfg.sequence_parallel)
        model_tp = GPTLMHeadModel(lc)
        params_tp, specs = shard_gpt_params(
            self.params, self.model_cfg, tp, self.mesh
        )
        self.params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
            params_tp, specs,
        )
        self.opt_state = self.opt.init(self.params)
        # ZeRO-1 (≙ ddp_zero1.py ZeroRedundancyOptimizer's per-rank
        # shards): optimizer moments are additionally sharded over the dp
        # axis — params stay dp-replicated for the forward, but each dp
        # rank stores only 1/dp of the Adam state. XLA's SPMD partitioner
        # then runs the update on the shards and re-gathers the params.
        self._zero1_specs = None
        if dp > 1:
            self._zero1_specs = _zero1_moment_specs(specs, self.params, dp)
            place = lambda sub: jax.tree.map(
                lambda x, s: jax.device_put(
                    x, NamedSharding(self.mesh, s)),
                sub, self._zero1_specs,
            )
            self.opt_state = _map_param_subtrees(
                place, self.opt_state, self.params
            )
        # ZeRO-2 (≙ ddp_zero2.py DistributedFusedAdam grad sharding):
        # grads are reduce-scattered over dp onto the moment shards
        # instead of all-reduced, so each dp rank materializes only 1/dp
        # of the gradient; XLA all-gathers the (sharded) updates back
        # into the replicated params at apply_updates.
        zero2 = dp > 1 and getattr(self.cfg, "zero_stage", 1) >= 2
        zspecs = self._zero1_specs

        def local_grads(p, ids, labels):
            def local_loss(p):
                logits, _ = model_tp.apply(p, ids)
                v_local = logits.shape[-1]
                vocab_start = jax.lax.axis_index("tp") * v_local
                losses = cross_entropy_loss(
                    logits.reshape(-1, v_local),
                    labels.reshape(-1), 0.0, -100, 0.0, "tp", vocab_start,
                )
                return losses.mean()

            loss, grads = jax.value_and_grad(local_loss)(p)
            loss = jax.lax.pmean(loss, "dp")
            if zero2:
                grads = _zero2_scatter(grads, specs, zspecs, dp)
            else:
                grads = jax.tree.map(lambda g: jax.lax.pmean(g, "dp"), grads)
            return loss, grads

        grad_fn = shard_map(
            local_grads,
            mesh=self.mesh,
            in_specs=(specs, P("dp", None), P("dp", None)),
            out_specs=(P(), zspecs if zero2 else specs),
            check_vma=False,
        )

        zspecs = self._zero1_specs
        mesh = self.mesh

        def step_fn(params, opt_state, ids, labels):
            loss, grads = grad_fn(params, ids, labels)
            gnorm = grad_norm(grads)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if zspecs is not None:
                # keep the moments dp-sharded across steps (ZeRO-1) and the
                # params on their tp layout — XLA inserts the scatter/gather
                constrain = lambda sub: jax.tree.map(
                    lambda x, s: jax.lax.with_sharding_constraint(
                        x, NamedSharding(mesh, s)),
                    sub, zspecs,
                )
                opt_state = _map_param_subtrees(constrain, opt_state, params)
                params = jax.tree.map(
                    lambda x, s: jax.lax.with_sharding_constraint(
                        x, NamedSharding(mesh, s)),
                    params, specs,
                )
            return params, opt_state, loss, gnorm

        return jax.jit(step_fn, donate_argnums=(0, 1))

    # ---- checkpointing (≙ Lightning ckpt + ZeRO state save/load) ---------

    def save_checkpoint(self, path: Optional[str] = None):
        path = path or os.path.join(self.cfg.ckpt_dir, f"step_{self.step}.ckpt")
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        params, opt_state = self.params, self.opt_state
        if self._pipe is not None and isinstance(params, dict) \
                and "stage" in params:
            # store the canonical sequential tree — checkpoints stay
            # portable across pipeline configurations
            opt_state = _map_param_subtrees(
                lambda sub: self._pipe.merge(sub["stage"], sub["rest"]),
                opt_state, params,
            )
            params = self._canonical_params()
        payload = {
            "step": self.step,
            "params": jax.device_get(params),
            "opt_state": jax.device_get(opt_state),
            "data": self.data.state_dict(),
            "num_tokens": self.num_tokens.state_dict(),
        }
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)  # atomic (≙ fault-tolerant .pl_auto_save)
        last = os.path.join(os.path.dirname(path), "last.ckpt")
        try:
            if os.path.islink(last) or os.path.exists(last):
                os.remove(last)
            os.symlink(os.path.basename(path), last)
        except OSError:
            pass
        return path

    def load_checkpoint(self, path: str):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        self.step = payload["step"]
        self.params = jax.tree.map(jnp.asarray, payload["params"])
        self.opt_state = jax.tree.map(jnp.asarray, payload["opt_state"])
        self.data.load_state_dict(payload["data"])
        self.num_tokens.load_state_dict(payload["num_tokens"])

    def maybe_resume(self) -> bool:
        last = os.path.join(self.cfg.ckpt_dir, "last.ckpt")
        if self.cfg.resume and os.path.exists(last):
            self.load_checkpoint(os.path.realpath(last))
            return True
        return False

    # ---- eval (≙ reference training/src/eval.py + SequenceLMModel
    # validation: held-out perplexity over a fixed window count) ------------

    def evaluate(self, data: Optional[LMDataModule] = None,
                 max_batches: int = 50) -> dict:
        data = data or self.data
        if self.params is None and not self.maybe_resume():
            self.init_params()

        @jax.jit
        def eval_loss(params, ids, labels):
            return self._loss_fn(params, ids, labels)

        eval_params = self._canonical_params()
        ppl = Perplexity()
        it = iter(data)
        tokens_per_batch = data.batch_size * data.seqlen
        for _ in range(max_batches):
            ids, labels = next(it)
            loss = float(eval_loss(eval_params, jnp.asarray(ids),
                                   jnp.asarray(labels)))
            ppl.update(loss * tokens_per_batch, tokens_per_batch)
        return {"eval_loss": ppl.total_nll / max(ppl.total_tokens, 1),
                "eval_ppl": ppl.compute()}

    # ---- loop -------------------------------------------------------------

    def profile_step(self, trace_dir: str = "/tmp/xfa_train_trace") -> str:
        """Capture a jax profiler trace of one train step (≙ the reference's
        pytorch_profiler hook in utils/benchmark.py; view with xprof)."""
        if self.params is None and not self.maybe_resume():
            self.init_params()
        if self._step_fn is None:
            self._step_fn = self._build_step()
        ids, labels = next(iter(self.data))
        args = (self.params, self.opt_state, jnp.asarray(ids),
                jnp.asarray(labels))
        out = self._step_fn(*args)  # compile outside the trace
        jax.block_until_ready(out[2])
        self.params, self.opt_state = out[0], out[1]
        ids, labels = next(iter(self.data))
        with jax.profiler.trace(trace_dir):
            out = self._step_fn(self.params, self.opt_state,
                                jnp.asarray(ids), jnp.asarray(labels))
            jax.block_until_ready(out[2])
        self.params, self.opt_state = out[0], out[1]
        self.step += 2
        return trace_dir

    def fit(self, max_steps: Optional[int] = None, log=print):
        cfg = self.cfg
        max_steps = max_steps or cfg.max_steps
        if self.params is None and not self.maybe_resume():
            self.init_params()
        if self._step_fn is None:
            self._step_fn = self._build_step()
        tokens_per_step = cfg.data.batch_size * cfg.data.seqlen
        mc = self.model_cfg
        speed = SpeedMonitor(
            tokens_per_step,
            gpt_flops_per_token(
                mc.num_hidden_layers, mc.hidden_size, cfg.data.seqlen,
                mc.padded_vocab_size,
                mc.intermediate_size or 4 * mc.hidden_size,
            ),
        )
        it = iter(self.data)
        while self.step < max_steps:
            ids, labels = next(it)
            self.params, self.opt_state, loss, gnorm = self._step_fn(
                self.params, self.opt_state,
                jnp.asarray(ids), jnp.asarray(labels),
            )
            self.step += 1
            self.num_tokens.update(tokens_per_step)
            stats = speed.step()
            loss_f = float(loss)
            self.ppl.update(loss_f * tokens_per_step, tokens_per_step)
            if self.step % cfg.log_every == 0:
                log(f"step {self.step} loss {loss_f:.4f} "
                    f"gnorm {float(gnorm):.3f} "
                    f"ppl {self.ppl.compute():.2f} "
                    + " ".join(f"{k} {v:.3f}" for k, v in stats.items()))
            if cfg.ckpt_every and self.step % cfg.ckpt_every == 0:
                self.save_checkpoint()
        return float(loss)


def train(config_path: str, **overrides):
    """CLI-style entry (≙ training/run.py main). The config's ``task``
    key selects the trainer: "lm" (default) or "image" (ViTTrainer)."""
    from .config import load_config

    cfg = load_config(config_path, overrides or None)
    if getattr(cfg, "task", "lm") == "image":
        from .vision import ViTTrainer

        t = ViTTrainer(cfg)
    else:
        t = Trainer(cfg)
    t.fit()
    return t
