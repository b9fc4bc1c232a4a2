"""Training-step time breakdown on the real chip (MFU attack map).

Times, via the chained-differencing method benchmark_training uses:
  full    — loss + grads + AdamW update   (the MFU denominator)
  grads   — loss + grads only             (full - grads = optimizer)
  fwd     — loss only                     (grads - fwd = backward)

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/ablate_training.py \
        [--model gpt2m] [--remat]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from xhy_flash_attention_tpu.losses.cross_entropy import cross_entropy_loss
from xhy_flash_attention_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from xhy_flash_attention_tpu.training.callbacks import (
    _chip_peak_flops,
    gpt_flops_per_token,
)
from benchmark_training import MODELS


def _chain_time(f, args, n, donate, repeats=5):
    """Median-of-repeats differenced chain timing (single-shot
    differencing swings hundreds of ms under tunnel jitter)."""
    import statistics

    jf1 = jax.jit(lambda *a: f(*a, 1), donate_argnums=donate)
    jfn = jax.jit(lambda *a: f(*a, n), donate_argnums=donate)
    state = args
    out = jf1(*state); state = out[:-1]
    float(out[-1])
    out = jfn(*state); state = out[:-1]
    float(out[-1])
    t1s, t2s = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jf1(*state); state = out[:-1]
        float(out[-1])
        t1 = time.perf_counter()
        out = jfn(*state); state = out[:-1]
        float(out[-1])
        t2 = time.perf_counter()
        t1s.append(t1 - t0)
        t2s.append(t2 - t1)
    return (statistics.median(t2s) - statistics.median(t1s)) / (n - 1)


def run(name="gpt2m", remat=False, steps=8, batch=None):
    L, H, heads, B, S = MODELS[name]
    if batch:
        B = batch
    cfg = GPTConfig(
        vocab_size=50257, hidden_size=H, num_hidden_layers=L,
        num_attention_heads=heads, max_position_embeddings=S,
        pad_vocab_size_multiple=128, remat=remat, dtype=jnp.bfloat16,
    )
    model = GPTLMHeadModel(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 50000, (B, S)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 50000, (B, S)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids[:1, :8])
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    def loss_fn(p):
        logits, _ = model.apply(p, ids)
        return cross_entropy_loss(
            logits.reshape(-1, logits.shape[-1]).astype(jnp.float32),
            labels.reshape(-1),
        ).mean()

    def full(p, o, n):
        def step(c, _):
            p, o = c
            loss, grads = jax.value_and_grad(loss_fn)(p)
            upd, o = opt.update(grads, o, p)
            return (optax.apply_updates(p, upd), o), loss
        (p, o), losses = jax.lax.scan(step, (p, o), None, length=n)
        return p, o, losses[-1]

    def grads_only(p, n):
        def step(p, _):
            loss, grads = jax.value_and_grad(loss_fn)(p)
            # fold grads back so the chain depends on the backward
            p2 = jax.tree.map(lambda a, g: a - 0.0 * g.astype(a.dtype),
                              p, grads)
            return p2, loss
        p, losses = jax.lax.scan(step, p, None, length=n)
        return p, losses[-1]

    def fwd_only(p, n):
        def step(p, _):
            loss = loss_fn(p)
            # thread the loss back into the params (a bf16-rounds-to-zero
            # epsilon) or XLA CSEs the loop-invariant forward out of the
            # scan and the chain measures nothing
            eps = jnp.tanh(loss) * 1e-24
            p2 = jax.tree.map(lambda a: a + eps.astype(a.dtype), p)
            return p2, loss
        p, losses = jax.lax.scan(step, p, None, length=n)
        return p, losses[-1]

    def nox_loss_fn(p):
        # lm_head matmul kept, cross-entropy replaced by a cheap reduce —
        # isolates the xent kernel's cost
        logits, _ = model.apply(p, ids)
        return (logits.astype(jnp.float32) * 1e-6).sum()

    def nox_grads(p, n):
        def step(p, _):
            loss, grads = jax.value_and_grad(nox_loss_fn)(p)
            p2 = jax.tree.map(lambda a, g: a - 0.0 * g.astype(a.dtype),
                              p, grads)
            return p2, loss
        p, losses = jax.lax.scan(step, p, None, length=n)
        return p, losses[-1]

    # every phase donates its state, deleting its input buffers — give
    # each phase its own copy (full runs last so the originals die last)
    cp = lambda t: jax.tree.map(lambda x: x.copy(), t)
    t_fw = _chain_time(fwd_only, (cp(params),), steps, (0,))
    t_nox = _chain_time(nox_grads, (cp(params),), steps, (0,))
    t_gr = _chain_time(grads_only, (cp(params),), steps, (0,))
    t_full = _chain_time(full, (params, opt_state), steps, (0, 1))

    fpt = gpt_flops_per_token(L, H, S, cfg.padded_vocab_size)
    toks = B * S
    peak = _chip_peak_flops()
    print(f"{name} remat={remat} b{B}:")
    print(f"  full step : {t_full*1e3:8.2f} ms  "
          f"(model-FLOPs MFU {toks*fpt/t_full/peak:.1%})")
    print(f"  grads only: {t_gr*1e3:8.2f} ms  -> optimizer "
          f"{(t_full-t_gr)*1e3:.2f} ms ({(t_full-t_gr)/t_full:.1%})")
    print(f"  fwd only  : {t_fw*1e3:8.2f} ms  -> backward "
          f"{(t_gr-t_fw)*1e3:.2f} ms; fwd {(t_fw)/t_full:.1%} of step")
    print(f"  nox grads : {t_nox*1e3:8.2f} ms  -> xent fwd+bwd "
          f"{(t_gr-t_nox)*1e3:.2f} ms ({(t_gr-t_nox)/t_full:.1%})")
    print(f"  fwd-only MFU {toks*(fpt/3)/t_fw/peak:.1%}  "
          f"bwd-only MFU {toks*(2*fpt/3)/(t_gr-t_fw)/peak:.1%}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt2m")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--batch", type=int, default=None)
    a = ap.parse_args()
    run(a.model, a.remat, batch=a.batch)
