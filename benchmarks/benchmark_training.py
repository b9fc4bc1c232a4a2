"""End-to-end training throughput (≙ reference training/README.md tables:
GPT-2/GPT-3 tokens/s and model-FLOPs utilization on A100s; here tokens/s
and MFU on the local TPU chip).

Run: python benchmarks/benchmark_training.py [--model gpt2s] [--remat]
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

MODELS = {
    # name: (layers, hidden, heads, batch, seqlen)
    "gpt2s": (12, 768, 12, 8, 1024),
    "gpt2m": (24, 1024, 16, 4, 1024),
    "gpt2l": (36, 1280, 20, 4, 1024),
    # 8k-seqlen variant (≙ reference pile/gpt3s-flash-8k): long-seq
    # attention dominates; exercises remat + the merged backward
    "gpt2s-8k": (12, 768, 12, 2, 8192),
    # 8k control with MXU-native d=128 heads: isolates how much of the 8k
    # MFU gap is GPT-2's d=64 head shape (both attention matmul dims
    # half-filled -> ~50% MXU ceiling on 52% of the model FLOPs)
    "gpt2s-8k-d128": (12, 768, 6, 2, 8192),
    # control: gpt2m geometry with MXU-native 128-dim heads — isolates how
    # much of the MFU gap is GPT-2's d=64 head shape (half-width MXU
    # operands in every attention matmul) vs the framework
    "gpt2m-d128": (24, 1024, 8, 4, 1024),
}


def run(name="gpt2s", remat=False, steps=8, batch=None,
        remat_policy="save_attn"):
    L, H, heads, B, S = MODELS[name]
    if batch:
        B = batch
    cfg = GPTConfig(
        vocab_size=50257, hidden_size=H, num_hidden_layers=L,
        num_attention_heads=heads, max_position_embeddings=S,
        pad_vocab_size_multiple=128, remat=remat, dtype=jnp.bfloat16,
        remat_policy=remat_policy,
    )
    model = GPTLMHeadModel(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 50000, (B, S)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 50000, (B, S)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids[:1, :8])
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    def loss_fn(p, ids, labels):
        logits, _ = model.apply(p, ids)
        return cross_entropy_loss(
            logits.reshape(-1, logits.shape[-1]),
            labels.reshape(-1),
        ).mean()

    def step(carry, _):
        p, o = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, ids, labels)
        updates, o = opt.update(grads, o, p)
        return (optax.apply_updates(p, updates), o), loss

    # chain steps inside one jit (the axon tunnel adds large per-dispatch
    # latency; a python step loop measures the tunnel, not the chip)
    def chain(p, o, n):
        (p, o), losses = jax.lax.scan(step, (p, o), None, length=n)
        return p, o, losses[-1]

    # donate (params, opt_state) so the chain updates in place — without
    # donation XLA holds input + output copies of params AND both Adam
    # moments, which OOMs gpt2m+ on one chip
    f1 = jax.jit(lambda p, o: chain(p, o, 1), donate_argnums=(0, 1))
    fn = jax.jit(lambda p, o: chain(p, o, steps), donate_argnums=(0, 1))

    def once(f):
        nonlocal params, opt_state
        params, opt_state, loss = f(params, opt_state)
        return loss

    jax.block_until_ready(once(f1))
    jax.block_until_ready(once(fn))
    t0 = time.perf_counter()
    loss = once(f1)
    print("warm single-step loss:", float(loss))
    t1 = time.perf_counter()
    loss = once(fn)
    print("loss:", float(loss))  # forces sync
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (steps - 1)
    toks = B * S / dt
    fpt = gpt_flops_per_token(L, H, S, cfg.padded_vocab_size)
    # Model-FLOPs MFU: counts only the model's own fwd+bwd FLOPs —
    # rematerialized recompute is NOT credited (apples-to-apples with the
    # reference's 60.6-72% figures, BASELINE.md:13-14). The hardware
    # utilization including recompute (x4/3 under full remat) is reported
    # alongside for roofline context, never as the headline.
    mfu = toks * fpt / _chip_peak_flops()
    # save_dots recomputes only elementwise ops — no MXU recompute credit
    hw_util = mfu * (4.0 / 3.0 if remat and remat_policy != "save_dots" else 1.0)
    print(f"{name} remat={remat} b{B}: {toks:,.0f} tokens/s, "
          f"{toks * fpt / 1e12:.1f} TFLOP/s, model-FLOPs MFU {mfu:.1%}"
          + (f" (hw util incl. recompute {hw_util:.1%})" if remat else ""))
    return toks, mfu


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt2s", choices=list(MODELS))
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--remat-policy", default="save_attn",
                    choices=["save_attn", "save_dots", "nothing"])
    ap.add_argument("--steps", type=int, default=8)
    a = ap.parse_args()
    run(a.model, a.remat, a.steps, a.batch, a.remat_policy)
