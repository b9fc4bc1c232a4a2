"""Trace one training step on the chip and print a per-op time breakdown.

Captures a jax profiler trace of the fused train step (loss + grads + AdamW)
and aggregates device-line event durations by HLO op, bucketed into
matmul-fusion / attention-kernel / norm-kernel / optimizer / elementwise /
copy-transpose — the map for MFU work (≙ the reference's pytorch_profiler
table in training/src/utils/benchmark.py).

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/profile_training.py \
        [--model gpt2m] [--remat] [--top 40]
"""

import argparse
import glob
import gzip
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import optax

from xhy_flash_attention_tpu.losses.cross_entropy import cross_entropy_loss
from xhy_flash_attention_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from benchmark_training import MODELS


def build_step(name="gpt2m", remat=False, batch=None):
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

    @jax.jit
    def step(p, o):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, o = opt.update(grads, o, p)
        return optax.apply_updates(p, upd), o, loss

    return step, params, opt_state


def parse_xplane(trace_dir, top=40):
    from xprof.convert import raw_to_tool_data  # noqa: F401  (plugin check)
    from tensorboard_plugin_profile.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    data = open(path, "rb").read()
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(data)

    rows = []  # (dur_us, name)
    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            # XLA op lines carry per-HLO events; step/module lines aggregate
            if line.name.lower() in ("steps",):
                continue
            if "xla op" not in line.name.lower() and "ops" != line.name.lower():
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                rows.append((ev.duration_ps / 1e6, name))
    if not rows:
        # fall back: take the busiest line of every TPU plane
        for plane in xspace.planes:
            if "TPU" not in plane.name:
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta[ev.metadata_id].name
                    rows.append((ev.duration_ps / 1e6, name))

    agg = {}
    for dur, name in rows:
        agg[name] = agg.get(name, 0.0) + dur
    items = sorted(agg.items(), key=lambda kv: -kv[1])

    def bucket(name):
        n = name.lower()
        if "flash" in n or "attn" in n or "custom-call" in n or "tpu_custom" in n:
            return "attention/pallas"
        if "layer_norm" in n or "rms" in n or "norm" in n:
            return "norm"
        if "fusion" in n and ("dot" in n or "conv" in n):
            return "matmul-fusion"
        if n.startswith(("dot", "convolution", "cublas", "gemm")):
            return "matmul"
        if n.startswith(("copy", "transpose", "bitcast", "reshape",
                         "all-gather", "dynamic-update-slice")):
            return "copy/layout"
        if n.startswith(("fusion", "loop_", "input_", "output_")):
            return "fusion(elementwise?)"
        return "other"

    buckets = {}
    for name, dur in items:
        buckets.setdefault(bucket(name), [0.0, 0])
        buckets[bucket(name)][0] += dur
        buckets[bucket(name)][1] += 1
    total = sum(d for _, d in agg.items())
    print(f"total device op time: {total/1e3:.2f} ms  ({path})")
    for bk, (dur, cnt) in sorted(buckets.items(), key=lambda kv: -kv[1][0]):
        print(f"  {bk:24s} {dur/1e3:8.2f} ms  ({cnt} ops)")
    print(f"top {top} ops:")
    for name, dur in items[:top]:
        print(f"  {dur/1e3:8.3f} ms  {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt2m")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--trace-dir", default="/tmp/xfa_step_trace")
    ap.add_argument("--parse-only", action="store_true")
    a = ap.parse_args()
    if not a.parse_only:
        step, params, opt_state = build_step(a.model, a.remat, a.batch)
        params, opt_state, loss = step(params, opt_state)
        float(loss)  # compile + settle outside the trace
        shutil.rmtree(a.trace_dir, ignore_errors=True)
        with jax.profiler.trace(a.trace_dir):
            params, opt_state, loss = step(params, opt_state)
            float(loss)
    parse_xplane(a.trace_dir, a.top)


if __name__ == "__main__":
    main()
