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
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    data = open(path, "rb").read()
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(data)

    rows = []  # (dur_ms, display, category, flops, bytes, src, tf_op)
    for plane in xspace.planes:
        if plane.name != "/device:TPU:0":
            continue
        ev_meta = plane.event_metadata
        smeta = plane.stat_metadata
        for line in plane.lines:
            # Only the serial per-HLO execution timeline. "Async XLA Ops"
            # spans cover whole async windows (overlapped prefetches) and
            # sum to ~10x the step — never mix them in.
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                em = ev_meta[ev.metadata_id]
                st = {smeta[s.metadata_id].name: s for s in em.stats}
                cat = st["hlo_category"].str_value if "hlo_category" in st \
                    else "?"
                flops = st["flops"].int64_value if "flops" in st else 0
                nbytes = st["bytes_accessed"].int64_value \
                    if "bytes_accessed" in st else 0
                src = st["source"].str_value if "source" in st else ""
                tf_op = st["tf_op"].str_value if "tf_op" in st else ""
                rows.append((ev.duration_ps / 1e9, em.display_name, cat,
                             flops, nbytes, src, tf_op))

    def agg_by(key_fn):
        agg = {}
        for r in rows:
            k = key_fn(r)
            a = agg.setdefault(k, [0.0, 0, 0, 0])  # ms, count, flops, bytes
            a[0] += r[0]
            a[1] += 1
            a[2] += r[3]
            a[3] += r[4]
        return sorted(agg.items(), key=lambda kv: -kv[1][0])

    total = sum(r[0] for r in rows)
    print(f"total device op time: {total:.2f} ms  ({path})")
    print("-- by hlo_category (achieved TFLOP/s and GB/s per category) --")
    for cat, (ms, cnt, fl, by) in agg_by(lambda r: r[2]):
        print(f"  {cat:28s} {ms:8.2f} ms ({cnt:5d} ops)"
              f"  {fl / ms / 1e9 if ms else 0:7.1f} TF/s"
              f"  {by / ms / 1e6 if ms else 0:7.0f} GB/s")
    print(f"-- top {top} ops (aggregated by display name) --")
    for name, (ms, cnt, fl, by) in agg_by(lambda r: r[1])[:top]:
        print(f"  {ms:8.3f} ms ({cnt:4d}x) {fl / ms / 1e9 if ms else 0:7.1f} TF/s"
              f" {by / ms / 1e6 if ms else 0:7.0f} GB/s  {name[:70]}")
    print("-- top 20 source lines --")
    for src, (ms, cnt, fl, by) in agg_by(lambda r: r[5])[:20]:
        print(f"  {ms:8.3f} ms ({cnt:4d}x)  {src[:90]}")


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
