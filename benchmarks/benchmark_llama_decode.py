"""Llama-geometry end-to-end decode throughput (≙ BASELINE.json headline
"tokens/sec/chip at Llama decode with quantized KV").

A single v5e (16 GB) can't hold Llama-3-8B bf16, so this uses a ~1.3B
Llama-geometry model (same GQA/rotary/SwiGLU structure) and reports
tokens/s/chip for bf16 vs INT8 KV caches at several context lengths.
Decode steps chain inside one jit (greedy argmax in the scan body) so the
dispatch tunnel doesn't pollute the measurement.

Run: PYTHONPATH=.:$PYTHONPATH python benchmarks/benchmark_llama_decode.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from xhy_flash_attention_tpu.models.gpt import GPTConfig, GPTLMHeadModel


def run(batch=8, context=2048, steps=24):
    def make_cfg(**kw):
        return GPTConfig(
            vocab_size=32000, hidden_size=2048, num_hidden_layers=16,
            num_attention_heads=16, num_attention_heads_kv=8,
            intermediate_size=5632, max_position_embeddings=0,
            rotary_emb_fraction=1.0, rms_norm=True,
            activation_function="swiglu", tie_word_embeddings=False,
            qkv_proj_bias=False, out_proj_bias=False,
            mlp_fc1_bias=False, mlp_fc2_bias=False,
            pad_vocab_size_multiple=128, dtype=jnp.bfloat16, **kw,
        )

    cfg = make_cfg()
    model_f = GPTLMHeadModel(cfg)
    rng = np.random.default_rng(0)
    params_f = model_f.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 8), jnp.int32))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params_f))
    print(f"model: {n_params/1e9:.2f}B params, batch={batch}, "
          f"context={context}", flush=True)

    from xhy_flash_attention_tpu.models.gpt import quantize_gpt_params

    cfg_q = make_cfg(weight_quant="int8")
    params_q = quantize_gpt_params(params_f, cfg_q)
    model_q = GPTLMHeadModel(cfg_q)

    prompt_len = context - steps - 1
    ids = jnp.asarray(rng.integers(0, 32000, (batch, prompt_len)), jnp.int32)

    for name, model, params, cache_dtype in [
        ("bf16 w / bf16 KV", model_f, params_f, jnp.bfloat16),
        ("bf16 w / int8 KV", model_f, params_f, jnp.int8),
        ("int8 w / int8 KV", model_q, params_q, jnp.int8),
    ]:
        caches = model.allocate_kv_caches(batch, context, dtype=cache_dtype)

        @jax.jit
        def prefill(params, ids, caches):
            logits, caches = model.apply(params, ids, kv_caches=caches,
                                         seqlen_offset=0)
            return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), caches

        tok, caches0 = prefill(params, ids, caches)
        jax.block_until_ready(tok)

        def decode_chain(params, tok, caches, n):
            def body(carry, i):
                tok, caches = carry
                logits, caches = model.apply(
                    params, tok[:, None], kv_caches=caches,
                    seqlen_offset=prompt_len + i,
                )
                return (jnp.argmax(logits[:, 0], -1).astype(jnp.int32),
                        caches), None
            (tok, caches), _ = jax.lax.scan(
                body, (tok, caches), jnp.arange(n))
            # scalar result: float() on it forces real synchronization
            # (block_until_ready is a no-op through the axon tunnel)
            return jnp.float32(tok[0])

        f1 = jax.jit(lambda p, t, c: decode_chain(p, t, c, 4))
        fn = jax.jit(lambda p, t, c: decode_chain(p, t, c, steps))
        float(f1(params, tok, caches0))
        float(fn(params, tok, caches0))
        import statistics
        t1s, t2s = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f1(params, tok, caches0))
            t1 = time.perf_counter()
            float(fn(params, tok, caches0))
            t2 = time.perf_counter()
            t1s.append(t1 - t0)
            t2s.append(t2 - t1)
        dt = (statistics.median(t2s) - statistics.median(t1s)) / (steps - 4)
        print(f"  {name}: {batch/dt:,.0f} tokens/s/chip "
              f"({dt*1e3:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--context", type=int, default=2048)
    a = ap.parse_args()
    run(a.batch, a.context)
