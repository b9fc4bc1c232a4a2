"""Weight-only quantized model (BASELINE config #3: INT8/INT4 projection
matmuls in serving): quantized params + QuantDense modules reproduce the
float model closely, end to end including cached decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xhy_flash_attention_tpu.models.gpt import (
    GPTConfig,
    GPTLMHeadModel,
    quantize_gpt_params,
)


def _cfg(**kw):
    base = dict(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_attention_heads_kv=2,
        intermediate_size=128, max_position_embeddings=0,
        rotary_emb_fraction=1.0, rms_norm=True,
        activation_function="swiglu", tie_word_embeddings=False,
        qkv_proj_bias=False, out_proj_bias=False,
        mlp_fc1_bias=False, mlp_fc2_bias=False, dtype=jnp.float32,
    )
    base.update(kw)
    return GPTConfig(**base)


@pytest.mark.parametrize("wq", ["int8", "int4"])
def test_weight_quant_forward_close_to_float(wq):
    cfg_f = _cfg()
    model_f = GPTLMHeadModel(cfg_f)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 128, (2, 32)), jnp.int32)
    params = model_f.init(jax.random.PRNGKey(0), ids)
    logits_f, _ = model_f.apply(params, ids)

    cfg_q = _cfg(weight_quant=wq)
    model_q = GPTLMHeadModel(cfg_q)
    params_q = quantize_gpt_params(params, cfg_q)
    # quantized tree matches the module's expected structure
    expect = jax.tree_util.tree_structure(
        model_q.init(jax.random.PRNGKey(0), ids[:, :8]))
    assert jax.tree_util.tree_structure(params_q) == expect
    logits_q, _ = model_q.apply(params_q, ids)

    # compare top-1 predictions + bounded logit error (int4 is coarse)
    err = float(jnp.abs(logits_q - logits_f).max())
    scale = float(jnp.abs(logits_f).max())
    tol = 0.05 if wq == "int8" else 0.35
    assert err < tol * scale, (err, scale)
    if wq == "int8":
        agree = float(
            (jnp.argmax(logits_q, -1) == jnp.argmax(logits_f, -1)).mean()
        )
        assert agree > 0.95, agree


def test_weight_quant_cached_decode():
    cfg_q = _cfg(weight_quant="int8")
    model_f = GPTLMHeadModel(_cfg())
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 128, (1, 9)), jnp.int32)
    params = model_f.init(jax.random.PRNGKey(0), ids)
    params_q = quantize_gpt_params(params, cfg_q)
    model_q = GPTLMHeadModel(cfg_q)

    caches = model_q.allocate_kv_caches(1, 64, dtype=jnp.int8)
    logits, caches = model_q.apply(
        params_q, ids, kv_caches=caches, seqlen_offset=0
    )
    tok = int(jnp.argmax(logits[0, -1]))
    logits2, caches = model_q.apply(
        params_q, jnp.asarray([[tok]], jnp.int32), kv_caches=caches,
        seqlen_offset=9,
    )
    assert np.isfinite(np.asarray(logits2)).all()
