"""GPT-2 logits parity vs HuggingFace torch (≙ reference tests/models/test_gpt.py:
same model-equivalence strategy, tiny random-initialized config on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from xhy_flash_attention_tpu.models.gpt import (
    GPTConfig,
    GPTLMHeadModel,
    gpt2_config_to_gpt_config,
    remap_state_dict_hf_gpt2,
)


def _hf_gpt2_tiny():
    cfg = transformers.GPT2Config(
        vocab_size=211, n_positions=128, n_embd=128, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    model = transformers.GPT2LMHeadModel(cfg).eval()
    return cfg, model


def test_gpt2_logits_match_hf():
    hf_cfg, hf_model = _hf_gpt2_tiny()
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    cfg = gpt2_config_to_gpt_config(hf_cfg)
    model = GPTLMHeadModel(cfg)
    params = remap_state_dict_hf_gpt2(sd, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, hf_cfg.vocab_size, (2, 64))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    out, _ = model.apply(params, jnp.asarray(ids, jnp.int32))
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 2e-3, err


def test_gpt2_decode_matches_prefill():
    """Incremental decode with KV cache == full forward (≙ reference
    test_gpt_generation CG/eager equivalence idea)."""
    hf_cfg, hf_model = _hf_gpt2_tiny()
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    cfg = gpt2_config_to_gpt_config(hf_cfg)
    model = GPTLMHeadModel(cfg)
    params = remap_state_dict_hf_gpt2(sd, cfg)

    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, hf_cfg.vocab_size, (1, 24)), jnp.int32)
    full_logits, _ = model.apply(params, ids)

    caches = model.allocate_kv_caches(1, 64)
    prefill_logits, caches = model.apply(
        params, ids[:, :16], kv_caches=caches, seqlen_offset=0
    )
    assert jnp.allclose(prefill_logits, full_logits[:, :16], atol=1e-3)
    logits_steps = []
    for t in range(16, 24):
        step_logits, caches = model.apply(
            params, ids[:, t : t + 1], kv_caches=caches,
            seqlen_offset=jnp.int32(t),
        )
        logits_steps.append(step_logits[:, 0])
    dec = jnp.stack(logits_steps, axis=1)
    err = float(jnp.abs(dec - full_logits[:, 16:24]).max())
    assert err < 2e-3, err


def test_megatron_remap_shapes():
    """remap_state_dict_megatron: keys, de-interleave, vocab padding."""
    import numpy as np
    from xhy_flash_attention_tpu.models.gpt import (
        GPTConfig, GPTLMHeadModel, remap_state_dict_megatron,
    )

    h, d, hidden, V, L = 4, 16, 64, 100, 2
    cfg = GPTConfig(vocab_size=V, hidden_size=hidden, num_hidden_layers=L,
                    num_attention_heads=h, intermediate_size=128,
                    max_position_embeddings=32, pad_vocab_size_multiple=16,
                    dtype=jnp.float32)
    rng = np.random.default_rng(0)
    sd = {
        "language_model.embedding.word_embeddings.weight":
            rng.standard_normal((V, hidden)).astype(np.float32),
        "language_model.embedding.position_embeddings.weight":
            rng.standard_normal((32, hidden)).astype(np.float32),
        "language_model.encoder.final_layernorm.weight": np.ones(hidden, np.float32),
        "language_model.encoder.final_layernorm.bias": np.zeros(hidden, np.float32),
    }
    for i in range(L):
        p = f"language_model.encoder.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(hidden, np.float32)
        sd[p + "input_layernorm.bias"] = np.zeros(hidden, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(hidden, np.float32)
        sd[p + "post_attention_layernorm.bias"] = np.zeros(hidden, np.float32)
        sd[p + "self_attention.query_key_value.weight"] = \
            rng.standard_normal((3 * hidden, hidden)).astype(np.float32)
        sd[p + "self_attention.query_key_value.bias"] = \
            rng.standard_normal(3 * hidden).astype(np.float32)
        sd[p + "self_attention.dense.weight"] = \
            rng.standard_normal((hidden, hidden)).astype(np.float32)
        sd[p + "self_attention.dense.bias"] = np.zeros(hidden, np.float32)
        sd[p + "mlp.dense_h_to_4h.weight"] = \
            rng.standard_normal((128, hidden)).astype(np.float32)
        sd[p + "mlp.dense_h_to_4h.bias"] = np.zeros(128, np.float32)
        sd[p + "mlp.dense_4h_to_h.weight"] = \
            rng.standard_normal((hidden, 128)).astype(np.float32)
        sd[p + "mlp.dense_4h_to_h.bias"] = np.zeros(hidden, np.float32)

    params = remap_state_dict_megatron(sd, cfg)
    model = GPTLMHeadModel(cfg)
    ids = jnp.asarray(rng.integers(0, V, (1, 16)), jnp.int32)
    logits, _ = model.apply(params, ids)
    assert logits.shape == (1, 16, cfg.padded_vocab_size)
    # de-interleave check: q rows of Wqkv = rows h*[0,3) stride pattern
    w_meg = sd["language_model.encoder.layers.0.self_attention.query_key_value.weight"]
    w_flax = np.asarray(
        params["params"]["transformer"]["layers_0"]["mixer"]["Wqkv"]["kernel"]
    )
    # flax kernel is (in, out): column q-head0 dims = megatron rows 0:d of head0
    np.testing.assert_allclose(w_flax[:, :d], w_meg[:d].T, atol=0)
