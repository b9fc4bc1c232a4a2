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
