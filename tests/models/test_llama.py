"""Llama logits parity vs HuggingFace torch (≙ reference
tests/models/test_llama.py — tiny random config, GQA + rotary + SwiGLU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from xhy_flash_attention_tpu.models.gpt import GPTLMHeadModel
from xhy_flash_attention_tpu.models.llama import (
    llama_config_to_gpt_config,
    remap_state_dict_hf_llama,
)


def test_llama_logits_match_hf():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=173, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_dropout=0.0, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf_model = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    cfg = llama_config_to_gpt_config(hf_cfg)
    model = GPTLMHeadModel(cfg)
    params = remap_state_dict_hf_llama(sd, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, hf_cfg.vocab_size, (2, 48))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    out, _ = model.apply(params, jnp.asarray(ids, jnp.int32))
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 2e-3, err
