"""Llama-family logits parity vs HuggingFace torch (≙ reference
tests/models/test_llama.py — tiny random configs covering the adapter's
distinguishing axes: GQA vs MHA head counts, rope-theta variants, and the
Mistral-style sliding-window config that rides the same remap)."""

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


def _compare_llama(hf_model, hf_cfg, seqlen=48, tol=2e-3):
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    cfg = llama_config_to_gpt_config(hf_cfg)
    model = GPTLMHeadModel(cfg)
    params = remap_state_dict_hf_llama(sd, cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, hf_cfg.vocab_size, (2, seqlen))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    out, _ = model.apply(params, jnp.asarray(ids, jnp.int32))
    err = np.abs(np.asarray(out)[..., : hf_cfg.vocab_size] - ref).max()
    assert err < tol, err


@pytest.mark.parametrize("rope_theta", [10000.0, 500000.0])
@pytest.mark.parametrize("num_kv_heads", [2, 4])
def test_llama_logits_match_hf(num_kv_heads, rope_theta):
    """GQA (kv=2) vs MHA (kv=4) head layouts x Llama-2/Llama-3 rope bases."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=173, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=num_kv_heads,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        rope_theta=rope_theta,
        attention_dropout=0.0, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf_model = transformers.LlamaForCausalLM(hf_cfg).eval()
    _compare_llama(hf_model, hf_cfg)


def test_llama_tied_embeddings():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=173, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        attention_dropout=0.0, tie_word_embeddings=True,
    )
    torch.manual_seed(1)
    hf_model = transformers.LlamaForCausalLM(hf_cfg).eval()
    _compare_llama(hf_model, hf_cfg)


def test_mistral_sliding_window_logits_match_hf():
    """Mistral = Llama remap + sliding_window -> kernel window_size; the
    window must actually bind (seqlen > window)."""
    hf_cfg = transformers.MistralConfig(
        vocab_size=173, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        rope_theta=10000.0, sliding_window=16,
        attention_dropout=0.0, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf_model = transformers.MistralForCausalLM(hf_cfg).eval()
    cfg = llama_config_to_gpt_config(hf_cfg)
    assert cfg.window_size == (15, 0), cfg.window_size
    _compare_llama(hf_model, hf_cfg, seqlen=48)
