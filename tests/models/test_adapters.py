"""OPT / GPT-J / GPT-NeoX / Falcon logits parity vs HuggingFace torch
(≙ reference tests/models/test_{opt,gptj,gpt_neox,falcon}.py — tiny random
configs, fp32, logits must match HF within small tolerance)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from xhy_flash_attention_tpu.models.gpt import GPTLMHeadModel


def _compare(hf_model, cfg, remap, vocab, tol=3e-3, seqlen=48):
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    model = GPTLMHeadModel(cfg)
    params = remap(sd, cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, vocab, (2, seqlen))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    out, _ = model.apply(params, jnp.asarray(ids, jnp.int32))
    out = np.asarray(out)[..., :vocab]
    err = np.abs(out - ref).max()
    assert err < tol, err


@pytest.mark.parametrize("word_embed_proj_dim", [None, 64])
@pytest.mark.parametrize("prenorm", [True, False])
def test_opt_logits_match_hf(word_embed_proj_dim, prenorm):
    from xhy_flash_attention_tpu.models.opt import (
        opt_config_to_gpt_config,
        remap_state_dict_hf_opt,
    )

    hf_cfg = transformers.OPTConfig(
        vocab_size=211, hidden_size=128, ffn_dim=256, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
        do_layer_norm_before=prenorm, dropout=0.0, attention_dropout=0.0,
        word_embed_proj_dim=word_embed_proj_dim or 128,
        activation_function="relu",
    )
    torch.manual_seed(0)
    hf_model = transformers.OPTForCausalLM(hf_cfg).eval()
    cfg = opt_config_to_gpt_config(hf_cfg)
    _compare(hf_model, cfg, remap_state_dict_hf_opt, hf_cfg.vocab_size)


@pytest.mark.parametrize("rotary_dim", [16, 32])
def test_gptj_logits_match_hf(rotary_dim):
    """rotary_dim < head_dim (partial interleaved rotary) and == head_dim."""
    from xhy_flash_attention_tpu.models.gptj import (
        gptj_config_to_gpt_config,
        remap_state_dict_hf_gptj,
    )

    hf_cfg = transformers.GPTJConfig(
        vocab_size=173, n_embd=128, n_layer=2, n_head=4, n_inner=256,
        rotary_dim=rotary_dim, n_positions=128, resid_pdrop=0.0,
        embd_pdrop=0.0, attn_pdrop=0.0, activation_function="gelu_new",
    )
    torch.manual_seed(0)
    hf_model = transformers.GPTJForCausalLM(hf_cfg).eval()
    cfg = gptj_config_to_gpt_config(hf_cfg)
    _compare(hf_model, cfg, remap_state_dict_hf_gptj, hf_cfg.vocab_size)


@pytest.mark.parametrize("rotary_pct", [0.25, 1.0])
@pytest.mark.parametrize("parallel", [True, False])
def test_gpt_neox_logits_match_hf(parallel, rotary_pct):
    from xhy_flash_attention_tpu.models.gpt_neox import (
        gpt_neox_config_to_gpt_config,
        remap_state_dict_hf_gpt_neox,
    )

    hf_cfg = transformers.GPTNeoXConfig(
        vocab_size=173, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=256, rotary_pct=rotary_pct,
        max_position_embeddings=128, use_parallel_residual=parallel,
        hidden_act="gelu", tie_word_embeddings=False,
        attention_dropout=0.0, hidden_dropout=0.0,
    )
    torch.manual_seed(0)
    hf_model = transformers.GPTNeoXForCausalLM(hf_cfg).eval()
    cfg = gpt_neox_config_to_gpt_config(hf_cfg)
    _compare(hf_model, cfg, remap_state_dict_hf_gpt_neox, hf_cfg.vocab_size)


@pytest.mark.parametrize("n_kv", [1, 2])
def test_falcon_logits_match_hf(n_kv):
    from xhy_flash_attention_tpu.models.falcon import (
        falcon_config_to_gpt_config,
        remap_state_dict_hf_falcon,
    )

    hf_cfg = transformers.FalconConfig(
        vocab_size=173, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=n_kv, parallel_attn=True,
        multi_query=(n_kv == 1), new_decoder_architecture=(n_kv > 1),
        bias=False, max_position_embeddings=128,
        attention_dropout=0.0, hidden_dropout=0.0, alibi=False,
    )
    torch.manual_seed(0)
    hf_model = transformers.FalconForCausalLM(hf_cfg).eval()
    cfg = falcon_config_to_gpt_config(hf_cfg)
    _compare(hf_model, cfg, remap_state_dict_hf_falcon, hf_cfg.vocab_size)
