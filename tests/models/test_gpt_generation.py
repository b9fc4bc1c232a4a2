"""Greedy generation vs HF .generate (≙ reference
tests/models/test_gpt_generation.py:28) plus sampling sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from xhy_flash_attention_tpu.models.gpt import (
    GPTLMHeadModel,
    gpt2_config_to_gpt_config,
    remap_state_dict_hf_gpt2,
)
from xhy_flash_attention_tpu.utils.generation import decode, sample_logits


def test_greedy_matches_hf_generate():
    cfg_hf = transformers.GPT2Config(
        vocab_size=128, n_positions=64, n_embd=64, n_layer=2, n_head=2,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.GPT2LMHeadModel(cfg_hf).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    cfg = gpt2_config_to_gpt_config(cfg_hf)
    model = GPTLMHeadModel(cfg)
    params = remap_state_dict_hf_gpt2(sd, cfg)

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 128, (2, 10))
    max_length = 24
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor(prompt), max_length=max_length, do_sample=False,
            pad_token_id=0,
        ).numpy()
    seqs, scores = decode(
        model, params, jnp.asarray(prompt, jnp.int32), max_length,
        return_scores=True,
    )
    np.testing.assert_array_equal(np.asarray(seqs), ref)
    assert scores.shape == (2, max_length - 10, cfg.padded_vocab_size)


def test_teacher_forcing_and_eos():
    cfg_hf = transformers.GPT2Config(
        vocab_size=64, n_positions=32, n_embd=64, n_layer=1, n_head=2,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(1)
    hf = transformers.GPT2LMHeadModel(cfg_hf).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    cfg = gpt2_config_to_gpt_config(cfg_hf)
    model = GPTLMHeadModel(cfg)
    params = remap_state_dict_hf_gpt2(sd, cfg)

    teacher = jnp.asarray(
        np.random.default_rng(2).integers(0, 64, (1, 16)), jnp.int32
    )
    seqs, _ = decode(
        model, params, teacher[:, :4], 16, teacher_outputs=teacher
    )
    np.testing.assert_array_equal(np.asarray(seqs[:, 4:]), np.asarray(teacher[:, 4:]))


def test_sampling_top_k_top_p():
    logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 10.0]])
    key = jax.random.PRNGKey(0)
    # greedy
    assert int(sample_logits(logits, key)[0]) == 4
    # top_k=2 only ever samples from {3, 4}
    toks = set(
        int(sample_logits(logits, jax.random.PRNGKey(i), temperature=5.0,
                          top_k=2)[0])
        for i in range(20)
    )
    assert toks <= {3, 4}
    # top_p small keeps only the argmax
    toks = set(
        int(sample_logits(logits, jax.random.PRNGKey(i), temperature=100.0,
                          top_k=0, top_p=1e-6)[0])
        for i in range(10)
    )
    assert toks == {4}
