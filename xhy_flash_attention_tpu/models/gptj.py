"""GPT-J on the GPT skeleton.

≙ reference flash_attn/models/gptj.py — config translation
(gptj_config_to_gpt2_config) + HF remap: tied-norm parallel block,
interleaved rotary over rotary_dim, untied lm_head *with bias*, no
attention biases.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from .gpt import GPTConfig

__all__ = ["gptj_config_to_gpt_config", "remap_state_dict_hf_gptj"]


def gptj_config_to_gpt_config(hf_config, dtype=jnp.float32) -> GPTConfig:
    c = hf_config
    headdim = c.n_embd // c.n_head
    act = {"gelu_new": "gelu_approx"}.get(c.activation_function,
                                          c.activation_function)
    return GPTConfig(
        vocab_size=c.vocab_size,
        hidden_size=c.n_embd,
        num_hidden_layers=c.n_layer,
        num_attention_heads=c.n_head,
        intermediate_size=c.n_inner,
        max_position_embeddings=0,  # rotary-only
        activation_function=act,
        embd_pdrop=c.embd_pdrop,
        resid_pdrop=c.resid_pdrop,
        attn_pdrop=c.attn_pdrop,
        layer_norm_epsilon=c.layer_norm_epsilon,
        initializer_range=c.initializer_range,
        prenorm=True,
        parallel_block=True,
        parallel_block_tied_norm=True,
        rotary_emb_fraction=c.rotary_dim / headdim,
        rotary_emb_interleaved=True,
        tie_word_embeddings=False,
        qkv_proj_bias=False,
        out_proj_bias=False,
        lm_head_bias=True,
        dtype=dtype,
    )


def remap_state_dict_hf_gptj(state_dict: Dict[str, Any], config: GPTConfig):
    """torch GPTJForCausalLM state_dict (numpy values) -> flax params."""

    def t(name):
        return jnp.asarray(np.asarray(state_dict[name]).T)

    def g(name):
        return jnp.asarray(np.asarray(state_dict[name]))

    V = config.padded_vocab_size
    emb = np.asarray(state_dict["transformer.wte.weight"])
    if emb.shape[0] < V:
        emb = np.concatenate(
            [emb, np.zeros((V - emb.shape[0], emb.shape[1]), emb.dtype)]
        )
    head_w = np.asarray(state_dict["lm_head.weight"]).T
    head_b = np.asarray(state_dict["lm_head.bias"])
    if head_w.shape[1] < V:
        head_w = np.concatenate(
            [head_w, np.zeros((head_w.shape[0], V - head_w.shape[1]),
                              head_w.dtype)], axis=1)
        head_b = np.concatenate([head_b, np.zeros(V - head_b.shape[0],
                                                  head_b.dtype)])

    params: Dict[str, Any] = {
        "transformer": {
            "embeddings": {
                "word_embeddings": {"embedding": jnp.asarray(emb)},
            },
            "norm_f": {"weight": g("transformer.ln_f.weight"),
                       "bias": g("transformer.ln_f.bias")},
        },
        "lm_head": {"kernel": jnp.asarray(head_w),
                    "bias": jnp.asarray(head_b)},
    }
    for i in range(config.num_hidden_layers):
        p = f"transformer.h.{i}."
        wqkv = jnp.concatenate([
            t(p + "attn.q_proj.weight"),
            t(p + "attn.k_proj.weight"),
            t(p + "attn.v_proj.weight"),
        ], axis=1)
        params["transformer"][f"layers_{i}"] = {
            "norm1": {"weight": g(p + "ln_1.weight"),
                      "bias": g(p + "ln_1.bias")},
            "mixer": {
                "Wqkv": {"kernel": wqkv},
                "out_proj": {"kernel": t(p + "attn.out_proj.weight")},
            },
            "mlp": {
                "fc1": {"kernel": t(p + "mlp.fc_in.weight"),
                        "bias": g(p + "mlp.fc_in.bias")},
                "fc2": {"kernel": t(p + "mlp.fc_out.weight"),
                        "bias": g(p + "mlp.fc_out.bias")},
            },
        }
    return {"params": params}
