"""OPT on the GPT skeleton.

≙ reference flash_attn/models/opt.py — config translation
(opt_config_to_gpt2_config, opt.py:79) + HF state-dict remap
(remap_state_dict_hf_opt, opt.py:14): learned positions with the HF
2-row padding offset stripped, optional factorized embedding
(project_in/project_out for opt-350m), postnorm for do_layer_norm_before=False.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from .gpt import GPTConfig

__all__ = ["opt_config_to_gpt_config", "remap_state_dict_hf_opt"]


def opt_config_to_gpt_config(hf_config, dtype=jnp.float32) -> GPTConfig:
    c = hf_config
    assert c.layerdrop == 0.0
    assert c.layer_norm_elementwise_affine
    word_embed_proj_dim = (
        None if c.word_embed_proj_dim == c.hidden_size else c.word_embed_proj_dim
    )
    act = {"gelu_new": "gelu_approx"}.get(c.activation_function,
                                          c.activation_function)
    return GPTConfig(
        vocab_size=c.vocab_size,
        hidden_size=c.hidden_size,
        num_hidden_layers=c.num_hidden_layers,
        num_attention_heads=c.num_attention_heads,
        intermediate_size=c.ffn_dim,
        max_position_embeddings=c.max_position_embeddings,
        activation_function=act,
        embd_pdrop=c.dropout,
        resid_pdrop=c.dropout,
        attn_pdrop=c.attention_dropout,
        initializer_range=c.init_std,
        prenorm=c.do_layer_norm_before,
        word_embed_proj_dim=word_embed_proj_dim,
        tie_word_embeddings=True,
        dtype=dtype,
    )


def remap_state_dict_hf_opt(state_dict: Dict[str, Any], config: GPTConfig):
    """torch OPTForCausalLM state_dict (numpy values) -> flax params."""

    sd = dict(state_dict)
    # OPT-350m stores keys under 'decoder.' instead of 'model.decoder.'
    sd = {
        (k if k.startswith("model.decoder.") else "model.decoder." + k.removeprefix("decoder."))
        if (k.startswith("decoder.") or k.startswith("model.decoder.")) else k: v
        for k, v in sd.items()
    }

    def t(name):
        return jnp.asarray(np.asarray(sd[name]).T)

    def g(name):
        return jnp.asarray(np.asarray(sd[name]))

    p0 = "model.decoder."
    V = config.padded_vocab_size
    emb = np.asarray(sd[p0 + "embed_tokens.weight"])
    if emb.shape[0] < V:
        emb = np.concatenate(
            [emb, np.zeros((V - emb.shape[0], emb.shape[1]), emb.dtype)]
        )
    # HF reserves the first 2 position rows for padding (OPT offset)
    pos = np.asarray(sd[p0 + "embed_positions.weight"])[2:]

    params: Dict[str, Any] = {
        "wte": {"embedding": jnp.asarray(emb)},
        "transformer": {
            "embeddings": {
                "position_embeddings": {"embedding": jnp.asarray(pos)},
            },
        },
    }
    if config.word_embed_proj_dim is not None:
        params["transformer"]["embeddings"]["project_in"] = {
            "kernel": t(p0 + "project_in.weight")
        }
        params["project_out"] = {"kernel": t(p0 + "project_out.weight")}
    if config.prenorm:
        # prenorm checkpoints name it final_layer_norm (or layer_norm for 175B)
        fln = (p0 + "final_layer_norm.weight" if p0 + "final_layer_norm.weight" in sd
               else p0 + "layer_norm.weight")
        params["transformer"]["norm_f"] = {
            "weight": g(fln), "bias": g(fln.removesuffix("weight") + "bias"),
        }

    for i in range(config.num_hidden_layers):
        p = f"{p0}layers.{i}."
        wqkv = jnp.concatenate([
            t(p + "self_attn.q_proj.weight"),
            t(p + "self_attn.k_proj.weight"),
            t(p + "self_attn.v_proj.weight"),
        ], axis=1)
        bqkv = jnp.concatenate([
            g(p + "self_attn.q_proj.bias"),
            g(p + "self_attn.k_proj.bias"),
            g(p + "self_attn.v_proj.bias"),
        ])
        params["transformer"][f"layers_{i}"] = {
            "norm1": {"weight": g(p + "self_attn_layer_norm.weight"),
                      "bias": g(p + "self_attn_layer_norm.bias")},
            "norm2": {"weight": g(p + "final_layer_norm.weight"),
                      "bias": g(p + "final_layer_norm.bias")},
            "mixer": {
                "Wqkv": {"kernel": wqkv, "bias": bqkv},
                "out_proj": {"kernel": t(p + "self_attn.out_proj.weight"),
                             "bias": g(p + "self_attn.out_proj.bias")},
            },
            "mlp": {
                "fc1": {"kernel": t(p + "fc1.weight"),
                        "bias": g(p + "fc1.bias")},
                "fc2": {"kernel": t(p + "fc2.weight"),
                        "bias": g(p + "fc2.bias")},
            },
        }
    return {"params": params}
