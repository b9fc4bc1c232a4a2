"""Llama / Llama-2 / Llama-3 on the GPT skeleton.

≙ reference flash_attn/models/llama.py — config translation
(`llama_config_to_gpt2_config`, llama.py:191) plus an HF/Meta state-dict
remap onto the shared decoder skeleton: RMSNorm, SwiGLU MLP, full-head
non-interleaved rotary, GQA, no biases, untied head.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from .gpt import GPTConfig

__all__ = ["llama_config_to_gpt_config", "remap_state_dict_hf_llama"]


def llama_config_to_gpt_config(hf_config, dtype=jnp.float32) -> GPTConfig:
    """transformers LlamaConfig (or MistralConfig) -> GPTConfig."""
    c = hf_config
    window = (-1, -1)
    sw = getattr(c, "sliding_window", None)
    if sw:
        window = (sw - 1, 0)
    return GPTConfig(
        vocab_size=c.vocab_size,
        hidden_size=c.hidden_size,
        num_hidden_layers=c.num_hidden_layers,
        num_attention_heads=c.num_attention_heads,
        num_attention_heads_kv=getattr(c, "num_key_value_heads", None),
        head_dim=getattr(c, "head_dim", None),
        intermediate_size=c.intermediate_size,
        max_position_embeddings=0,  # rotary-only
        activation_function="swiglu",
        rms_norm=True,
        layer_norm_epsilon=c.rms_norm_eps,
        rotary_emb_fraction=1.0,
        rotary_emb_base=getattr(c, "rope_theta", 10000.0),
        rotary_emb_interleaved=False,
        window_size=window,
        tie_word_embeddings=getattr(c, "tie_word_embeddings", False),
        qkv_proj_bias=getattr(c, "attention_bias", False),
        out_proj_bias=getattr(c, "attention_bias", False),
        mlp_fc1_bias=False,
        mlp_fc2_bias=False,
        residual_in_fp32=True,
        dtype=dtype,
    )


def remap_state_dict_hf_llama(state_dict: Dict[str, Any], config: GPTConfig):
    """torch LlamaForCausalLM state_dict (numpy values) -> flax params.

    torch Linear stores (out, in); flax Dense kernels are (in, out) — every
    projection transposes. q/k/v pack into Wqkv columns; gate/up into fc1.
    """

    def t(name):
        return jnp.asarray(np.asarray(state_dict[name]).T)

    def g(name):
        return jnp.asarray(np.asarray(state_dict[name]))

    V = config.padded_vocab_size
    emb = np.asarray(state_dict["model.embed_tokens.weight"])
    if emb.shape[0] < V:
        emb = np.concatenate(
            [emb, np.zeros((V - emb.shape[0], emb.shape[1]), emb.dtype)]
        )
    tied = config.tie_word_embeddings
    params: Dict[str, Any] = {
        "transformer": {
            "embeddings": {},
            "norm_f": {"weight": g("model.norm.weight")},
        },
    }
    if tied:
        params["wte"] = {"embedding": jnp.asarray(emb)}
    else:
        params["transformer"]["embeddings"] = {
            "word_embeddings": {"embedding": jnp.asarray(emb)}
        }
        head = np.asarray(state_dict["lm_head.weight"]).T  # (H, V)
        if head.shape[1] < V:
            head = np.concatenate(
                [head, np.zeros((head.shape[0], V - head.shape[1]), head.dtype)],
                axis=1,
            )
        params["lm_head"] = {"kernel": jnp.asarray(head)}

    for i in range(config.num_hidden_layers):
        p = f"model.layers.{i}."
        wq = t(p + "self_attn.q_proj.weight")
        wk = t(p + "self_attn.k_proj.weight")
        wv = t(p + "self_attn.v_proj.weight")
        wqkv = jnp.concatenate([wq, wk, wv], axis=1)
        gate = t(p + "mlp.gate_proj.weight")
        up = t(p + "mlp.up_proj.weight")
        layer = {
            "norm1": {"weight": g(p + "input_layernorm.weight")},
            "norm2": {"weight": g(p + "post_attention_layernorm.weight")},
            "mixer": {
                "Wqkv": {"kernel": wqkv},
                "out_proj": {"kernel": t(p + "self_attn.o_proj.weight")},
            },
            "mlp": {
                "fc1": {"kernel": jnp.concatenate([gate, up], axis=1)},
                "fc2": {"kernel": t(p + "mlp.down_proj.weight")},
            },
        }
        if config.qkv_proj_bias:
            layer["mixer"]["Wqkv"]["bias"] = jnp.concatenate([
                g(p + "self_attn.q_proj.bias"),
                g(p + "self_attn.k_proj.bias"),
                g(p + "self_attn.v_proj.bias"),
            ])
        params["transformer"][f"layers_{i}"] = layer
    return {"params": params}
