"""Mixtral (MoE Llama) on the GPT skeleton.

No reference counterpart — the reference repo has no MoE models — but the
build targets Mixtral-8x7B prefill (BASELINE config #4), so this follows the
same adapter pattern as models/llama.py: a config translation plus an HF
state-dict remap, with the MLP swapped for modules/moe.MoEMlp.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from .gpt import GPTConfig

__all__ = ["mixtral_config_to_gpt_config", "remap_state_dict_hf_mixtral"]


def mixtral_config_to_gpt_config(hf_config, dtype=jnp.float32) -> GPTConfig:
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
        num_attention_heads_kv=c.num_key_value_heads,
        intermediate_size=c.intermediate_size,
        max_position_embeddings=0,  # rotary-only
        activation_function="swiglu",
        rms_norm=True,
        layer_norm_epsilon=c.rms_norm_eps,
        rotary_emb_fraction=1.0,
        rotary_emb_base=getattr(c, "rope_theta", 1e6),
        window_size=window,
        tie_word_embeddings=getattr(c, "tie_word_embeddings", False),
        qkv_proj_bias=False,
        out_proj_bias=False,
        mlp_fc1_bias=False,
        mlp_fc2_bias=False,
        num_local_experts=c.num_local_experts,
        num_experts_per_tok=c.num_experts_per_tok,
        dtype=dtype,
    )


def remap_state_dict_hf_mixtral(state_dict: Dict[str, Any],
                                config: GPTConfig):
    """torch MixtralForCausalLM state_dict (numpy values) -> flax params.

    HF experts store w1 (gate), w3 (up), w2 (down) per expert as (out, in);
    MoEMlp batches them as w1 (E, d, 2*inner) [gate;up] and w2 (E, inner, d).
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
    params: Dict[str, Any] = {
        "transformer": {
            "embeddings": {
                "word_embeddings": {"embedding": jnp.asarray(emb)}
            },
            "norm_f": {"weight": g("model.norm.weight")},
        },
    }
    head = np.asarray(state_dict["lm_head.weight"]).T
    if head.shape[1] < V:
        head = np.concatenate(
            [head, np.zeros((head.shape[0], V - head.shape[1]), head.dtype)],
            axis=1,
        )
    params["lm_head"] = {"kernel": jnp.asarray(head)}

    E = config.num_local_experts
    for i in range(config.num_hidden_layers):
        p = f"model.layers.{i}."
        wqkv = jnp.concatenate([
            t(p + "self_attn.q_proj.weight"),
            t(p + "self_attn.k_proj.weight"),
            t(p + "self_attn.v_proj.weight"),
        ], axis=1)
        moe = p + "block_sparse_moe."
        w1 = np.stack([
            np.concatenate([
                np.asarray(state_dict[f"{moe}experts.{e}.w1.weight"]).T,
                np.asarray(state_dict[f"{moe}experts.{e}.w3.weight"]).T,
            ], axis=1)
            for e in range(E)
        ])  # (E, d, 2*inner)
        w2 = np.stack([
            np.asarray(state_dict[f"{moe}experts.{e}.w2.weight"]).T
            for e in range(E)
        ])  # (E, inner, d)
        params["transformer"][f"layers_{i}"] = {
            "norm1": {"weight": g(p + "input_layernorm.weight")},
            "norm2": {"weight": g(p + "post_attention_layernorm.weight")},
            "mixer": {
                "Wqkv": {"kernel": wqkv},
                "out_proj": {"kernel": t(p + "self_attn.o_proj.weight")},
            },
            "mlp": {
                "gate": {"kernel": t(moe + "gate.weight")},
                "w1": jnp.asarray(w1),
                "w2": jnp.asarray(w2),
            },
        }
    return {"params": params}
