"""GPT-NeoX / Pythia on the GPT skeleton.

≙ reference flash_attn/models/gpt_neox.py — config translation
(gpt_neox_config_to_gpt2_config) + HF remap: untied-norm parallel residual
(use_parallel_residual), partial non-interleaved rotary (rotary_pct), the
HF per-head-interleaved Wqkv layout ((nheads 3 headdim) -> (3 nheads
headdim)).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from .gpt import GPTConfig

__all__ = ["gpt_neox_config_to_gpt_config", "remap_state_dict_hf_gpt_neox"]


def gpt_neox_config_to_gpt_config(hf_config, dtype=jnp.float32) -> GPTConfig:
    c = hf_config
    act = {"gelu_new": "gelu_approx"}.get(c.hidden_act, c.hidden_act)
    return GPTConfig(
        vocab_size=c.vocab_size,
        hidden_size=c.hidden_size,
        num_hidden_layers=c.num_hidden_layers,
        num_attention_heads=c.num_attention_heads,
        intermediate_size=c.intermediate_size,
        max_position_embeddings=0,  # rotary-only
        activation_function=act,
        layer_norm_epsilon=c.layer_norm_eps,
        initializer_range=c.initializer_range,
        rotary_emb_fraction=c.rotary_pct,
        rotary_emb_base=getattr(c, "rotary_emb_base", 10000.0),
        rotary_emb_interleaved=False,
        prenorm=True,
        parallel_block=c.use_parallel_residual,
        parallel_block_tied_norm=False,
        tie_word_embeddings=c.tie_word_embeddings,
        dtype=dtype,
    )


def _deinterleave_qkv(w: np.ndarray, nheads: int, headdim: int) -> np.ndarray:
    """(nheads*3*headdim, ...) -> (3*nheads*headdim, ...)"""
    shape = w.shape[1:]
    w = w.reshape(nheads, 3, headdim, *shape)
    return np.moveaxis(w, 1, 0).reshape(3 * nheads * headdim, *shape)


def remap_state_dict_hf_gpt_neox(state_dict: Dict[str, Any], config: GPTConfig):
    """torch GPTNeoXForCausalLM state_dict (numpy values) -> flax params."""

    def t(name):
        return jnp.asarray(np.asarray(state_dict[name]).T)

    def g(name):
        return jnp.asarray(np.asarray(state_dict[name]))

    nheads = config.num_attention_heads
    headdim = config.hidden_size // nheads
    V = config.padded_vocab_size
    emb = np.asarray(state_dict["gpt_neox.embed_in.weight"])
    if emb.shape[0] < V:
        emb = np.concatenate(
            [emb, np.zeros((V - emb.shape[0], emb.shape[1]), emb.dtype)]
        )

    params: Dict[str, Any] = {
        "transformer": {
            "embeddings": {},
            "norm_f": {"weight": g("gpt_neox.final_layer_norm.weight"),
                       "bias": g("gpt_neox.final_layer_norm.bias")},
        },
    }
    if config.tie_word_embeddings:
        params["wte"] = {"embedding": jnp.asarray(emb)}
    else:
        params["transformer"]["embeddings"] = {
            "word_embeddings": {"embedding": jnp.asarray(emb)}
        }
        head = np.asarray(state_dict["embed_out.weight"]).T
        if head.shape[1] < V:
            head = np.concatenate(
                [head, np.zeros((head.shape[0], V - head.shape[1]),
                                head.dtype)], axis=1)
        params["lm_head"] = {"kernel": jnp.asarray(head)}

    for i in range(config.num_hidden_layers):
        p = f"gpt_neox.layers.{i}."
        wqkv = _deinterleave_qkv(
            np.asarray(state_dict[p + "attention.query_key_value.weight"]),
            nheads, headdim,
        ).T  # -> (in, 3*h*d) flax layout
        bqkv = _deinterleave_qkv(
            np.asarray(state_dict[p + "attention.query_key_value.bias"]),
            nheads, headdim,
        )
        params["transformer"][f"layers_{i}"] = {
            "norm1": {"weight": g(p + "input_layernorm.weight"),
                      "bias": g(p + "input_layernorm.bias")},
            "norm2": {"weight": g(p + "post_attention_layernorm.weight"),
                      "bias": g(p + "post_attention_layernorm.bias")},
            "mixer": {
                "Wqkv": {"kernel": jnp.asarray(wqkv),
                         "bias": jnp.asarray(bqkv)},
                "out_proj": {"kernel": t(p + "attention.dense.weight"),
                             "bias": g(p + "attention.dense.bias")},
            },
            "mlp": {
                "fc1": {"kernel": t(p + "mlp.dense_h_to_4h.weight"),
                        "bias": g(p + "mlp.dense_h_to_4h.bias")},
                "fc2": {"kernel": t(p + "mlp.dense_4h_to_h.weight"),
                        "bias": g(p + "mlp.dense_4h_to_h.bias")},
            },
        }
    return {"params": params}
