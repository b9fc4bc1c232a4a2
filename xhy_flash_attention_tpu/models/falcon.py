"""Falcon on the GPT skeleton.

≙ reference flash_attn/models/falcon.py — config translation
(falcon_config_to_gpt2_config) + HF remap: MQA (7B, n_kv=1, tied-norm
parallel block) / GQA (40B, dual-norm parallel block), full non-interleaved
rotary, grouped HF Wqkv layout (group, q_per_group..., k, v) split into our
[q; k; v] packing.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from .gpt import GPTConfig

__all__ = ["falcon_config_to_gpt_config", "remap_state_dict_hf_falcon"]


def falcon_config_to_gpt_config(hf_config, dtype=jnp.float32) -> GPTConfig:
    c = hf_config
    n_head = getattr(c, "num_attention_heads", getattr(c, "n_head", None))
    n_layer = getattr(c, "num_hidden_layers", getattr(c, "n_layer", None))
    n_head_kv = getattr(c, "num_kv_heads", getattr(c, "n_head_kv", None))
    if n_head_kv is None:
        n_head_kv = 1 if getattr(c, "multi_query", False) else n_head
    # 40B has 2 norms per layer; inferred from GQA exactly as the reference
    tied_norm = n_head_kv == 1
    return GPTConfig(
        vocab_size=c.vocab_size,
        hidden_size=c.hidden_size,
        num_hidden_layers=n_layer,
        num_attention_heads=n_head,
        num_attention_heads_kv=n_head_kv,
        intermediate_size=c.hidden_size * 4,
        max_position_embeddings=0,
        activation_function="gelu",
        resid_pdrop=c.hidden_dropout,
        attn_pdrop=c.attention_dropout,
        layer_norm_epsilon=c.layer_norm_epsilon,
        initializer_range=c.initializer_range,
        prenorm=True,
        parallel_block=getattr(c, "parallel_attn", True),
        parallel_block_tied_norm=tied_norm,
        rotary_emb_fraction=1.0,
        rotary_emb_interleaved=False,
        tie_word_embeddings=True,
        qkv_proj_bias=getattr(c, "bias", False),
        out_proj_bias=getattr(c, "bias", False),
        mlp_fc1_bias=getattr(c, "bias", False),
        mlp_fc2_bias=getattr(c, "bias", False),
        dtype=dtype,
    )


def _split_grouped_qkv(w: np.ndarray, n_head: int, n_head_kv: int,
                       headdim: int) -> np.ndarray:
    """HF Falcon packs qkv as (group, q_ratio + 2, headdim, in) rows; split
    into our [all q; all k; all v] row order (then transpose for flax)."""
    ratio = n_head // n_head_kv + 2
    shape = w.shape[1:]
    w = w.reshape(n_head_kv, ratio, headdim, *shape)
    wq = w[:, :-2].reshape(n_head * headdim, *shape)
    wk = w[:, -2].reshape(n_head_kv * headdim, *shape)
    wv = w[:, -1].reshape(n_head_kv * headdim, *shape)
    return np.concatenate([wq, wk, wv], axis=0)


def remap_state_dict_hf_falcon(state_dict: Dict[str, Any], config: GPTConfig):
    """torch FalconForCausalLM state_dict (numpy values) -> flax params."""

    def t(name):
        return jnp.asarray(np.asarray(state_dict[name]).T)

    def g(name):
        return jnp.asarray(np.asarray(state_dict[name]))

    n_head = config.num_attention_heads
    n_head_kv = config.num_attention_heads_kv
    headdim = config.hidden_size // n_head
    V = config.padded_vocab_size
    emb = np.asarray(state_dict["transformer.word_embeddings.weight"])
    if emb.shape[0] < V:
        emb = np.concatenate(
            [emb, np.zeros((V - emb.shape[0], emb.shape[1]), emb.dtype)]
        )

    params: Dict[str, Any] = {
        "wte": {"embedding": jnp.asarray(emb)},
        "transformer": {
            "embeddings": {},
            "norm_f": {"weight": g("transformer.ln_f.weight"),
                       "bias": g("transformer.ln_f.bias")},
        },
    }
    for i in range(config.num_hidden_layers):
        p = f"transformer.h.{i}."
        wqkv = _split_grouped_qkv(
            np.asarray(state_dict[p + "self_attention.query_key_value.weight"]),
            n_head, n_head_kv, headdim,
        ).T
        # 7B names the single norm input_layernorm; 40B has ln_attn + ln_mlp
        if p + "input_layernorm.weight" in state_dict:
            n1w, n1b = p + "input_layernorm.weight", p + "input_layernorm.bias"
            norm2 = None
        else:
            n1w, n1b = p + "ln_attn.weight", p + "ln_attn.bias"
            norm2 = {"weight": g(p + "ln_mlp.weight"),
                     "bias": g(p + "ln_mlp.bias")}
        layer: Dict[str, Any] = {
            "norm1": {"weight": g(n1w), "bias": g(n1b)},
            "mixer": {
                "Wqkv": {"kernel": jnp.asarray(wqkv)},
                "out_proj": {"kernel": t(p + "self_attention.dense.weight")},
            },
            "mlp": {
                "fc1": {"kernel": t(p + "mlp.dense_h_to_4h.weight")},
                "fc2": {"kernel": t(p + "mlp.dense_4h_to_h.weight")},
            },
        }
        if norm2 is not None:
            layer["norm2"] = norm2
        params["transformer"][f"layers_{i}"] = layer
    return {"params": params}
