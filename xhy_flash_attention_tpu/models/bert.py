"""BERT with flash attention (≙ reference flash_attn/models/bert.py).

Postnorm encoder on the shared Block (prenorm=False branch ≙ reference
block.py postnorm wiring), bidirectional Pallas flash attention with
key-padding handled by segment ids.

The reference's varlen path unpads the batch to (total_nnz, d) and runs the
varlen kernel (bert.py:296,370 with bert_padding.unpad_input); on TPU shapes
must be static under jit, so padding is masked inside the kernel via segment
ids instead — the same kernel-level mechanism, without the gather/scatter.
The masked-token-only MLM head (dropout-add-LN subset path in the reference)
becomes a post-hoc gather: XLA fuses the head matmul over all positions, and
`masked_tokens_only` selects rows before the (large) vocab projection where
it actually saves FLOPs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..modules.block import Block
from ..modules.embedding import BertEmbeddings
from ..modules.mha import MHA
from ..modules.mlp import Mlp

__all__ = [
    "BertConfig",
    "BertModel",
    "BertForPreTraining",
    "bert_config_to_config",
    "remap_state_dict_hf_bert",
]


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_act: str = "gelu_approx"
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    pad_vocab_size_multiple: int = 1
    use_pooler: bool = True
    dtype: Any = jnp.float32

    @property
    def padded_vocab_size(self) -> int:
        m = self.pad_vocab_size_multiple
        return (self.vocab_size + m - 1) // m * m


class BertModel(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, deterministic=True):
        """Returns (sequence_output (b, s, d), pooled_output or None)."""
        c = self.config
        x = BertEmbeddings(
            embed_dim=c.hidden_size,
            vocab_size=c.padded_vocab_size,
            max_position_embeddings=c.max_position_embeddings,
            type_vocab_size=c.type_vocab_size,
            dtype=c.dtype,
            name="embeddings",
        )(input_ids, position_ids, token_type_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="emb_ln")(x).astype(c.dtype)
        if not deterministic and c.hidden_dropout_prob > 0:
            keep = 1.0 - c.hidden_dropout_prob
            x = x * jax.random.bernoulli(
                self.make_rng("dropout"), keep, x.shape
            ).astype(x.dtype) / keep

        # padding tokens get a distinct segment so they never mix with real
        # tokens (kernel-level masking ≙ the reference varlen unpad path)
        if attention_mask is not None:
            seg = jnp.asarray(attention_mask, jnp.int32)
        else:
            seg = jnp.ones(input_ids.shape, jnp.int32)

        mixer = lambda name: MHA(
            embed_dim=c.hidden_size,
            num_heads=c.num_attention_heads,
            causal=False,
            dropout=c.attention_probs_dropout_prob,
            dtype=c.dtype,
            name=name,
        )
        for i in range(c.num_hidden_layers):
            x, _, _ = Block(
                dim=c.hidden_size,
                mixer=lambda *, name: mixer(name),
                mlp=lambda *, name: Mlp(
                    hidden_features=c.intermediate_size,
                    activation=c.hidden_act, dtype=c.dtype, name=name,
                ),
                norm_eps=c.layer_norm_eps,
                prenorm=False,
                resid_dropout1=c.hidden_dropout_prob,
                resid_dropout2=c.hidden_dropout_prob,
                name=f"layers_{i}",
            )(x, deterministic=deterministic,
              q_segment_ids=seg, kv_segment_ids=seg)

        pooled = None
        if c.use_pooler:
            pooled = nn.tanh(nn.Dense(c.hidden_size, dtype=c.dtype,
                                      name="pooler")(x[:, 0]))
        return x, pooled


class BertForPreTraining(nn.Module):
    """MLM + NSP heads (≙ reference BertForPreTraining, bert.py:370)."""

    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, deterministic=True,
                 masked_positions: Optional[jax.Array] = None):
        """masked_positions: optional (b, n_masked) int32 — when given, the
        vocab projection runs only on those rows (≙ the reference's
        dense_seq_output/masked-token subset path, bert.py:370+)."""
        c = self.config
        bert = BertModel(c, name="bert")
        seq_out, pooled = bert(input_ids, attention_mask, token_type_ids,
                               position_ids, deterministic)
        if masked_positions is not None:
            seq_out = jnp.take_along_axis(
                seq_out, masked_positions[:, :, None], axis=1
            )
        # MLM transform: dense + act + LN, decoder tied to word embeddings
        h = nn.Dense(c.hidden_size, dtype=c.dtype, name="mlm_dense")(seq_out)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="mlm_ln")(h).astype(c.dtype)
        # decoder weights are loaded tied to the embedding table by the remap
        mlm_logits = nn.Dense(c.padded_vocab_size, dtype=c.dtype,
                              name="mlm_decoder")(h)
        nsp_logits = None
        if pooled is not None:
            nsp_logits = nn.Dense(2, dtype=c.dtype,
                                  name="seq_relationship")(pooled)
        return mlm_logits, nsp_logits


def bert_config_to_config(hf_config, dtype=jnp.float32) -> BertConfig:
    c = hf_config
    act = {"gelu": "gelu", "gelu_new": "gelu_approx"}.get(
        c.hidden_act, c.hidden_act
    )
    return BertConfig(
        vocab_size=c.vocab_size,
        hidden_size=c.hidden_size,
        num_hidden_layers=c.num_hidden_layers,
        num_attention_heads=c.num_attention_heads,
        intermediate_size=c.intermediate_size,
        max_position_embeddings=c.max_position_embeddings,
        type_vocab_size=c.type_vocab_size,
        hidden_act=act,
        layer_norm_eps=c.layer_norm_eps,
        hidden_dropout_prob=c.hidden_dropout_prob,
        attention_probs_dropout_prob=c.attention_probs_dropout_prob,
        dtype=dtype,
    )


def remap_state_dict_hf_bert(state_dict: Dict[str, Any], config: BertConfig):
    """torch BertModel/BertForPreTraining state_dict (numpy) -> flax params.

    ≙ reference remap_state_dict (models/bert.py:448). Handles both bare
    ('embeddings.*') and prefixed ('bert.embeddings.*') checkpoints.
    """
    import numpy as np

    sd = {k.removeprefix("bert."): v for k, v in state_dict.items()}

    def t(name):
        return jnp.asarray(np.asarray(sd[name]).T)

    def g(name):
        return jnp.asarray(np.asarray(sd[name]))

    V = config.padded_vocab_size
    emb = np.asarray(sd["embeddings.word_embeddings.weight"])
    if emb.shape[0] < V:
        emb = np.concatenate(
            [emb, np.zeros((V - emb.shape[0], emb.shape[1]), emb.dtype)]
        )
    params: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": {"embedding": jnp.asarray(emb)},
            "position_embeddings": {
                "embedding": g("embeddings.position_embeddings.weight")
            },
            "token_type_embeddings": {
                "embedding": g("embeddings.token_type_embeddings.weight")
            },
        },
        "emb_ln": {"scale": g("embeddings.LayerNorm.weight"),
                   "bias": g("embeddings.LayerNorm.bias")},
    }
    if config.use_pooler and "pooler.dense.weight" in sd:
        params["pooler"] = {"kernel": t("pooler.dense.weight"),
                            "bias": g("pooler.dense.bias")}
    for i in range(config.num_hidden_layers):
        p = f"encoder.layer.{i}."
        wqkv = jnp.concatenate([
            t(p + "attention.self.query.weight"),
            t(p + "attention.self.key.weight"),
            t(p + "attention.self.value.weight"),
        ], axis=1)
        bqkv = jnp.concatenate([
            g(p + "attention.self.query.bias"),
            g(p + "attention.self.key.bias"),
            g(p + "attention.self.value.bias"),
        ])
        params[f"layers_{i}"] = {
            "mixer": {
                "Wqkv": {"kernel": wqkv, "bias": bqkv},
                "out_proj": {"kernel": t(p + "attention.output.dense.weight"),
                             "bias": g(p + "attention.output.dense.bias")},
            },
            "norm1": {"weight": g(p + "attention.output.LayerNorm.weight"),
                      "bias": g(p + "attention.output.LayerNorm.bias")},
            "mlp": {
                "fc1": {"kernel": t(p + "intermediate.dense.weight"),
                        "bias": g(p + "intermediate.dense.bias")},
                "fc2": {"kernel": t(p + "output.dense.weight"),
                        "bias": g(p + "output.dense.bias")},
            },
            "norm2": {"weight": g(p + "output.LayerNorm.weight"),
                      "bias": g(p + "output.LayerNorm.bias")},
        }
    return {"params": params}
