"""Embeddings (≙ reference flash_attn/modules/embedding.py).

GPT2Embeddings (word + learned position) and BertEmbeddings (+ token type).
The TP variants (VocabParallelEmbedding :96, ParallelGPT2Embeddings :141)
are sharding rules, not classes: the embedding table shards over the tensor
axis on the vocab dim and GSPMD inserts the masked-lookup + psum — see
parallel/tp.py.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class GPT2Embeddings(nn.Module):
    embed_dim: int
    vocab_size: int
    max_position_embeddings: int = 0  # 0 => no position embeddings (rotary)
    word_embed_proj_dim: Optional[int] = None  # OPT-style factorized embed
    word_embed: Optional[nn.Module] = None  # shared table for tied lm_head
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, position_ids=None, seqlen_offset=0):
        b, s = input_ids.shape
        init = nn.initializers.normal(stddev=0.02)
        if self.word_embed is not None:
            x = self.word_embed(input_ids)
        elif self.word_embed_proj_dim is None:
            emb = nn.Embed(self.vocab_size, self.embed_dim, dtype=self.dtype,
                           embedding_init=init, name="word_embeddings")
            x = emb(input_ids)
        else:
            emb = nn.Embed(self.vocab_size, self.word_embed_proj_dim,
                           dtype=self.dtype, embedding_init=init,
                           name="word_embeddings")
            x = emb(input_ids)
            x = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                         name="project_in")(x)
        if self.max_position_embeddings > 0:
            if position_ids is None:
                position_ids = seqlen_offset + jnp.arange(s, dtype=jnp.int32)
                position_ids = jnp.broadcast_to(position_ids, (b, s))
            pos_emb = nn.Embed(
                self.max_position_embeddings, self.embed_dim,
                dtype=self.dtype, embedding_init=init,
                name="position_embeddings",
            )
            x = x + pos_emb(position_ids)
        return x


class BertEmbeddings(nn.Module):
    embed_dim: int
    vocab_size: int
    max_position_embeddings: int
    type_vocab_size: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, position_ids=None, token_type_ids=None):
        b, s = input_ids.shape
        init = nn.initializers.normal(stddev=0.02)
        x = nn.Embed(self.vocab_size, self.embed_dim, dtype=self.dtype,
                     embedding_init=init, name="word_embeddings")(input_ids)
        if position_ids is None:
            position_ids = jnp.broadcast_to(
                jnp.arange(s, dtype=jnp.int32), (b, s)
            )
        x = x + nn.Embed(self.max_position_embeddings, self.embed_dim,
                         dtype=self.dtype, embedding_init=init,
                         name="position_embeddings")(position_ids)
        if self.type_vocab_size > 0:
            if token_type_ids is None:
                token_type_ids = jnp.zeros((b, s), jnp.int32)
            x = x + nn.Embed(self.type_vocab_size, self.embed_dim,
                             dtype=self.dtype, embedding_init=init,
                             name="token_type_embeddings")(token_type_ids)
        return x
