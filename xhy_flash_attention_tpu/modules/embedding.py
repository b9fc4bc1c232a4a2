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
    vocab_size: int  # local (already divided) when tp_axis is set
    max_position_embeddings: int = 0  # 0 => no position embeddings (rotary)
    word_embed_proj_dim: Optional[int] = None  # OPT-style factorized embed
    word_embed: Optional[nn.Module] = None  # shared table for tied lm_head
    tp_axis: Optional[str] = None  # vocab-parallel (≙ VocabParallelEmbedding)
    sequence_parallel: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, position_ids=None, seqlen_offset=0):
        b, s = input_ids.shape
        init = nn.initializers.normal(stddev=0.02)
        if self.tp_axis is not None:
            # vocab-parallel lookup: masked local gather + psum
            # (≙ VocabParallelEmbedding, modules/embedding.py:96)
            start = jax.lax.axis_index(self.tp_axis) * self.vocab_size
            local_ids = input_ids - start
            valid = (local_ids >= 0) & (local_ids < self.vocab_size)
            local_ids = jnp.clip(local_ids, 0, self.vocab_size - 1)
        else:
            local_ids, valid = input_ids, None
        if self.word_embed is not None:
            x = self.word_embed(local_ids)
            if self.word_embed_proj_dim is not None:
                # factorized embedding shares the small table; project up
                x = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                             name="project_in")(x)
        elif self.word_embed_proj_dim is None:
            emb = nn.Embed(self.vocab_size, self.embed_dim, dtype=self.dtype,
                           embedding_init=init, name="word_embeddings")
            x = emb(local_ids)
        else:
            emb = nn.Embed(self.vocab_size, self.word_embed_proj_dim,
                           dtype=self.dtype, embedding_init=init,
                           name="word_embeddings")
            x = emb(local_ids)
            x = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                         name="project_in")(x)
        if valid is not None:
            from ..parallel.collectives import reduce_from_tp_region
            x = jnp.where(valid[:, :, None], x, 0)
            x = reduce_from_tp_region(x, self.tp_axis)
        if self.max_position_embeddings > 0:
            if position_ids is None:
                off = jnp.asarray(seqlen_offset)
                if off.ndim == 1:  # per-sample offsets (ragged decode)
                    position_ids = off[:, None] + jnp.arange(s, dtype=jnp.int32)
                else:
                    position_ids = jnp.broadcast_to(
                        off + jnp.arange(s, dtype=jnp.int32), (b, s)
                    )
            pos_emb = nn.Embed(
                self.max_position_embeddings, self.embed_dim,
                dtype=self.dtype, embedding_init=init,
                name="position_embeddings",
            )
            x = x + pos_emb(position_ids)
        if self.tp_axis is not None and self.sequence_parallel:
            # emit sequence-sharded activations (≙ ParallelGPT2Embeddings
            # + SP flattening, models/gpt.py:362-366)
            x = x.reshape(
                b, jax.lax.psum(1, self.tp_axis), -1, x.shape[-1]
            )[:, jax.lax.axis_index(self.tp_axis)]
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
