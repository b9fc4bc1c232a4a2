"""Decoding loop + sampling (≙ reference flash_attn/utils/generation.py).

The reference's decode loop (:73-158) is eager token-by-token with an
optional CUDA-graph cache (:202-300) to kill launch overhead. On TPU the
same effect comes from jit + static shapes: the whole decode loop is one
compiled `lax.while_loop` over a fixed-capacity buffer, and prompt lengths
are bucketed (≙ seqlen_to_seqlen_type, :187-199) so recompiles are rare.

Sampling supports greedy / temperature / top-k / top-p (:34-70) and
teacher forcing (`teacher_outputs`) for tests.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = ["sample_logits", "decode", "GenerationMixin", "InferenceParams"]


@dataclasses.dataclass
class InferenceParams:
    """KV-cache container (≙ reference InferenceParams, generation.py:20-32).

    Functional: `caches` is a list of per-layer (k, v) arrays; seqlen_offset
    advances after each call.
    """

    max_seqlen: int
    max_batch_size: int
    caches: Any = None
    seqlen_offset: int = 0


def sample_logits(logits, key, temperature: float = 1.0, top_k: int = 1,
                  top_p: float = 0.0):
    """≙ reference sample() (generation.py:34-70). logits (b, vocab)."""
    if top_k == 1 and top_p == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32)
    if temperature != 1.0:
        logits = logits / temperature
    v = logits.shape[-1]
    if top_k > 0 and top_k < v:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p > 0.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest set with cumulative prob >= top_p
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], 1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def _pad_to_bucket(x, multiple=128):
    s = x.shape[1]
    pad = (-s) % multiple
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x, s


def decode(
    model,
    params,
    input_ids: jax.Array,
    max_length: int,
    *,
    prompt_lens: Optional[jax.Array] = None,
    temperature: float = 1.0,
    top_k: int = 1,
    top_p: float = 0.0,
    eos_token_id: Optional[int] = None,
    teacher_outputs: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    return_scores: bool = False,
    cache_dtype=None,
):
    """Prefill + jitted while-loop decode (≙ reference decode, :73-158).

    input_ids: (b, prompt_len) right-padded (use prompt_lens for ragged).
    Returns (sequences (b, max_length), scores (b, steps, vocab) | None).
    """
    b, prompt_len = input_ids.shape
    if prompt_lens is None:
        prompt_lens = jnp.full((b,), prompt_len, jnp.int32)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    caches = model.allocate_kv_caches(b, max_length, dtype=cache_dtype)

    sequences = jnp.zeros((b, max_length), jnp.int32)
    sequences = jax.lax.dynamic_update_slice(sequences, input_ids, (0, 0))

    # ---- prefill (prompt path, causal) ----
    logits, caches = model.apply(params, input_ids, kv_caches=caches,
                                 seqlen_offset=0)
    # last valid prompt token's logits per sample
    last = jnp.take_along_axis(
        logits, (prompt_lens - 1)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]

    num_steps = max_length - prompt_len
    vocab = logits.shape[-1]

    def get_token(step, logits, key):
        if teacher_outputs is not None:
            return jax.lax.dynamic_index_in_dim(
                teacher_outputs, prompt_len + step, axis=1, keepdims=False
            ).astype(jnp.int32)
        return sample_logits(logits, key, temperature, top_k, top_p)

    rngs = jax.random.split(rng, max(num_steps, 1))
    scores0 = (
        jnp.zeros((b, num_steps, vocab), jnp.float32) if return_scores else None
    )

    def cond(state):
        step, _, _, _, finished, _ = state
        return jnp.logical_and(step < num_steps, ~jnp.all(finished))

    def body(state):
        step, seqs, caches, last_logits, finished, scores = state
        key = rngs[jnp.minimum(step, num_steps - 1)]
        tok = get_token(step, last_logits, key)
        if eos_token_id is not None:
            tok = jnp.where(finished, eos_token_id, tok)
            finished = jnp.logical_or(finished, tok == eos_token_id)
        seqs = jax.lax.dynamic_update_slice(
            seqs, tok[:, None], (0, prompt_len + step)
        )
        if scores is not None:
            scores = jax.lax.dynamic_update_slice(
                scores, last_logits[:, None].astype(jnp.float32), (0, step, 0)
            )
        logits, caches = model.apply(
            params, tok[:, None], kv_caches=caches,
            seqlen_offset=jnp.int32(prompt_len) + step,
        )
        return step + 1, seqs, caches, logits[:, 0], finished, scores

    finished0 = jnp.zeros((b,), bool)
    state = (jnp.int32(0), sequences, caches, last, finished0, scores0)
    if num_steps > 0:
        state = jax.lax.while_loop(cond, body, state)
    _, sequences, _, _, _, scores = state
    return sequences, scores


class GenerationMixin:
    """Attach to a model wrapper: `generate()` ≙ reference GenerationMixin
    (generation.py:164)."""

    def generate(self, params, input_ids, max_length, **kw):
        return decode(self, params, input_ids, max_length, **kw)
