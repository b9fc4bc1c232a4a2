"""Remat policy: "save_attn" must elide the attention forward kernel from
the rematerialized backward (the named out/lse residuals are saved), and
both policies must produce identical gradients to no remat at all."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xhy_flash_attention_tpu.models.gpt import GPTConfig, GPTLMHeadModel


def _cfg(**kw):
    return GPTConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=0, rotary_emb_fraction=1.0, rms_norm=True,
        activation_function="swiglu", tie_word_embeddings=False,
        qkv_proj_bias=False, out_proj_bias=False, mlp_fc1_bias=False,
        mlp_fc2_bias=False, dtype=jnp.float32, **kw,
    )


def _grad_fn(cfg, params, ids):
    model = GPTLMHeadModel(cfg)

    def loss(p):
        logits, _ = model.apply(p, ids)
        return (logits.astype(jnp.float32) ** 2).mean()

    return loss


def test_save_attn_elides_fwd_kernel_recompute():
    ids = jnp.zeros((1, 256), jnp.int32)
    params = GPTLMHeadModel(_cfg()).init(jax.random.PRNGKey(0), ids)
    counts = {}
    for policy in ("nothing", "save_attn"):
        cfg = _cfg(remat=True, remat_policy=policy)
        txt = str(jax.make_jaxpr(
            jax.grad(_grad_fn(cfg, params, ids)))(params))
        counts[policy] = len(re.findall(r"pallas_call", txt))
    # one attention-forward pallas call per layer drops out of the
    # rematerialized backward
    assert counts["save_attn"] == counts["nothing"] - 2, counts


@pytest.mark.parametrize("policy", ["nothing", "save_attn"])
def test_remat_grads_match_no_remat(policy):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 128, (2, 128)), jnp.int32)
    params = GPTLMHeadModel(_cfg()).init(jax.random.PRNGKey(0), ids)
    g_plain = jax.grad(_grad_fn(_cfg(), params, ids))(params)
    g_remat = jax.grad(_grad_fn(
        _cfg(remat=True, remat_policy=policy), params, ids))(params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-5, rtol=1e-4,
        )
