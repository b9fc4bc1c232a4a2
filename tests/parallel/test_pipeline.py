"""Pipeline parallelism vs the sequential model on the 8-device CPU mesh.

The reference has no pipeline parallelism (SURVEY.md D5) — these tests hold
the new pp engine to the same golden-model standard the TP/CP tests use:
shard over a real mesh axis, compare outputs and grads against the
single-device computation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from xhy_flash_attention_tpu.parallel.pipeline import (
    GPTPipeline,
    pipeline_apply,
    split_stage_params,
)


def _mesh(pp):
    return Mesh(np.array(jax.devices()[:pp]), ("pp",))


@pytest.mark.parametrize("microbatches", [4, 7])
@pytest.mark.parametrize("pp", [2, 4])
def test_pipeline_apply_matches_sequential(pp, microbatches):
    """Generic engine: P matmul stages == sequential composition, fwd+grad."""
    d, mb = 16, 8
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.standard_normal((d, d)) * 0.3, jnp.float32)
          for _ in range(pp)]
    x = jnp.asarray(rng.standard_normal((microbatches, mb, d)), jnp.float32)

    def stage_fn(w, a):
        # w arrives as the (1, layers_per_stage=1, d, d) local shard
        return jnp.tanh(a @ w[0, 0])

    stacked = split_stage_params(ws, pp)

    def loss(stacked, x):
        f = shard_map(
            lambda sp, xx: pipeline_apply(
                stage_fn, sp, xx, "pp", collect="psum"
            ),
            mesh=_mesh(pp),
            in_specs=(P("pp"), P()),
            out_specs=P(),
            check_vma=False,
        )
        return (f(stacked, x) ** 2).sum()

    def loss_seq(ws, x):
        a = x
        for w in ws:
            a = jnp.tanh(a @ w)
        return (a ** 2).sum()

    v, g = jax.value_and_grad(loss)(stacked, x)
    vr, gr = jax.value_and_grad(loss_seq)(ws, x)
    assert np.isclose(float(v), float(vr), rtol=1e-6)
    g_flat = g.reshape(pp, *ws[0].shape)
    for i in range(pp):
        np.testing.assert_allclose(g_flat[i], gr[i], atol=1e-5)


@pytest.mark.parametrize("tied", [False, True])
def test_gpt_pipeline_loss_and_grads_match(tied):
    """GPTPipeline loss + grads == the sequential GPTLMHeadModel."""
    import optax

    from xhy_flash_attention_tpu.losses.cross_entropy import (
        cross_entropy_loss,
    )
    from xhy_flash_attention_tpu.models.gpt import GPTConfig, GPTLMHeadModel

    pp, M = 4, 4
    cfg = GPTConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=2, max_position_embeddings=64,
        pad_vocab_size_multiple=128, tie_word_embeddings=tied,
        dtype=jnp.float32,
    )
    model = GPTLMHeadModel(cfg)
    rng = np.random.default_rng(1)
    b, s = 8, 32
    ids = jnp.asarray(rng.integers(0, 256, (b, s)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 256, (b, s)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids[:1, :8])

    def seq_loss(p):
        logits, _ = model.apply(p, ids)
        return cross_entropy_loss(
            logits.reshape(-1, logits.shape[-1]), labels.reshape(-1)
        ).mean()

    ref_loss, ref_grads = jax.value_and_grad(seq_loss)(params)

    pipe = GPTPipeline(cfg, pp=pp, num_microbatches=M)
    stage_p, rest_p = pipe.prepare(params)

    def local_step(stage_local, rest, ids, labels):
        loss, (gs, gr) = jax.value_and_grad(
            pipe.local_loss, argnums=(0, 1)
        )(stage_local, rest, ids, labels)
        return jax.lax.psum(loss, "pp"), gs, pipe.reduce_rest_grads(gr)

    f = shard_map(
        local_step,
        mesh=_mesh(pp),
        in_specs=(pipe.stage_spec, P(), P(), P()),
        out_specs=(P(), pipe.stage_spec, P()),
        check_vma=False,
    )
    loss, g_stage, g_rest = jax.jit(f)(stage_p, rest_p, ids, labels)
    assert np.isclose(float(loss), float(ref_loss), rtol=1e-5), (
        float(loss), float(ref_loss))

    # stage grads: reassemble to the sequential tree and compare per layer
    g_full = pipe.merge(g_stage, g_rest)
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref_grads)[0])
    for path, leaf in jax.tree_util.tree_flatten_with_path(g_full)[0]:
        np.testing.assert_allclose(
            leaf, flat_ref[path], atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_gpt_pipeline_merge_roundtrip():
    from xhy_flash_attention_tpu.models.gpt import GPTConfig, GPTLMHeadModel

    cfg = GPTConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=2, max_position_embeddings=32,
        pad_vocab_size_multiple=128, tie_word_embeddings=False,
        dtype=jnp.float32,
    )
    model = GPTLMHeadModel(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    pipe = GPTPipeline(cfg, pp=2, num_microbatches=2)
    stage, rest = pipe.prepare(params)
    rt = pipe.merge(stage, rest)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(rt)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(a, b)
