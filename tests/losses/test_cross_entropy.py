"""Cross-entropy tests incl. the TP vocab-parallel path on a CPU mesh
(≙ reference tests/losses/test_cross_entropy.py and
test_cross_entropy_parallel.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xhy_flash_attention_tpu.losses.cross_entropy import cross_entropy_loss


def ref_ce(logits, labels, smoothing=0.0, ignore_index=-100):
    lg = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(lg, axis=-1)
    ll = jnp.take_along_axis(lg, jnp.clip(labels, 0, lg.shape[-1] - 1)[:, None], 1)[:, 0]
    v = lg.shape[-1]
    if smoothing > 0:
        loss = (1 - smoothing) * (lse - ll) + smoothing * (lse - lg.mean(-1))
    else:
        loss = lse - ll
    return jnp.where(labels != ignore_index, loss, 0.0)


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_cross_entropy(dtype, smoothing):
    n, v = 64, 512
    logits = jax.random.normal(jax.random.PRNGKey(0), (n, v), dtype) * 2
    labels = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, v)
    labels = labels.at[5].set(-100)
    f = lambda lg: cross_entropy_loss(lg, labels, smoothing).sum()
    val, grad = jax.value_and_grad(f)(logits)
    rf = lambda lg: ref_ce(lg, labels, smoothing).sum()
    rval, rgrad = jax.value_and_grad(rf)(logits)
    tol = 1e-4 if dtype == jnp.float32 else 5e-2
    assert jnp.allclose(val, rval, rtol=tol)
    assert jnp.allclose(
        grad.astype(jnp.float32), rgrad.astype(jnp.float32), atol=tol
    )


def test_cross_entropy_vocab_parallel():
    """Vocab sharded over a 4-way tensor axis == unsharded result."""
    from jax.experimental.shard_map import shard_map

    n, v = 32, 1024
    tp = 4
    mesh = Mesh(np.array(jax.devices()[:tp]), ("tp",))
    logits = jax.random.normal(jax.random.PRNGKey(2), (n, v), jnp.float32) * 2
    labels = jax.random.randint(jax.random.PRNGKey(3), (n,), 0, v)

    def local_fn(lg_local, labels):
        vocab_start = jax.lax.axis_index("tp") * (v // tp)
        return cross_entropy_loss(
            lg_local, labels, 0.0, -100, 0.0, "tp", vocab_start
        )

    f = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, "tp"), P(None)),
        out_specs=P(None),
    )
    losses = f(logits, labels)
    ref = ref_ce(logits, labels)
    assert jnp.allclose(losses, ref, atol=1e-4)

    # gradients through shard_map
    g = jax.grad(lambda lg: f(lg, labels).sum())(logits)
    gr = jax.grad(lambda lg: ref_ce(lg, labels).sum())(logits)
    assert jnp.allclose(g, gr, atol=1e-4)


def test_cross_entropy_weighted_cotangent():
    """Non-uniform per-row cotangents flow through grad_scale exactly."""
    n, v = 128, 640
    logits = jax.random.normal(jax.random.PRNGKey(4), (n, v), jnp.float32) * 2
    labels = jax.random.randint(jax.random.PRNGKey(5), (n,), 0, v)
    labels = labels.at[7].set(-100)
    w = jnp.linspace(0.5, 2.0, n)
    g = jax.grad(lambda lg: (cross_entropy_loss(lg, labels) * w).sum())(logits)
    gr = jax.grad(lambda lg: (ref_ce(lg, labels) * w).sum())(logits)
    np.testing.assert_allclose(g, gr, atol=2e-6)
