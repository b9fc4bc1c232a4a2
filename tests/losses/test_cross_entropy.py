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


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_cross_entropy_dlogits_kernel(monkeypatch, dtype):
    """The Pallas dlogits backward (lm-head hot path) == the XLA chain."""
    from xhy_flash_attention_tpu.losses import cross_entropy as ce

    n, v = 128, 640
    logits = jax.random.normal(jax.random.PRNGKey(4), (n, v), dtype) * 2
    labels = jax.random.randint(jax.random.PRNGKey(5), (n,), 0, v)
    labels = labels.at[7].set(-100)
    # non-uniform cotangent so grad_scale is exercised per row
    w = jnp.linspace(0.5, 2.0, n)
    f = lambda lg: (cross_entropy_loss(lg, labels) * w).sum()
    monkeypatch.setattr(ce, "_KERNEL_MIN_SIZE", 0)
    g_kernel = jax.grad(f)(logits)
    monkeypatch.setattr(ce, "_KERNEL_MIN_SIZE", 1 << 62)
    g_xla = jax.grad(f)(logits)
    assert g_kernel.dtype == g_xla.dtype == dtype
    np.testing.assert_allclose(
        g_kernel.astype(jnp.float32), g_xla.astype(jnp.float32),
        atol=2e-6 if dtype == jnp.float32 else 1e-3,
    )


def test_cross_entropy_dlogits_kernel_vocab_parallel(monkeypatch):
    """Kernel-path backward under vocab sharding == unsharded reference."""
    from jax import shard_map

    from xhy_flash_attention_tpu.losses import cross_entropy as ce

    monkeypatch.setattr(ce, "_KERNEL_MIN_SIZE", 0)
    n, v, tp = 32, 1024, 4
    mesh = Mesh(np.array(jax.devices()[:tp]), ("tp",))
    logits = jax.random.normal(jax.random.PRNGKey(6), (n, v), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(7), (n,), 0, v)

    def local_fn(lg_local, labels):
        vocab_start = jax.lax.axis_index("tp") * (v // tp)
        return cross_entropy_loss(
            lg_local, labels, 0.0, -100, 0.0, "tp", vocab_start
        )

    # check_vma=False: with vma checking on, interpret mode falls back to
    # the XLA chain (compiled TPU keeps the kernel); this exercises the
    # kernel body itself under shard_map. NOTE check_vma=False scales the
    # replicated-out cotangent by 1/tp (shard_map transpose semantics, both
    # paths identically), so compare kernel vs XLA under the SAME wrapper.
    f = shard_map(local_fn, mesh=mesh, check_vma=False,
                  in_specs=(P(None, "tp"), P(None)), out_specs=P(None))
    g_kernel = jax.grad(lambda lg: f(lg, labels).sum())(logits)
    monkeypatch.setattr(ce, "_KERNEL_MIN_SIZE", 1 << 62)
    g_xla = jax.grad(lambda lg: f(lg, labels).sum())(logits)
    np.testing.assert_allclose(g_kernel, g_xla, atol=1e-6)
    monkeypatch.setattr(ce, "_KERNEL_MIN_SIZE", 0)

    # the vma-checked path matches the unsharded reference end-to-end
    # (XLA fallback in interpret mode; the kernel on hardware)
    fv = shard_map(local_fn, mesh=mesh,
                   in_specs=(P(None, "tp"), P(None)), out_specs=P(None))
    gv = jax.grad(lambda lg: fv(lg, labels).sum())(logits)
    gr = jax.grad(lambda lg: ref_ce(lg, labels).sum())(logits)
    np.testing.assert_allclose(gv, gr, atol=1e-4)
