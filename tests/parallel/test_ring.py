"""Ring attention (context parallelism) vs single-device flash attention,
on the forced 8-device CPU mesh (≙ SURVEY D5 / BASELINE multi-host target)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from xhy_flash_attention_tpu.ops.flash_attention.fwd import flash_attention_fwd
from xhy_flash_attention_tpu.ops.flash_attention.interface import flash_attention
from xhy_flash_attention_tpu.parallel.ring import (
    ring_flash_attention,
    sharded_kv_decode,
)


def _mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ("sp",))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_forward_matches_dense(causal):
    rng = np.random.default_rng(0)
    b, h, s, d, n = 2, 2, 512, 64, 4
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        for _ in range(3)
    )
    mesh = _mesh(n)
    ring = shard_map(
        lambda q, k, v: ring_flash_attention(
            q, k, v, "sp", causal, None, 0.0
        ),
        mesh=mesh,
        in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None),
        check_vma=False,
    )
    out = ring(q, k, v)
    expect = flash_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), atol=2e-5, rtol=1e-4
    )


@pytest.mark.parametrize("causal", [False, True])
def test_ring_grads_match_dense(causal):
    rng = np.random.default_rng(1)
    b, h, s, d, n = 1, 2, 256, 64, 4
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        for _ in range(3)
    )
    do = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    mesh = _mesh(n)

    def ring_loss(q, k, v):
        f = shard_map(
            lambda q, k, v, do: jax.lax.psum(
                (ring_flash_attention(
                    q, k, v, "sp", causal, None, 0.0
                ) * do).sum(), "sp",
            ),
            mesh=mesh,
            in_specs=(P(None, None, "sp", None),) * 4,
            out_specs=P(),
            check_vma=False,
        )
        return f(q, k, v, do)

    def dense_loss(q, k, v):
        return (flash_attention(q, k, v, causal=causal) * do).sum()

    g_ring = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
    for gr, gd, name in zip(g_ring, g_dense, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(gd), atol=5e-5, rtol=1e-3,
            err_msg=f"d{name}",
        )


def test_sharded_kv_decode_matches_dense():
    from xhy_flash_attention_tpu.ops.decode import _decode_attention_xla

    rng = np.random.default_rng(2)
    b, h, hk, d, n = 2, 4, 2, 64, 4
    S_local = 256
    S = S_local * n
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hk, S, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hk, S, d)), jnp.float32)
    # global lengths; shard i holds tokens [i*S_local, (i+1)*S_local)
    lengths = np.asarray([700, 1000], np.int32)
    local_lengths = np.clip(
        lengths[None, :] - np.arange(n)[:, None] * S_local, 0, S_local
    )  # (n, b)

    mesh = _mesh(n)
    dec = shard_map(
        lambda q, k, v, ln: sharded_kv_decode(
            q, k, v, ln[0], "sp"
        ),
        mesh=mesh,
        in_specs=(P(), P(None, None, "sp", None), P(None, None, "sp", None),
                  P("sp", None)),
        out_specs=P(),
        check_vma=False,
    )
    out = dec(q, k, v, jnp.asarray(local_lengths))
    expect = _decode_attention_xla(
        q, k, v, jnp.asarray(lengths), d ** -0.5
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), atol=2e-5, rtol=1e-4
    )


def test_ring_zigzag_matches_single_device():
    """zigzag layout (balanced causal ring): permuted shards + global
    positions must reproduce the single-device causal result exactly on
    the permuted tokens, fwd and grads."""
    import jax

    from xhy_flash_attention_tpu.parallel.ring import (
        zigzag_shard,
        zigzag_unshard,
    )

    n = 4
    mesh = _mesh(n)
    axis = "sp"
    b, h, s, d = 1, 2, 512, 64
    key = jax.random.PRNGKey(7)
    kq, kk, kv, kd = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32)
    do = jax.random.normal(kd, (b, h, s, d), jnp.float32)

    zs = lambda x: zigzag_shard(x, n, axis=2)
    qz, kz, vz, doz = map(zs, (q, k, v, do))

    def ring_loss(qz, kz, vz):
        f = shard_map(
            lambda q_, k_, v_, do_: jax.lax.psum(
                (ring_flash_attention(
                    q_, k_, v_, axis, True, None, 0.0, True
                ) * do_).sum(), axis,
            ),
            mesh=mesh,
            in_specs=(P(None, None, axis, None),) * 4,
            out_specs=P(),
            check_vma=False,
        )
        return f(qz, kz, vz, doz)

    loss_z, grads_z = jax.value_and_grad(ring_loss, argnums=(0, 1, 2))(
        qz, kz, vz)
    grads_z = [zigzag_unshard(g, n, axis=2) for g in grads_z]

    def ref_loss(q, k, v):
        o = flash_attention(q, k, v, causal=True)
        return (o * do).sum()

    loss_r, grads_r = jax.value_and_grad(ref_loss, argnums=(0, 1, 2))(
        q, k, v)
    assert np.allclose(float(loss_z), float(loss_r), rtol=2e-4), \
        (float(loss_z), float(loss_r))
    for gz, gr, name in zip(grads_z, grads_r, ["dq", "dk", "dv"]):
        err = np.abs(np.asarray(gz) - np.asarray(gr)).max()
        assert err < 5e-3, (name, err)
