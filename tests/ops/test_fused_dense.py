"""fused_dense op APIs incl. the TP column/row-parallel forms
(≙ reference tests/ops/test_fused_dense.py + test_fused_dense_parallel.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from xhy_flash_attention_tpu.ops.fused_dense import (
    column_parallel_dense,
    fused_dense,
    fused_mlp,
    parallel_fused_mlp,
    row_parallel_dense,
)


def test_fused_dense_and_mlp():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((64, 128)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(128) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((128, 64)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(64) * 0.05, jnp.float32)

    y = fused_dense(x, w1, b1, activation="gelu_approx")
    expect = jax.nn.gelu(x @ w1 + b1, approximate=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(expect), atol=1e-5)

    y = fused_mlp(x, w1, b1, w2, b2)
    expect = jax.nn.gelu(x @ w1 + b1, approximate=True) @ w2 + b2
    np.testing.assert_allclose(np.asarray(y), np.asarray(expect), atol=1e-5)


@pytest.mark.parametrize("sequence_parallel", [False, True])
def test_parallel_fused_mlp_matches_dense(sequence_parallel):
    tp = 4
    rng = np.random.default_rng(1)
    n, d, inner = 16, 64, 128
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, inner)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(inner) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((inner, d)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.05, jnp.float32)
    expect = fused_mlp(x, w1, b1, w2, b2)

    mesh = Mesh(np.asarray(jax.devices()[:tp]), ("tp",))
    xs = P("tp", None) if sequence_parallel else P()

    def run(x, w1, b1, w2, b2):
        return parallel_fused_mlp(
            x, w1, b1, w2, b2, axis="tp",
            sequence_parallel=sequence_parallel,
        )

    out = shard_map(
        run, mesh=mesh,
        in_specs=(xs, P(None, "tp"), P("tp"), P("tp", None), P()),
        out_specs=xs,
        check_vma=False,
    )(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=1e-5, rtol=1e-5)


def test_column_row_parallel_roundtrip():
    tp = 2
    rng = np.random.default_rng(2)
    n, d, inner = 8, 64, 128
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, inner)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((inner, d)) * 0.05, jnp.float32)
    expect = (x @ w1) @ w2

    mesh = Mesh(np.asarray(jax.devices()[:tp]), ("tp",))

    def run(x, w1, w2):
        h = column_parallel_dense(x, w1, axis="tp", sequence_parallel=False)
        return row_parallel_dense(h, w2, axis="tp", sequence_parallel=False)

    out = shard_map(
        run, mesh=mesh,
        in_specs=(P(), P(None, "tp"), P("tp", None)),
        out_specs=P(),
        check_vma=False,
    )(x, w1, w2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=1e-5, rtol=1e-5)
