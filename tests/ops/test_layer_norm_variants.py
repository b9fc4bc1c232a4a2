"""Parallel-residual and subset dropout-add-LN variants + benchmark utils
(≙ reference tests/ops/test_dropout_layer_norm.py parallel/subset sections)."""

import jax
import jax.numpy as jnp
import numpy as np

from xhy_flash_attention_tpu.ops.layer_norm import (
    dropout_add_layer_norm_parallel_residual,
    dropout_add_layer_norm_subset,
    dropout_add_rms_norm_parallel_residual,
    layer_norm,
)


def _ref_ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) / jnp.sqrt(var + eps) * w + b).astype(x.dtype)


def test_parallel_residual_dual_norm():
    rng = np.random.default_rng(0)
    n, h = 64, 128
    x0, x1, res = (
        jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
        for _ in range(3)
    )
    w0, b0 = jnp.ones((h,)), jnp.zeros((h,))
    w1 = jnp.asarray(rng.standard_normal((h,)), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((h,)), jnp.float32)
    out0, out1, resout = dropout_add_layer_norm_parallel_residual(
        x0, x1, res, w0, b0, w1, b1, 0.0, 1e-5, prenorm=True,
    )
    total = x0 + x1 + res
    np.testing.assert_allclose(np.asarray(resout), np.asarray(total),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out0), np.asarray(_ref_ln(total, w0, b0)), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(_ref_ln(total, w1, b1)), atol=1e-4
    )
    # rms variant runs
    o0, o1 = dropout_add_rms_norm_parallel_residual(
        x0, x1, res, w0, None, w1, None, 0.0, 1e-5
    )
    assert o0.shape == o1.shape == (n, h)


def test_subset_in_out():
    rng = np.random.default_rng(1)
    n, h, m = 32, 128, 7
    res = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    x0_rows = jnp.asarray(rng.standard_normal((m, h)), jnp.float32)
    idx = jnp.asarray(sorted(rng.choice(n, m, replace=False)), jnp.int32)
    w, b = jnp.ones((h,)), jnp.zeros((h,))
    out = dropout_add_layer_norm_subset(
        x0_rows, res, w, b, 0.0, 1e-5, x0_subset=idx, out_subset=idx,
    )
    full = jnp.zeros((n, h)).at[idx].set(x0_rows) + res
    expect = _ref_ln(full, w, b)[idx]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-4)


def test_benchmark_utils_run():
    from xhy_flash_attention_tpu.utils.benchmark import (
        benchmark_chained,
        benchmark_forward,
        benchmark_fwd_bwd,
    )

    x = jnp.ones((128, 128), jnp.float32)
    f = lambda x: layer_norm(x, jnp.ones(128), jnp.zeros(128))
    mean, best = benchmark_forward(f, x, repeats=2)
    assert best > 0
    mean, best = benchmark_fwd_bwd(f, x, repeats=2)
    assert best > 0
    t = benchmark_chained(lambda x: f(x), x, n=6)
    assert np.isfinite(t)


def test_ema():
    from xhy_flash_attention_tpu.training.callbacks import EMA

    p = {"w": jnp.ones((4,))}
    ema = EMA(p, decay=0.5)
    ema.update({"w": jnp.zeros((4,))})
    np.testing.assert_allclose(np.asarray(ema.state["w"]), 0.5)
    sd = ema.state_dict()
    ema2 = EMA(p, decay=0.5)
    ema2.load_state_dict(sd)
    np.testing.assert_allclose(np.asarray(ema2.state["w"]), 0.5)
