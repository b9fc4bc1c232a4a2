"""dropout-add-LN/RMSNorm kernel tests (≙ reference
tests/ops/test_dropout_layer_norm.py — same math checks, JAX reference)."""

import functools

import jax
import jax.numpy as jnp
import pytest

from xhy_flash_attention_tpu.ops.layer_norm import (
    dropout_add_layer_norm,
    dropout_add_rms_norm,
    layer_norm,
    rms_norm,
)


def ref_ln(x, w, b, eps=1e-6):
    x = x.astype(jnp.float32)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def ref_rms(x, w, eps=1e-6):
    x = x.astype(jnp.float32)
    var = (x * x).mean(-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * w


@pytest.mark.parametrize("hidden", [768, 1024])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_layer_norm_fwd_bwd(hidden, dtype):
    n = 192  # not a multiple of the row block
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(keys[0], (n, hidden), dtype)
    w = jax.random.normal(keys[1], (hidden,), jnp.float32)
    b = jax.random.normal(keys[2], (hidden,), jnp.float32)
    g = jax.random.normal(keys[3], (n, hidden), dtype)

    out, vjp = jax.vjp(lambda x, w, b: layer_norm(x, w, b), x, w, b)
    dx, dw, db = vjp(g)
    out_ref, vjp_ref = jax.vjp(
        lambda x, w, b: ref_ln(x, w, b).astype(dtype), x, w, b
    )
    dx_r, dw_r, db_r = vjp_ref(g)
    tol = 1e-5 if dtype == jnp.float32 else 5e-2
    assert jnp.allclose(out.astype(jnp.float32), out_ref.astype(jnp.float32), atol=tol)
    assert jnp.allclose(dx.astype(jnp.float32), dx_r.astype(jnp.float32), atol=tol * 4)
    assert jnp.allclose(dw, dw_r, atol=tol * 20), jnp.abs(dw - dw_r).max()
    assert jnp.allclose(db, db_r, atol=tol * 20)


def test_rms_norm_fwd_bwd():
    n, hidden = 128, 512
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(keys[0], (n, hidden), jnp.float32)
    w = jax.random.normal(keys[1], (hidden,), jnp.float32)
    g = jax.random.normal(keys[2], (n, hidden), jnp.float32)
    out, vjp = jax.vjp(lambda x, w: rms_norm(x, w), x, w)
    dx, dw = vjp(g)
    out_ref, vjp_ref = jax.vjp(lambda x, w: ref_rms(x, w), x, w)
    dx_r, dw_r = vjp_ref(g)
    assert jnp.allclose(out, out_ref, atol=1e-5)
    assert jnp.allclose(dx, dx_r, atol=1e-4)
    assert jnp.allclose(dw, dw_r, atol=1e-3)


def test_dropout_add_ln_prenorm_residual():
    """residual add + prenorm + residual_in_fp32, dropout_p=0 exact check."""
    n, hidden = 160, 768
    keys = jax.random.split(jax.random.PRNGKey(2), 5)
    x = jax.random.normal(keys[0], (n, hidden), jnp.bfloat16)
    res = jax.random.normal(keys[1], (n, hidden), jnp.float32)
    w = jax.random.normal(keys[2], (hidden,), jnp.float32)
    b = jax.random.normal(keys[3], (hidden,), jnp.float32)
    g = jax.random.normal(keys[4], (n, hidden), jnp.bfloat16)

    def f(x, res, w, b):
        out, resout = dropout_add_layer_norm(
            x, res, w, b, 0.0, 1e-6, prenorm=True, residual_in_fp32=True
        )
        return out, resout

    (out, resout), vjp = jax.vjp(f, x, res, w, b)
    gres = jax.random.normal(keys[0], (n, hidden), jnp.float32)
    dx, dres, dw, db = vjp((g, gres))

    def ref(x, res, w, b):
        r = x.astype(jnp.float32) + res
        return ref_ln(r, w, b).astype(jnp.bfloat16), r

    (out_r, resout_r), vjp_r = jax.vjp(ref, x, res, w, b)
    dx_r, dres_r, dw_r, db_r = vjp_r((g, gres))
    assert jnp.allclose(out.astype(jnp.float32), out_r.astype(jnp.float32), atol=5e-2)
    assert jnp.allclose(resout, resout_r, atol=1e-5)
    assert jnp.allclose(dx.astype(jnp.float32), dx_r.astype(jnp.float32), atol=1e-1)
    assert jnp.allclose(dres, dres_r, atol=1e-4)
    assert jnp.allclose(dw, dw_r, atol=1e-2)
    assert jnp.allclose(db, db_r, atol=1e-2)


def test_dropout_statistics_and_determinism():
    n, hidden = 256, 512
    p = 0.3
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    x = jnp.ones((n, hidden), jnp.float32)
    w = jnp.ones((hidden,), jnp.float32)
    b = jnp.zeros((hidden,), jnp.float32)
    # use residual to expose the dropped values: out = LN(drop(x)) is scale
    # invariant, so check via prenorm residual_out instead.
    res = jnp.zeros((n, hidden), jnp.float32)
    out1, r1 = dropout_add_layer_norm(
        x, res, w, b, p, 1e-6, prenorm=True, seed=jnp.int32(7)
    )
    out2, r2 = dropout_add_layer_norm(
        x, res, w, b, p, 1e-6, prenorm=True, seed=jnp.int32(7)
    )
    assert jnp.array_equal(r1, r2), "same seed must give identical masks"
    frac = float((r1 == 0).mean())
    assert abs(frac - p) < 0.02, frac
    kept = r1[r1 != 0]
    assert jnp.allclose(kept, 1.0 / (1.0 - p), atol=1e-6)
    _, r3 = dropout_add_layer_norm(
        x, res, w, b, p, 1e-6, prenorm=True, seed=jnp.int32(8)
    )
    assert not jnp.array_equal(r1, r3)


def test_colscale_rowscale():
    n, hidden = 64, 256
    keys = jax.random.split(jax.random.PRNGKey(4), 5)
    x = jax.random.normal(keys[0], (n, hidden), jnp.float32)
    w = jax.random.normal(keys[1], (hidden,), jnp.float32)
    b = jax.random.normal(keys[2], (hidden,), jnp.float32)
    cs = jax.random.normal(keys[3], (hidden,), jnp.float32)
    rs = (jax.random.uniform(keys[4], (n,)) > 0.5).astype(jnp.float32)
    g = jax.random.normal(keys[0], (n, hidden), jnp.float32)

    f = lambda x, w, b, cs: dropout_add_layer_norm(
        x, None, w, b, 0.0, 1e-6, rowscale=rs, layerscale=cs
    )
    out, vjp = jax.vjp(f, x, w, b, cs)
    dx, dw, db, dcs = vjp(g)
    ref = lambda x, w, b, cs: ref_ln(x * rs[:, None] * cs[None, :], w, b)
    out_r, vjp_r = jax.vjp(ref, x, w, b, cs)
    dx_r, dw_r, db_r, dcs_r = vjp_r(g)
    assert jnp.allclose(out, out_r, atol=1e-5)
    assert jnp.allclose(dx, dx_r, atol=1e-4)
    assert jnp.allclose(dcs, dcs_r, atol=1e-3), jnp.abs(dcs - dcs_r).max()
