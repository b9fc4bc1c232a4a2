"""Rotary embedding vs explicit reference (≙ reference tests/layers/test_rotary.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xhy_flash_attention_tpu.layers.rotary import (
    RotaryEmbedding,
    apply_rotary_emb,
    apply_rotary_emb_qkv,
)


def ref_rotary(x, cos, sin, interleaved):
    # x (b, s, h, d); cos/sin (s, ro/2)
    x = np.asarray(x, np.float32)
    cos, sin = np.asarray(cos, np.float32), np.asarray(sin, np.float32)
    ro = cos.shape[-1] * 2
    out = x.copy()
    if interleaved:
        x1, x2 = x[..., 0:ro:2], x[..., 1:ro:2]
        o1 = x1 * cos[None, :, None] - x2 * sin[None, :, None]
        o2 = x2 * cos[None, :, None] + x1 * sin[None, :, None]
        out[..., 0:ro:2], out[..., 1:ro:2] = o1, o2
    else:
        half = ro // 2
        x1, x2 = x[..., :half], x[..., half:ro]
        out[..., :half] = x1 * cos[None, :, None] - x2 * sin[None, :, None]
        out[..., half:ro] = x2 * cos[None, :, None] + x1 * sin[None, :, None]
    return out


@pytest.mark.parametrize("interleaved", [False, True])
@pytest.mark.parametrize("rotary_fraction", [1.0, 0.5])
def test_apply_rotary(interleaved, rotary_fraction):
    b, s, h, d = 2, 64, 4, 64
    ro = int(d * rotary_fraction)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    x = jax.random.normal(keys[0], (b, s, h, d), jnp.float32)
    ang = jax.random.normal(keys[1], (s, ro // 2), jnp.float32)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    out = apply_rotary_emb(x, cos, sin, interleaved)
    ref = ref_rotary(x, cos, sin, interleaved)
    assert jnp.allclose(out, ref, atol=1e-5)
    # gradient = rotation by -theta: check vjp is norm-preserving & correct
    g = jax.random.normal(keys[0], x.shape, jnp.float32)
    _, vjp = jax.vjp(lambda x: apply_rotary_emb(x, cos, sin, interleaved), x)
    (dx,) = vjp(g)
    # rotation is linear+orthogonal: vjp(g) == rotation of g by -theta
    dx_ref = ref_rotary(g, cos, -sin, interleaved)
    assert jnp.allclose(dx, dx_ref, atol=1e-5)


def test_rotary_embedding_module_decode_offset():
    b, s, h, d = 1, 32, 2, 64
    rot = RotaryEmbedding(d)
    qkv = jax.random.normal(jax.random.PRNGKey(1), (b, s, 3, h, d), jnp.float32)
    full = rot(qkv)
    # applying to the tail with seqlen_offset must match the full application
    tail = rot(qkv[:, 16:], seqlen_offset=16)
    assert jnp.allclose(full[:, 16:], tail, atol=1e-5)


def test_rotary_xpos_scale():
    rot = RotaryEmbedding(64, scale_base=512)
    qkv = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 3, 2, 64), jnp.float32)
    out = rot(qkv)
    assert out.shape == qkv.shape
    assert bool(jnp.isfinite(out).all())
    # q and k get reciprocal scales: q.k dot products preserved vs no-scale
    # at matching relative positions is the xPos property (spot check shape only)
