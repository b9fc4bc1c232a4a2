"""Packed-layout (projection-order) attention kernel parity.

fused_heads.py must match the general kernels bit-for-bit on its
supported envelope: both use the zero-shift exp(min(s, 70)) softmax and
the same position-keyed dropout RNG, so outputs and grads are equal, not
merely close.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xhy_flash_attention_tpu import flash_attn_func
from xhy_flash_attention_tpu.ops.flash_attention.fused_heads import (
    packed_heads_attention,
    packed_heads_supported,
    packed_qkv_attention,
)


@pytest.mark.parametrize(
    "b,s,h,hk,d,causal,dropout,softcap",
    [
        (2, 256, 4, 4, 64, True, 0.0, 0.0),
        (2, 256, 4, 2, 64, False, 0.0, 0.0),   # GQA
        (1, 256, 8, 8, 64, True, 0.2, 0.0),    # dropout
        (1, 128, 2, 2, 64, True, 0.0, 30.0),   # softcap
        (1, 256, 2, 1, 128, True, 0.0, 0.0),   # MQA, d=128
    ],
)
def test_packed_heads_matches_general(b, s, h, hk, d, causal, dropout,
                                      softcap):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hk, d)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    assert packed_heads_supported(
        q.shape, k.shape, causal=causal, window_size=(-1, -1),
        softcap=softcap)
    kw = dict(causal=causal, softcap=softcap, dropout_p=dropout,
              dropout_seed=7 if dropout else None)
    o1, vjp1 = jax.vjp(lambda *a: packed_heads_attention(*a, **kw), q, k, v)
    o2, vjp2 = jax.vjp(lambda *a: flash_attn_func(*a, **kw), q, k, v)
    g1, g2 = vjp1(do), vjp2(do)
    assert jnp.array_equal(o1, o2), float(jnp.max(jnp.abs(o1 - o2)))
    for name, a, bb in zip("qkv", g1, g2):
        assert jnp.array_equal(a, bb), (
            name, float(jnp.max(jnp.abs(a - bb))))


@pytest.mark.parametrize(
    "b,s,h,d,causal,dropout",
    [(2, 256, 4, 64, True, 0.0), (1, 128, 2, 64, False, 0.3)],
)
def test_packed_qkv_direct_entry(b, s, h, d, causal, dropout):
    """The qkv-direct entry (one packed input, one packed dqkv grad) must
    equal the split three-tensor entry exactly."""
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * h * d)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    kw = dict(causal=causal, dropout_p=dropout,
              dropout_seed=5 if dropout else None)

    def f1(x):
        return packed_qkv_attention(
            x, num_heads=h, num_heads_kv=h, head_dim=d, **kw)

    def f2(x):
        q = x[..., : h * d].reshape(b, s, h, d)
        k = x[..., h * d : 2 * h * d].reshape(b, s, h, d)
        v = x[..., 2 * h * d :].reshape(b, s, h, d)
        return packed_heads_attention(q, k, v, **kw).reshape(b, s, h * d)

    o1, vjp1 = jax.vjp(f1, qkv)
    o2, vjp2 = jax.vjp(f2, qkv)
    assert jnp.array_equal(o1, o2)
    g1, g2 = vjp1(do)[0], vjp2(do)[0]
    assert jnp.array_equal(g1, g2), float(jnp.max(jnp.abs(g1 - g2)))


def test_mha_uses_packed_path_and_matches():
    """MHA's packed shortcut must produce the same module output (exact,
    same kernels) as the general path, and grads must flow."""
    import flax.linen as nn  # noqa: F401
    from xhy_flash_attention_tpu.modules.mha import MHA

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 256, 128)), jnp.float32)
    mha = MHA(embed_dim=128, num_heads=2, causal=True, dtype=jnp.float32,
              qkv_proj_bias=False, out_proj_bias=False)
    params = mha.init(jax.random.PRNGKey(0), x)
    out, _ = mha.apply(params, x)
    # window_size=(-1,-1) sentinel forces the general path for comparison
    mha_g = MHA(embed_dim=128, num_heads=2, causal=True, dtype=jnp.float32,
                qkv_proj_bias=False, out_proj_bias=False,
                window_size=(255, -1))
    out_g, _ = mha_g.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_g),
                               atol=2e-5, rtol=1e-5)
    grads = jax.grad(
        lambda p: jnp.sum(mha.apply(p, x)[0] ** 2))(params)
    assert all(bool(jnp.all(jnp.isfinite(g)))
               for g in jax.tree_util.tree_leaves(grads))
