"""flash_attn_with_kvcache — the mainline-FA2 decode-with-cache entry
point (the pinned reference exposes these capabilities only through the
FA3 C params, csrc/flash_attn_v3/flash_api.h:100-150). Each test checks
the wrapper against an explicit composition of the underlying primitives
or an XLA attention golden."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xhy_flash_attention_tpu import flash_attn_with_kvcache
from xhy_flash_attention_tpu.layers.rotary import apply_rotary_emb
from xhy_flash_attention_tpu.ops.quant import (
    QuantizedKV,
    dequantize_kv,
    quantize_kv,
)


def _golden(q, kc_bhsd, vc_bhsd, lengths, scale):
    """XLA decode attention: q (b, sq, h, d); caches (b, hk, S, d)."""
    b, sq, h, d = q.shape
    hk, S = kc_bhsd.shape[1], kc_bhsd.shape[2]
    g = h // hk
    kf = jnp.repeat(kc_bhsd, g, axis=1).astype(jnp.float32)
    vf = jnp.repeat(vc_bhsd, g, axis=1).astype(jnp.float32)
    s = jnp.einsum("bqhd,bhsd->bhqs", q.astype(jnp.float32), kf) * scale
    pos = (lengths[:, None] - sq + jnp.arange(sq))[:, None, :, None]
    cols = jnp.arange(S)[None, None, None, :]
    s = jnp.where(cols <= pos, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqs,bhsd->bqhd", p, vf)


@pytest.mark.parametrize("sq", [1, 4])
def test_kvcache_append_matches_golden(sq):
    b, S, h, hk, d = 2, 256, 4, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (b, sq, h, d), jnp.bfloat16)
    kc = jax.random.normal(ks[1], (b, S, hk, d), jnp.bfloat16)
    vc = jax.random.normal(ks[2], (b, S, hk, d), jnp.bfloat16)
    kn = jax.random.normal(ks[3], (b, sq, hk, d), jnp.bfloat16)
    vn = jax.random.normal(ks[4], (b, sq, hk, d), jnp.bfloat16)
    lens0 = jnp.asarray([100, 37], jnp.int32)

    out, kc2, vc2 = flash_attn_with_kvcache(
        q, kc, vc, k=kn, v=vn, cache_seqlens=lens0)

    # cache updated exactly at [len0, len0+sq)
    kc2_np = np.asarray(kc2)
    for i in range(b):
        np.testing.assert_array_equal(
            kc2_np[i, int(lens0[i]):int(lens0[i]) + sq], np.asarray(kn[i]))
        np.testing.assert_array_equal(
            kc2_np[i, : int(lens0[i])], np.asarray(kc[i, : int(lens0[i])]))

    ref = _golden(q, jnp.swapaxes(kc2, 1, 2), jnp.swapaxes(vc2, 1, 2),
                  lens0 + sq, d ** -0.5)
    err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
    assert err < 2e-2, err


def test_kvcache_no_append_full_cache():
    b, S, h, d = 2, 192, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, 1, h, d), jnp.bfloat16)
    kc = jax.random.normal(ks[1], (b, S, h, d), jnp.bfloat16)
    vc = jax.random.normal(ks[2], (b, S, h, d), jnp.bfloat16)
    out = flash_attn_with_kvcache(q, kc, vc)  # cache_seqlens=None -> S
    ref = _golden(q, jnp.swapaxes(kc, 1, 2), jnp.swapaxes(vc, 1, 2),
                  jnp.full((b,), S, jnp.int32), d ** -0.5)
    err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
    assert err < 2e-2, err


def test_kvcache_rotary_matches_manual():
    b, S, h, d, sq = 2, 128, 2, 64, 1
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    q = jax.random.normal(ks[0], (b, sq, h, d), jnp.bfloat16)
    kc = jax.random.normal(ks[1], (b, S, h, d), jnp.bfloat16)
    vc = jax.random.normal(ks[2], (b, S, h, d), jnp.bfloat16)
    kn = jax.random.normal(ks[3], (b, sq, h, d), jnp.bfloat16)
    vn = jax.random.normal(ks[4], (b, sq, h, d), jnp.bfloat16)
    lens0 = jnp.asarray([64, 31], jnp.int32)
    inv = 1.0 / (10000.0 ** (jnp.arange(0, d, 2) / d))
    t = jnp.arange(S)[:, None] * inv[None, :]
    cos, sin = jnp.cos(t), jnp.sin(t)

    out, _, _ = flash_attn_with_kvcache(
        q, kc, vc, k=kn, v=vn, rotary_cos=cos, rotary_sin=sin,
        cache_seqlens=lens0)

    # manual: rotate q/kn at absolute positions, then call without rotary
    pos = lens0[:, None] + jnp.arange(sq)[None, :]
    qr = apply_rotary_emb(q, cos[pos], sin[pos])
    knr = apply_rotary_emb(kn, cos[pos], sin[pos])
    ref, _, _ = flash_attn_with_kvcache(
        qr, kc, vc, k=knr, v=vn, cache_seqlens=lens0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_kvcache_quantized_cache():
    b, S, h, d, sq = 2, 256, 2, 64, 1
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    q = jax.random.normal(ks[0], (b, sq, h, d), jnp.bfloat16)
    kc = jax.random.normal(ks[1], (b, h, S, d), jnp.bfloat16)
    vc = jax.random.normal(ks[2], (b, h, S, d), jnp.bfloat16)
    kn = jax.random.normal(ks[3], (b, sq, h, d), jnp.bfloat16)
    vn = jax.random.normal(ks[4], (b, sq, h, d), jnp.bfloat16)
    lens0 = jnp.asarray([200, 99], jnp.int32)
    kq, vq = quantize_kv(kc, jnp.int8), quantize_kv(vc, jnp.int8)

    out, kq2, vq2 = flash_attn_with_kvcache(
        q, kq, vq, k=kn, v=vn, cache_seqlens=lens0)
    assert isinstance(kq2, QuantizedKV)
    ref = _golden(q, dequantize_kv(kq2), dequantize_kv(vq2),
                  lens0 + sq, d ** -0.5)
    err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
    assert err < 3e-2, err


def test_kvcache_batch_idx_and_leftpad():
    b, S, h, d = 2, 128, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q = jax.random.normal(ks[0], (b, 1, h, d), jnp.bfloat16)
    kc = jax.random.normal(ks[1], (b, S, h, d), jnp.bfloat16)
    vc = jax.random.normal(ks[2], (b, S, h, d), jnp.bfloat16)
    lens = jnp.asarray([90, 90], jnp.int32)
    # both query rows read cache row 0
    idx = jnp.asarray([0, 0], jnp.int32)
    out = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=lens, cache_batch_idx=idx)
    ref = _golden(q, jnp.swapaxes(kc, 1, 2)[jnp.asarray([0, 0])],
                  jnp.swapaxes(vc, 1, 2)[jnp.asarray([0, 0])],
                  lens, d ** -0.5)
    err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
    assert err < 2e-2, err

    # leftpad: valid window is [lp, lp + len)
    lp = jnp.asarray([8, 16], jnp.int32)
    out2 = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=lens, cache_leftpad=lp)
    kc_b = jnp.swapaxes(kc, 1, 2)
    vc_b = jnp.swapaxes(vc, 1, 2)
    refs = []
    for i in range(b):
        sl = slice(int(lp[i]), int(lp[i]) + int(lens[i]))
        refs.append(_golden(
            q[i:i + 1], kc_b[i:i + 1, :, sl], vc_b[i:i + 1, :, sl],
            lens[i:i + 1], d ** -0.5))
    ref2 = jnp.concatenate(refs, axis=0)
    err2 = float(jnp.abs(out2.astype(jnp.float32) - ref2).max())
    assert err2 < 2e-2, err2


def test_kvcache_num_splits_matches_single():
    b, S, h, d = 2, 512, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (b, 1, h, d), jnp.bfloat16)
    kc = jax.random.normal(ks[1], (b, S, h, d), jnp.bfloat16)
    vc = jax.random.normal(ks[2], (b, S, h, d), jnp.bfloat16)
    lens = jnp.asarray([512, 300], jnp.int32)
    a = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=lens)
    bb = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=lens,
                                 num_splits=4)
    err = float(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32)).max())
    assert err < 5e-3, err


def test_kvcache_rejects_bad_combos():
    b, S, h, d = 1, 64, 2, 64
    x = jnp.zeros((b, 1, h, d), jnp.bfloat16)
    kc = jnp.zeros((b, S, h, d), jnp.bfloat16)
    with pytest.raises(ValueError):
        flash_attn_with_kvcache(x, kc, kc, k=x, v=x)  # no cache_seqlens
    with pytest.raises(NotImplementedError):
        flash_attn_with_kvcache(
            x, kc, kc, k=x, v=x, cache_seqlens=4,
            cache_batch_idx=jnp.zeros((b,), jnp.int32))
    with pytest.raises(NotImplementedError):
        flash_attn_with_kvcache(
            jnp.zeros((b, 2, h, d), jnp.bfloat16), kc, kc,
            cache_seqlens=8, causal=False)


def _paged_cache(rng, b, hk, d, page_size, lengths, Sp):
    from xhy_flash_attention_tpu.inference.paged import PagedKVCache

    k = rng.standard_normal((b, hk, Sp, d)).astype(np.float32)
    v = rng.standard_normal((b, hk, Sp, d)).astype(np.float32)
    nblocks = Sp // page_size
    num_pages = b * nblocks + 2
    k_pages = np.zeros((num_pages, hk, page_size, d), np.float32)
    v_pages = np.zeros((num_pages, hk, page_size, d), np.float32)
    table = np.zeros((b, nblocks), np.int32)
    p = 1
    for i in range(b):
        for blk in range(nblocks):
            table[i, blk] = p
            k_pages[p] = k[i, :, blk * page_size:(blk + 1) * page_size]
            v_pages[p] = v[i, :, blk * page_size:(blk + 1) * page_size]
            p += 1
    cache = PagedKVCache.from_kv(
        jnp.asarray(k_pages), jnp.asarray(v_pages), jnp.asarray(table),
        jnp.asarray(lengths, jnp.int32))
    return jnp.asarray(k), jnp.asarray(v), cache


def test_kvcache_paged_append_and_attend():
    from xhy_flash_attention_tpu.inference.paged import PagedKVCache

    rng = np.random.default_rng(7)
    b, hk, d, ps, Sp = 2, 2, 64, 128, 384
    h, sq = 4, 1
    lens0 = [130, 77]
    kd, vd, cache = _paged_cache(rng, b, hk, d, ps, lens0, Sp)
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, sq, hk, d)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, sq, hk, d)), jnp.float32)

    out, cache2 = flash_attn_with_kvcache(q, cache, None, k=kn, v=vn)
    assert isinstance(cache2, PagedKVCache)
    assert np.array_equal(np.asarray(cache2.lengths),
                          np.asarray(cache.lengths) + sq)

    # golden: dense cache with the new tokens written at lens0
    kd2, vd2 = np.array(kd), np.array(vd)
    for i in range(b):
        kd2[i, :, lens0[i]:lens0[i] + sq] = np.asarray(kn[i]).transpose(1, 0, 2)
        vd2[i, :, lens0[i]:lens0[i] + sq] = np.asarray(vn[i]).transpose(1, 0, 2)
    ref = _golden(q, jnp.asarray(kd2), jnp.asarray(vd2),
                  jnp.asarray(lens0, jnp.int32) + sq, d ** -0.5)
    err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
    assert err < 2e-3, err

    # v_cache must be None with a paged cache
    with pytest.raises(ValueError):
        flash_attn_with_kvcache(q, cache, cache)
