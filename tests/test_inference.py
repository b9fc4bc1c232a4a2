"""Paged KV decode, split-KV + combine, continuous-batching engine tests
(≙ reference FA3 decode features I4 + generation machinery I1-I3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xhy_flash_attention_tpu.inference import (
    InferenceEngine,
    PagedKVCache,
    Request,
    append_paged_kv,
    flash_decode_splitkv,
    merge_attention_partials,
    paged_flash_decode,
)
from xhy_flash_attention_tpu.ops.decode import _decode_attention_xla


def _random_cache_setup(rng, b, hk, d, page_size, lengths):
    """Build equivalent contiguous + paged caches with random contents."""
    S = max(lengths)
    Sp = -(-S // page_size) * page_size
    k = rng.standard_normal((b, hk, Sp, d)).astype(np.float32)
    v = rng.standard_normal((b, hk, Sp, d)).astype(np.float32)
    nblocks = Sp // page_size
    num_pages = b * nblocks + 2
    k_pages = np.zeros((num_pages, hk, page_size, d), np.float32)
    v_pages = np.zeros((num_pages, hk, page_size, d), np.float32)
    table = np.zeros((b, nblocks), np.int32)
    p = 1  # page 0 left unused to catch indexing bugs
    for i in range(b):
        for blk in range(nblocks):
            table[i, blk] = p
            k_pages[p] = k[i, :, blk * page_size:(blk + 1) * page_size]
            v_pages[p] = v[i, :, blk * page_size:(blk + 1) * page_size]
            p += 1
    cache = PagedKVCache.from_kv(
        jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(table), jnp.asarray(lengths, jnp.int32),
    )
    return jnp.asarray(k), jnp.asarray(v), cache


@pytest.mark.parametrize("gqa", [1, 4])
def test_paged_decode_matches_dense(gqa):
    rng = np.random.default_rng(0)
    b, hk, d, ps = 3, 2, 64, 128
    h = hk * gqa
    lengths = [130, 256, 77]
    k, v, cache = _random_cache_setup(rng, b, hk, d, ps, lengths)
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    out_paged = paged_flash_decode(q, cache, softmax_scale=d ** -0.5)
    out_dense = _decode_attention_xla(
        q, k, v, jnp.asarray(lengths, jnp.int32), d ** -0.5
    )
    np.testing.assert_allclose(
        np.asarray(out_paged), np.asarray(out_dense), atol=2e-5, rtol=1e-4
    )


def test_append_paged_kv():
    rng = np.random.default_rng(1)
    b, hk, d, ps = 2, 2, 64, 128
    lengths = [130, 255]
    k, v, cache = _random_cache_setup(rng, b, hk, d, ps, lengths)
    k_new = jnp.asarray(rng.standard_normal((b, hk, 1, d)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((b, hk, 1, d)), jnp.float32)
    cache2 = append_paged_kv(cache, k_new, v_new)
    assert list(np.asarray(cache2.lengths)) == [131, 256]
    # the appended token must be readable back from its page
    for i, ln in enumerate(lengths):
        blk, off = ln // ps, ln % ps
        page = int(np.asarray(cache.page_table)[i, blk])
        got = np.asarray(cache2.k_pages)[page, :, off]
        np.testing.assert_allclose(got, np.asarray(k_new[i, :, 0]), atol=0)
    # inactive slot (length 0) must not advance
    cache.lengths = cache.lengths.at[0].set(0)
    cache3 = append_paged_kv(cache, k_new, v_new)
    assert int(np.asarray(cache3.lengths)[0]) == 0


@pytest.mark.parametrize("num_splits", [2, 4])
def test_splitkv_matches_dense(num_splits):
    rng = np.random.default_rng(2)
    b, h, hk, d = 2, 4, 2, 64
    S = 1024
    lengths = jnp.asarray([900, 512], jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hk, S, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hk, S, d)), jnp.float32)
    out_split = flash_decode_splitkv(
        q, k, v, lengths, softmax_scale=d ** -0.5,
        num_splits=num_splits, block_k=128,
    )
    out_dense = _decode_attention_xla(q, k, v, lengths, d ** -0.5)
    np.testing.assert_allclose(
        np.asarray(out_split), np.asarray(out_dense), atol=2e-5, rtol=1e-4
    )


def test_merge_partials_is_softmax_partition():
    """Merging per-split normalized outputs == softmax over the union."""
    rng = np.random.default_rng(3)
    rows, d, n1, n2 = 8, 16, 24, 40
    s = rng.standard_normal((rows, n1 + n2)).astype(np.float32)
    vv = rng.standard_normal((n1 + n2, d)).astype(np.float32)

    # split 1 over first n1 cols, split 2 over rest
    def norm_out(sl, vs):
        m = sl.max(-1, keepdims=True)
        p = np.exp(sl - m)
        l = p.sum(-1, keepdims=True)
        return (p / l) @ vs, m, l

    o1, m1, l1 = norm_out(s[:, :n1], vv[:n1])
    o2, m2, l2 = norm_out(s[:, n1:], vv[n1:])
    outs = jnp.stack([jnp.asarray(o1), jnp.asarray(o2)])
    ms = jnp.stack([jnp.asarray(m1), jnp.asarray(m2)])
    ls = jnp.stack([jnp.asarray(l1), jnp.asarray(l2)])
    merged, _, _ = merge_attention_partials(outs, ms, ls, axis=0)
    expect = (jax.nn.softmax(jnp.asarray(s), -1) @ jnp.asarray(vv))
    np.testing.assert_allclose(
        np.asarray(merged), np.asarray(expect), atol=1e-5
    )


def _greedy_manual(model, params, prompt, n_new, max_seqlen=128):
    """Single-sample greedy decode with a contiguous cache; returns
    (tokens, top2_margins) — margins let equivalence tests tolerate
    argmax near-ties (fp32 CPU matmul reduction order varies with host
    load, flipping ties between runs)."""
    caches = model.allocate_kv_caches(
        batch_size=1, max_seqlen=max_seqlen, dtype=jnp.float32
    )
    toks, margins = [], []
    n = len(prompt)
    logits, caches = model.apply(
        params, jnp.asarray([list(prompt)], jnp.int32), kv_caches=caches,
        seqlen_offset=0,
    )
    step_logits = np.asarray(logits[0, n - 1], np.float64)
    for i in range(n_new):
        top2 = np.sort(step_logits)[-2:]
        margins.append(float(top2[1] - top2[0]))
        tok = int(np.argmax(step_logits))
        toks.append(tok)
        if i == n_new - 1:
            break
        logits, caches = model.apply(
            params, jnp.asarray([[tok]], jnp.int32), kv_caches=caches,
            seqlen_offset=n + i,
        )
        step_logits = np.asarray(logits[0, 0], np.float64)
    return toks, margins


def _assert_tokens_match_modulo_ties(got, expect, margins, tol=5e-3):
    """Token-exact comparison that stops at the first near-tie: greedy
    trajectories legitimately diverge where the top-2 logit gap is within
    fp32 reduction noise."""
    for t, (a, b) in enumerate(zip(got, expect)):
        if a != b:
            assert margins[t] < tol, (
                f"token {t} diverged ({a} vs {b}) with top-2 margin "
                f"{margins[t]:.5f} (not a tie)"
            )
            return
    assert len(got) == len(expect)


def test_engine_matches_sequential_decode():
    """Continuous-batching engine == one-at-a-time greedy decode."""
    from xhy_flash_attention_tpu.models.gpt import GPTConfig, GPTLMHeadModel

    cfg = GPTConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_attention_heads_kv=2,
        intermediate_size=128, max_position_embeddings=0,
        rotary_emb_fraction=1.0, rms_norm=True,
        activation_function="swiglu", tie_word_embeddings=False,
        qkv_proj_bias=False, out_proj_bias=False,
        mlp_fc1_bias=False, mlp_fc2_bias=False, dtype=jnp.float32,
    )
    model = GPTLMHeadModel(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)

    hk = cfg.num_attention_heads_kv
    d = cfg.hidden_size // cfg.num_attention_heads
    engine = InferenceEngine(
        model.apply, params,
        num_layers=cfg.num_hidden_layers, num_kv_heads=hk, head_dim=d,
        num_pages=64, page_size=128, max_batch=4, max_pages_per_seq=4,
        dtype=jnp.float32,
    )
    prompts = [
        rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
        for n in (5, 9, 3)
    ]
    for i, p in enumerate(prompts):
        engine.add_request(Request(rid=i, prompt=p, max_new_tokens=6))
    results = engine.run()
    assert set(results) == {0, 1, 2}

    # golden: per-request greedy decode with a contiguous cache; tolerate
    # divergence only at argmax near-ties (fp32 CPU reduction noise)
    for i, prompt in enumerate(prompts):
        out, margins = _greedy_manual(model, params, list(prompt), 6)
        _assert_tokens_match_modulo_ties(results[i], out, margins)


def test_engine_speculative_prompt_lookup():
    """Prompt-lookup speculative decoding must emit the same greedy
    tokens as the plain engine — drafts are verified by the same model,
    so acceptance only changes how many dispatches run, never the
    sequence. A repetitive prompt makes the n-gram lookup actually fire."""
    from xhy_flash_attention_tpu.models.gpt import GPTConfig, GPTLMHeadModel

    cfg = GPTConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_attention_heads_kv=2,
        intermediate_size=128, max_position_embeddings=0,
        rotary_emb_fraction=1.0, rms_norm=True,
        activation_function="swiglu", tie_word_embeddings=False,
        qkv_proj_bias=False, out_proj_bias=False,
        mlp_fc1_bias=False, mlp_fc2_bias=False, dtype=jnp.float32,
    )
    model = GPTLMHeadModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    hk = cfg.num_attention_heads_kv
    d = cfg.hidden_size // cfg.num_attention_heads
    # repetitive prompt -> the trailing bigram recurs and proposes drafts
    prompt = np.asarray([5, 9, 22, 5, 9, 22, 5, 9, 22, 5, 9], np.int32)

    def run(spec):
        eng = InferenceEngine(
            model.apply, params,
            num_layers=cfg.num_hidden_layers, num_kv_heads=hk, head_dim=d,
            num_pages=64, page_size=128, max_batch=2, max_pages_per_seq=4,
            dtype=jnp.float32, speculate_len=spec,
        )
        eng.add_request(Request(rid=0, prompt=prompt, max_new_tokens=8))
        return eng.run()[0]

    plain = run(0)
    spec = run(3)
    assert len(spec) == len(plain) == 8
    out, margins = _greedy_manual(model, params, list(prompt), 8)
    _assert_tokens_match_modulo_ties(plain, out, margins)
    _assert_tokens_match_modulo_ties(spec, out, margins)


def test_engine_chunked_prefill_admission():
    """Chunked-prefill admission (prompts longer than prefill_chunk enter
    in chunk-sized pieces interleaved with decode) must produce the same
    greedy tokens as the whole-prompt engine, including while another
    request is mid-decode."""
    from xhy_flash_attention_tpu.models.gpt import GPTConfig, GPTLMHeadModel

    cfg = GPTConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_attention_heads_kv=2,
        intermediate_size=128, max_position_embeddings=0,
        rotary_emb_fraction=1.0, rms_norm=True,
        activation_function="swiglu", tie_word_embeddings=False,
        qkv_proj_bias=False, out_proj_bias=False,
        mlp_fc1_bias=False, mlp_fc2_bias=False, dtype=jnp.float32,
    )
    model = GPTLMHeadModel(cfg)
    # seed 4: both greedy trajectories keep top-2 margins >= 0.02, an
    # order of magnitude above chunked-vs-whole-prefill fp32 reduction
    # noise (seed 3's 0.0033 min margin made this test load-sensitive)
    rng = np.random.default_rng(4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    hk = cfg.num_attention_heads_kv
    d = cfg.hidden_size // cfg.num_attention_heads

    engine = InferenceEngine(
        model.apply, params,
        num_layers=cfg.num_hidden_layers, num_kv_heads=hk, head_dim=d,
        num_pages=64, page_size=128, max_batch=4, max_pages_per_seq=4,
        dtype=jnp.float32, prefill_chunk=64,
    )
    # short prompt admits one-shot and decodes while the long prompt (3
    # chunks of 64) prefills chunk-by-chunk
    short = rng.integers(0, cfg.vocab_size, (5,)).astype(np.int32)
    longp = rng.integers(0, cfg.vocab_size, (150,)).astype(np.int32)
    engine.add_request(Request(rid=0, prompt=short, max_new_tokens=6))
    engine.add_request(Request(rid=1, prompt=longp, max_new_tokens=6))
    results = engine.run()
    assert set(results) == {0, 1}
    for rid, prompt in ((0, short), (1, longp)):
        out, margins = _greedy_manual(model, params, list(prompt), 6,
                                      max_seqlen=256)
        _assert_tokens_match_modulo_ties(results[rid], out, margins)


def test_paged_decode_int8_matches_bf16():
    """INT8 paged cache decodes close to the float cache (dequant fused)."""
    rng = np.random.default_rng(5)
    b, hk, d, ps = 2, 2, 64, 128
    lengths = [130, 256]
    k, v, cache = _random_cache_setup(rng, b, hk, d, ps, lengths)
    from xhy_flash_attention_tpu.ops.quant import quantize_kv

    kq = quantize_kv(cache.k_pages.reshape(-1, 1, ps, d), jnp.int8)
    vq = quantize_kv(cache.v_pages.reshape(-1, 1, ps, d), jnp.int8)
    qcache = PagedKVCache.from_kv(
        kq.values.reshape(cache.k_pages.shape),
        vq.values.reshape(cache.v_pages.shape),
        cache.page_table, cache.lengths,
        k_scales=kq.scales.reshape(cache.k_pages.shape[0], hk, ps)[:, :, None, :],
        v_scales=vq.scales.reshape(cache.v_pages.shape[0], hk, ps)[:, :, None, :],
    )
    q = jnp.asarray(rng.standard_normal((b, 1, hk * 2, d)), jnp.float32)
    out_q = paged_flash_decode(q, qcache, softmax_scale=d ** -0.5)
    out_f = paged_flash_decode(q, cache, softmax_scale=d ** -0.5)
    err = np.abs(np.asarray(out_q) - np.asarray(out_f)).max()
    assert err < 0.05, err


def test_engine_int8_paged_matches_bf16_engine():
    """Continuous batching with an INT8 paged cache ~ matches float pages."""
    from xhy_flash_attention_tpu.models.gpt import GPTConfig, GPTLMHeadModel

    cfg = GPTConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_attention_heads_kv=2,
        intermediate_size=128, max_position_embeddings=0,
        rotary_emb_fraction=1.0, rms_norm=True,
        activation_function="swiglu", tie_word_embeddings=False,
        qkv_proj_bias=False, out_proj_bias=False,
        mlp_fc1_bias=False, mlp_fc2_bias=False, dtype=jnp.float32,
    )
    model = GPTLMHeadModel(cfg)
    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    hk = cfg.num_attention_heads_kv
    d = cfg.hidden_size // cfg.num_attention_heads
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (5, 9)]
    results = {}
    for name, dt in [("f32", jnp.float32), ("int8", jnp.int8)]:
        eng = InferenceEngine(
            model.apply, params,
            num_layers=cfg.num_hidden_layers, num_kv_heads=hk, head_dim=d,
            num_pages=32, page_size=128, max_batch=2, max_pages_per_seq=2,
            dtype=dt,
        )
        for i, p in enumerate(prompts):
            eng.add_request(Request(rid=i, prompt=p, max_new_tokens=5))
        results[name] = eng.run()
    # greedy paths may diverge after many steps; require the first tokens
    # to agree (quantization error is small vs logit gaps in a random model)
    for rid in results["f32"]:
        assert results["f32"][rid][0] == results["int8"][rid][0], results


@pytest.mark.parametrize("qdtype", ["int8", "float8_e4m3fn"])
def test_splitkv_quantized_matches_dequantized(qdtype):
    """Split-KV over a QUANTIZED cache (FA3 split-KV x k_descale/v_descale,
    flash_api.h:69-78,141-162): partials computed with fused dequant must
    match dense decode over the dequantized cache."""
    from xhy_flash_attention_tpu.ops.quant import dequantize_kv, quantize_kv

    dt = jnp.dtype(qdtype)
    rng = np.random.default_rng(3)
    b, h, hk, d = 2, 4, 2, 64
    S = 1024
    lengths = jnp.asarray([900, 512], jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    kq = quantize_kv(
        jnp.asarray(rng.standard_normal((b, hk, S, d)), jnp.float32), dt
    )
    vq = quantize_kv(
        jnp.asarray(rng.standard_normal((b, hk, S, d)), jnp.float32), dt
    )
    out_split = flash_decode_splitkv(
        q, kq, vq, lengths, softmax_scale=d ** -0.5,
        num_splits=2, block_k=256,
    )
    out_dense = _decode_attention_xla(
        q, dequantize_kv(kq), dequantize_kv(vq), lengths, d ** -0.5
    )
    np.testing.assert_allclose(
        np.asarray(out_split), np.asarray(out_dense), atol=2e-3, rtol=1e-3
    )


@pytest.mark.parametrize("qdtype", [None, "int8"])
def test_paged_prefill_chunked(qdtype):
    """Chunked prefill against a paged cache (≙ FA3 paged-KV prefill,
    csrc/flash_attn_v3/paged_kv.h): append uniform chunks of sq > 1 tokens
    with append_paged_kv, attend each chunk with paged_flash_decode, and
    match dense causal attention over the growing prefix."""
    from xhy_flash_attention_tpu.ops.flash_attention.reference import (
        attention_ref,
    )

    rng = np.random.default_rng(4)
    b, h, hk, d = 2, 4, 2, 64
    total, chunk, ps = 96, 32, 64
    dt = jnp.float32 if qdtype is None else jnp.dtype(qdtype)
    cache = PagedKVCache.create(
        num_pages=8, kv_heads=hk, page_size=ps, head_dim=d,
        batch=b, max_pages_per_seq=3, dtype=dt,
    )
    # map pages 0..2 for seq 0 and 3..5 for seq 1
    table = np.full((b, 3), 7, np.int32)
    table[0] = [0, 1, 2]
    table[1] = [3, 4, 5]
    import dataclasses as _dc
    cache = _dc.replace(cache, page_table=jnp.asarray(table))
    q_all = jnp.asarray(rng.standard_normal((b, total, h, d)), jnp.float32)
    k_all = jnp.asarray(rng.standard_normal((b, total, hk, d)), jnp.float32)
    v_all = jnp.asarray(rng.standard_normal((b, total, hk, d)), jnp.float32)
    atol = 2e-5 if qdtype is None else 2e-2
    for c0 in range(0, total, chunk):
        qc = q_all[:, c0:c0 + chunk]
        kc = jnp.swapaxes(k_all[:, c0:c0 + chunk], 1, 2)
        vc = jnp.swapaxes(v_all[:, c0:c0 + chunk], 1, 2)
        cache = append_paged_kv(
            cache, kc, vc, num_valid=jnp.full((b,), chunk, jnp.int32)
        )
        out = paged_flash_decode(qc, cache, softmax_scale=d ** -0.5)
        # dense reference: causal attention of this chunk over the prefix
        ref, _ = attention_ref(
            q_all[:, :c0 + chunk], k_all[:, :c0 + chunk],
            v_all[:, :c0 + chunk], causal=True, upcast=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref[:, c0:c0 + chunk]),
            atol=atol, rtol=1e-2,
        )
    assert np.asarray(cache.lengths).tolist() == [total, total]


@pytest.mark.parametrize("kind", ["dense", "int8", "paged"])
def test_fused_decode_step(kind):
    """fused_decode_step (one dispatch: rotary + append + attend,
    ≙ ft_attention.cpp:226) == the three separate ops."""
    from xhy_flash_attention_tpu.inference import fused_decode_step
    from xhy_flash_attention_tpu.layers.rotary import apply_rotary_emb
    from xhy_flash_attention_tpu.ops.flash_attention.decode_kernel import (
        flash_decode,
    )
    from xhy_flash_attention_tpu.ops.quant import QuantizedKV, quantize_kv

    rng = np.random.default_rng(5)
    b, h, hk, d, S = 2, 4, 2, 64, 256
    lengths = jnp.asarray([100, 37], jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((b, hk, 1, d)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((b, hk, 1, d)), jnp.float32)
    k0 = jnp.asarray(rng.standard_normal((b, hk, S, d)), jnp.float32)
    v0 = jnp.asarray(rng.standard_normal((b, hk, S, d)), jnp.float32)
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, d, 2, jnp.float32) / d))

    # reference: rotary at per-sample positions, manual append, flash_decode
    def ref_rot(x, off):
        freqs = jnp.asarray([[off]], jnp.float32)[..., None] * inv_freq
        return apply_rotary_emb(x, jnp.cos(freqs[0]), jnp.sin(freqs[0]))

    kr = jnp.stack([
        ref_rot(jnp.swapaxes(k_new, 1, 2)[i:i+1], int(lengths[i]))[0]
        for i in range(b)
    ])
    qr = jnp.stack([
        ref_rot(q[i:i+1], int(lengths[i]))[0] for i in range(b)
    ])
    kc_ref = k0
    vc_ref = v0
    for i in range(b):
        kc_ref = kc_ref.at[i, :, int(lengths[i])].set(
            jnp.swapaxes(kr, 1, 2)[i, :, 0])
        vc_ref = vc_ref.at[i, :, int(lengths[i])].set(v_new[i, :, 0])
    expect = flash_decode(
        qr, kc_ref, vc_ref, lengths + 1, softmax_scale=d ** -0.5
    )

    if kind == "dense":
        cache = (k0, v0)
        atol = 1e-5
    elif kind == "int8":
        cache = (quantize_kv(k0, jnp.int8), quantize_kv(v0, jnp.int8))
        atol = 6e-2  # int8 cache quantization error
    else:
        ps, npp = 64, 5
        c = PagedKVCache.create(16, hk, ps, d, b, npp, jnp.float32)
        table = np.full((b, npp), 15, np.int32)
        table[0] = [0, 1, 2, 3, 14]
        table[1] = [4, 5, 6, 7, 14]
        # scatter existing tokens into the pages
        kp, vp = c.k_pages, c.v_pages
        for i in range(b):
            for t in range(int(lengths[i])):
                kp = kp.at[table[i][t // ps], :, t % ps].set(k0[i, :, t])
                vp = vp.at[table[i][t // ps], :, t % ps].set(v0[i, :, t])
        cache = PagedKVCache.from_kv(kp, vp, jnp.asarray(table), lengths)
        atol = 1e-5
    out, new_cache = fused_decode_step(
        q, k_new, v_new, cache,
        None if kind == "paged" else lengths, inv_freq,
        softmax_scale=d ** -0.5,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), atol=atol, rtol=1e-2
    )
    if kind == "dense":
        np.testing.assert_allclose(
            np.asarray(new_cache[0]), np.asarray(kc_ref), atol=1e-6
        )


def test_engine_tensor_parallel_matches_single():
    """Continuous-batching engine over a TP-sharded model (heads + paged
    caches sharded over the tp axis via inference.tp.tp_model_apply) must
    generate the same tokens as the single-device engine — multi-chip
    serving ≙ the reference's multi-GPU generation
    (tests/models/test_gpt_generation_parallel.py) composed with
    continuous batching."""
    from xhy_flash_attention_tpu.inference import tp_model_apply
    from xhy_flash_attention_tpu.models.gpt import GPTConfig, GPTLMHeadModel
    from xhy_flash_attention_tpu.parallel import make_mesh
    from xhy_flash_attention_tpu.parallel.tp import (
        local_config,
        shard_gpt_params,
    )

    tp = 2
    cfg = GPTConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_attention_heads_kv=2,
        intermediate_size=128, max_position_embeddings=0,
        rotary_emb_fraction=1.0, rms_norm=True,
        activation_function="swiglu", tie_word_embeddings=False,
        qkv_proj_bias=False, out_proj_bias=False,
        mlp_fc1_bias=False, mlp_fc2_bias=False, dtype=jnp.float32,
    )
    model = GPTLMHeadModel(cfg)
    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (5, 9)]

    def run_engine(apply_fn, params_):
        eng = InferenceEngine(
            apply_fn, params_, num_layers=2, num_kv_heads=2, head_dim=16,
            num_pages=32, page_size=128, max_batch=4, max_pages_per_seq=2,
            dtype=jnp.float32,
        )
        for i, p in enumerate(prompts):
            eng.add_request(Request(rid=i, prompt=p, max_new_tokens=4))
        return eng.run()

    mesh = make_mesh(dp=1, tp=tp)
    lc = local_config(cfg, tp, sequence_parallel=False)
    model_tp = GPTLMHeadModel(lc)
    params_tp, specs = shard_gpt_params(params, cfg, tp, mesh)
    apply_tp = tp_model_apply(model_tp, specs, mesh, cfg.vocab_size)
    got = run_engine(apply_tp, params_tp)
    golden = run_engine(model.apply, params)
    # compare both engines against a manual greedy loop (which exposes
    # logit margins): token-exact except across argmax near-ties
    for i, prompt in enumerate(prompts):
        out, margins = _greedy_manual(model, params, list(prompt), 4)
        _assert_tokens_match_modulo_ties(got[i], out, margins)
        _assert_tokens_match_modulo_ties(golden[i], out, margins)


def test_paged_chunked_mixed_lengths_and_empty_slots():
    """The chunked paged kernel's cross-cell issue-ahead must stay
    correct (semaphores balanced, no stale-buffer reads) with empty
    continuous-batching slots and lengths far shorter than the chunk:
    per-page validity guards skip the gathers past each sequence's last
    page, and the next-valid-cell table hops over dead slots."""
    rng = np.random.default_rng(9)
    b, hk, d, ps = 4, 2, 64, 128
    h = 2 * hk
    # slot 1 empty; slot 3 a single token; slot 0 spans several pages
    lengths = [1000, 0, 77, 1]
    k, v, cache = _random_cache_setup(rng, b, hk, d, ps, lengths)
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    out = paged_flash_decode(q, cache, softmax_scale=d ** -0.5)
    ref = _decode_attention_xla(
        q, k, v, jnp.asarray(lengths, jnp.int32), d ** -0.5)
    live = np.asarray(lengths) > 0
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], atol=2e-5, rtol=1e-4)


def test_decode_sliding_window_matches_xla():
    """Windowed decode (retained long cache): the first-visible-block DMA
    clamp must not change numerics vs a dense XLA reference — blocks left
    of every query's window are skipped, boundary blocks masked."""
    from xhy_flash_attention_tpu.ops.flash_attention.decode_kernel import (
        flash_decode,
    )

    rng = np.random.default_rng(11)
    b, h, hk, d, S, w = 2, 4, 2, 64, 2048, 300
    k = jnp.asarray(rng.standard_normal((b, hk, S, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hk, S, d)), jnp.float32)
    lengths = jnp.asarray([1800, 700], jnp.int32)
    for sq in (1, 4):
        q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
        out = flash_decode(q, k, v, lengths, softmax_scale=d ** -0.5,
                           window_size=(w, -1), block_k=512)
        kk = jnp.repeat(k, h // hk, axis=1)
        vv = jnp.repeat(v, h // hk, axis=1)
        qt = jnp.swapaxes(q, 1, 2)
        s = jnp.einsum("bhqd,bhkd->bhqk", qt, kk) * d ** -0.5
        pos = lengths[:, None] - sq + jnp.arange(sq)[None]
        cols = jnp.arange(S)
        mask = ((cols[None, None] <= pos[..., None])
                & (cols[None, None] >= pos[..., None] - w))
        s = jnp.where(mask[:, None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        ref = jnp.swapaxes(jnp.einsum("bhqk,bhkd->bhqd", p, vv), 1, 2)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
