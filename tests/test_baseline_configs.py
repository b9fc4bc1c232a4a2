"""Integration tests mirroring the five BASELINE.json parity configs at
CI scale (tiny shapes, CPU interpret mode / 8-device mesh). Each test wires
the same components the full-scale config uses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xhy_flash_attention_tpu import flash_attn_func
from xhy_flash_attention_tpu.ops.flash_attention.reference import attention_ref


def test_config1_flash_attn_parity_bf16_causal():
    """#1: flash_attn_func bf16 causal B=2 S=512 H=8 D=64 vs reference math
    within the reference's 2x-of-low-precision-baseline contract."""
    rng = np.random.default_rng(0)
    b, s, h, d = 2, 512, 8, 64
    q, k, v = (jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
               for _ in range(3))
    out = flash_attn_func(q, k, v, causal=True)
    ref, _ = attention_ref(q.astype(jnp.float32), k.astype(jnp.float32),
                           v.astype(jnp.float32), causal=True)
    lp, _ = attention_ref(q, k, v, causal=True, upcast=False,
                          reorder_ops=True)
    err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
    err_lp = float(jnp.abs(lp.astype(jnp.float32) - ref).max())
    assert err <= 2 * err_lp, (err, err_lp)


def test_config2_gpt_prefill_varlen_packed_rotary():
    """#2: GPT prefill with varlen-packed sequences + rotary on one chip:
    packed segment-ids prefill == per-sequence independent prefills."""
    from xhy_flash_attention_tpu.bert_padding import pad_input, unpad_input
    from xhy_flash_attention_tpu.models.gpt import GPTConfig, GPTLMHeadModel

    cfg = GPTConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=0, rotary_emb_fraction=1.0,
        dtype=jnp.float32,
    )
    model = GPTLMHeadModel(cfg)
    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))

    # two ragged docs packed into one row with segment ids
    lens = [24, 40]
    docs = [rng.integers(0, 128, (n,)).astype(np.int32) for n in lens]
    total = sum(lens)
    packed = np.concatenate(docs)[None]  # (1, 64)
    seg = np.concatenate([np.full(n, i + 1) for i, n in enumerate(lens)])[None]
    # positions restart per document (rotary must see per-doc offsets)
    pos = np.concatenate([np.arange(n) for n in lens])[None]

    logits_packed, _ = model.apply(
        params, jnp.asarray(packed), position_ids=jnp.asarray(pos),
        segment_ids=jnp.asarray(seg),
    )
    off = 0
    for doc in docs:
        solo, _ = model.apply(params, jnp.asarray(doc[None]))
        got = np.asarray(logits_packed[0, off:off + len(doc)])
        np.testing.assert_allclose(got, np.asarray(solo[0]), atol=2e-4,
                                   rtol=1e-3)
        off += len(doc)


def test_config3_llama_geometry_int8_paged_continuous_batching():
    """#3: Llama-style GQA decode with INT8 paged KV + weight-only INT8
    matmuls under continuous batching (tiny geometry)."""
    from xhy_flash_attention_tpu.inference import InferenceEngine, Request
    from xhy_flash_attention_tpu.models.gpt import GPTConfig, GPTLMHeadModel
    from xhy_flash_attention_tpu.ops.quant import (
        quantize_weight,
        weight_only_quant_matmul,
    )

    cfg = GPTConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=8, num_attention_heads_kv=2,
        intermediate_size=128, max_position_embeddings=0,
        rotary_emb_fraction=1.0, rms_norm=True,
        activation_function="swiglu", tie_word_embeddings=False,
        qkv_proj_bias=False, out_proj_bias=False,
        mlp_fc1_bias=False, mlp_fc2_bias=False, dtype=jnp.float32,
    )
    model = GPTLMHeadModel(cfg)
    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    eng = InferenceEngine(
        model.apply, params, num_layers=2, num_kv_heads=2, head_dim=8,
        num_pages=32, page_size=128, max_batch=2, max_pages_per_seq=2,
        dtype=jnp.int8,
    )
    for i in range(3):  # more requests than slots -> continuous batching
        eng.add_request(Request(
            rid=i, prompt=rng.integers(0, 128, (4 + i,)).astype(np.int32),
            max_new_tokens=4,
        ))
    results = eng.run()
    assert set(results) == {0, 1, 2}
    assert all(len(v) == 4 for v in results.values())

    # weight-only INT8 path numerics
    w = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    wq, sc = quantize_weight(w, jnp.int8)
    err = float(jnp.abs(weight_only_quant_matmul(x, wq, sc) - x @ w).max())
    assert err < 0.05 * float(jnp.abs(x @ w).max()), err


def test_config4_mixtral_gqa_blocksparse_prefill_tp():
    """#4: Mixtral-style GQA + MoE forward, tensor/expert-parallel on the
    mesh, with blocksparse flash attention at the op level."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from xhy_flash_attention_tpu.ops.flash_attention import (
        blockmask_to_dense,
        blocksparse_attention,
    )
    from xhy_flash_attention_tpu.models.gpt import GPTConfig, GPTLMHeadModel

    # blocksparse GQA prefill (op level, longer seq)
    rng = np.random.default_rng(0)
    b, h, hk, s, d, g = 1, 8, 2, 512, 64, 128
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, hk, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, hk, s, d)), jnp.bfloat16)
    nb = s // g
    bm = jnp.maximum(jnp.asarray(rng.integers(0, 2, (1, 1, nb, nb)), jnp.int32),
                     jnp.eye(nb, dtype=jnp.int32)[None, None])
    out = blocksparse_attention(q, k, v, bm, block_size=g, causal=True)
    assert out.shape == (b, h, s, d)
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))

    # MoE model forward data-parallel over the mesh (components compose)
    cfg = GPTConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=8, num_attention_heads_kv=2,
        intermediate_size=128, max_position_embeddings=0,
        rotary_emb_fraction=1.0, rms_norm=True,
        activation_function="swiglu", tie_word_embeddings=False,
        qkv_proj_bias=False, out_proj_bias=False,
        mlp_fc1_bias=False, mlp_fc2_bias=False,
        num_local_experts=4, num_experts_per_tok=2, dtype=jnp.float32,
    )
    model = GPTLMHeadModel(cfg)
    ids = jnp.asarray(rng.integers(0, 128, (4, 32)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids[:1, :8])
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("dp",))
    fwd = shard_map(
        lambda p, x: model.apply(p, x)[0],
        mesh=mesh, in_specs=(P(), P("dp", None)), out_specs=P("dp", None),
        check_vma=False,
    )
    logits = fwd(params, ids)
    assert logits.shape == (4, 32, cfg.padded_vocab_size)


@pytest.mark.parametrize("qdtype", ["int8", "float8_e4m3fn"])
def test_config5_sharded_quantized_kv_decode_multichip(qdtype):
    """#5: quantized-KV (INT8 / FP8) decode with the cache sharded across
    the (virtual) mesh, merged with the ring/split-KV combine — the
    BASELINE north-star serving path: quantized pages AND cross-chip
    partial merge in one flow."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from xhy_flash_attention_tpu.ops.decode import _decode_attention_xla
    from xhy_flash_attention_tpu.ops.quant import (
        QuantizedKV, dequantize_kv, quantize_kv,
    )
    from xhy_flash_attention_tpu.parallel.ring import sharded_kv_decode

    dt = jnp.dtype(qdtype)
    rng = np.random.default_rng(0)
    n = 4
    b, h, hk, d, S_local = 2, 4, 2, 64, 128
    S = S_local * n
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hk, S, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hk, S, d)), jnp.float32)
    kq = quantize_kv(k, dt)
    vq = quantize_kv(v, dt)
    lengths = np.asarray([S, 300], np.int32)
    local_lengths = np.clip(
        lengths[None, :] - np.arange(n)[:, None] * S_local, 0, S_local
    )
    mesh = Mesh(np.asarray(jax.devices()[:n]), ("sp",))
    dec = shard_map(
        lambda q, kv_, ks_, vv_, vs_, ln: sharded_kv_decode(
            q, QuantizedKV(kv_, ks_), QuantizedKV(vv_, vs_), ln[0], "sp"
        ),
        mesh=mesh,
        in_specs=(P(), P(None, None, "sp", None), P(None, None, "sp", None),
                  P(None, None, "sp", None), P(None, None, "sp", None),
                  P("sp", None)),
        out_specs=P(),
        check_vma=False,
    )
    out = dec(q, kq.values, kq.scales, vq.values, vq.scales,
              jnp.asarray(local_lengths))
    # reference: exact attention over the DEQUANTIZED cache — only kernel
    # error counts, not quantization error
    expect = _decode_attention_xla(
        q, dequantize_kv(kq), dequantize_kv(vq), jnp.asarray(lengths),
        d ** -0.5,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=2e-3, rtol=1e-3)
