"""Tensor/sequence-parallel GPT == single-device GPT (≙ reference
tests/models/test_gpt_parallel.py — run on the forced 8-device CPU mesh
instead of torchrun+NCCL)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from xhy_flash_attention_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from xhy_flash_attention_tpu.parallel import make_mesh
from xhy_flash_attention_tpu.parallel.tp import (
    combine_gpt_params,
    local_config,
    shard_gpt_params,
)


def _mk_config(**kw):
    base = dict(
        vocab_size=256, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=8, num_attention_heads_kv=4,
        intermediate_size=256, max_position_embeddings=0,
        rotary_emb_fraction=1.0, rms_norm=True,
        activation_function="swiglu", tie_word_embeddings=False,
        qkv_proj_bias=False, out_proj_bias=False,
        mlp_fc1_bias=False, mlp_fc2_bias=False,
    )
    base.update(kw)
    return GPTConfig(**base)


@pytest.mark.parametrize("sequence_parallel", [False, True])
@pytest.mark.parametrize("tp", [2, 4])
def test_tp_forward_matches_single_device(tp, sequence_parallel):
    cfg = _mk_config()
    model = GPTLMHeadModel(cfg)
    b, s = 2, 64
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    ref_logits, _ = model.apply(params, ids)

    mesh = make_mesh(dp=1, tp=tp)
    lc = local_config(cfg, tp, sequence_parallel=sequence_parallel)
    model_tp = GPTLMHeadModel(lc)
    params_tp, specs = shard_gpt_params(params, cfg, tp, mesh)

    def local_fwd(p, ids):
        logits, _ = model_tp.apply(p, ids)
        # logits are (b, s, V/tp) vocab-sharded (SP gathers seq in the head)
        return jax.lax.all_gather(logits, "tp", axis=2, tiled=True)

    fwd = shard_map(
        local_fwd, mesh=mesh,
        in_specs=(specs, P(None, None)),
        out_specs=P(None, None, None),
        check_vma=False,
    )
    tp_logits = fwd(params_tp, ids)
    err = float(jnp.abs(tp_logits - ref_logits).max())
    assert err < 2e-3, err


def test_shard_combine_roundtrip():
    cfg = _mk_config(qkv_proj_bias=True, activation_function="swiglu")
    model = GPTLMHeadModel(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), ids)
    sharded, _ = shard_gpt_params(params, cfg, 4)
    restored = combine_gpt_params(sharded, cfg, 4)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, restored,
    )


def test_tp_with_dp_and_grads():
    """dp x tp train-style step: TP grads combine to the single-device grads."""
    cfg = _mk_config()
    tp, dp = 2, 2
    model = GPTLMHeadModel(cfg)
    b, s = 4, 32
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    params = model.init(jax.random.PRNGKey(2), ids)

    def loss_single(p):
        logits, _ = model.apply(p, ids)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        ll = jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        return -ll.mean()

    ref_loss, ref_grads = jax.value_and_grad(loss_single)(params)

    mesh = make_mesh(dp=dp, tp=tp)
    lc = local_config(cfg, tp)
    model_tp = GPTLMHeadModel(lc)
    params_tp, specs = shard_gpt_params(params, cfg, tp, mesh)

    def local_loss(p, ids, labels):
        from xhy_flash_attention_tpu.losses.cross_entropy import (
            cross_entropy_loss,
        )

        logits, _ = model_tp.apply(p, ids)  # (b/dp, s, V/tp) vocab-sharded
        v_local = logits.shape[-1]
        vocab_start = jax.lax.axis_index("tp") * v_local
        losses = cross_entropy_loss(
            logits.reshape(-1, v_local).astype(jnp.float32),
            labels.reshape(-1), 0.0, -100, 0.0, "tp", vocab_start,
        )
        return losses.mean()

    def local_step(p, ids, labels):
        loss, grads = jax.value_and_grad(local_loss)(p, ids, labels)
        loss = jax.lax.pmean(loss, "dp")
        # data-parallel grad all-reduce (≙ DDP bucketed all-reduce)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, "dp"), grads)
        return loss, grads

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(specs, P("dp", None), P("dp", None)),
        out_specs=(P(), specs),
        check_vma=False,
    )
    tp_loss, tp_grads = step(params_tp, ids, labels)
    assert abs(float(tp_loss) - float(ref_loss)) < 1e-4

    combined = combine_gpt_params(tp_grads, cfg, tp)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_tp = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(combined)
    )
    for k, vref in flat_ref:
        vtp = flat_tp[jax.tree_util.keystr(k)]
        err = float(jnp.abs(vtp - vref).max())
        scale = float(jnp.abs(vref).max())
        assert err < 2e-3 + 2e-3 * scale, (jax.tree_util.keystr(k), err, scale)


def test_tp_generation_matches_single_device():
    """Greedy cached decode under TP == single-device decode
    (≙ reference tests/models/test_gpt_generation_parallel.py)."""
    tp = 4
    cfg = _mk_config(dtype=jnp.float32)
    model = GPTLMHeadModel(cfg)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, (1, 7)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(prompt))

    # single-device golden decode
    S = 64
    caches = model.allocate_kv_caches(1, S, dtype=jnp.float32)
    logits, caches = model.apply(
        params, jnp.asarray(prompt), kv_caches=caches, seqlen_offset=0
    )
    toks = [int(jnp.argmax(logits[0, -1]))]
    n = prompt.shape[1]
    for step in range(5):
        logits, caches = model.apply(
            params, jnp.asarray([[toks[-1]]], jnp.int32), kv_caches=caches,
            seqlen_offset=n + step,
        )
        toks.append(int(jnp.argmax(logits[0, 0])))

    # TP decode: heads and caches sharded over tp; logits vocab-sharded and
    # concatenated by the out spec
    mesh = make_mesh(dp=1, tp=tp)
    lc = local_config(cfg, tp, sequence_parallel=False)
    model_tp = GPTLMHeadModel(lc)
    params_tp, specs = shard_gpt_params(params, cfg, tp, mesh)
    hk = cfg.num_attention_heads_kv
    d = cfg.hidden_size // cfg.num_attention_heads
    kc = jnp.zeros((1, hk, S, d), jnp.float32)
    cache_specs = [(P(None, "tp", None, None), P(None, "tp", None, None))
                   for _ in range(cfg.num_hidden_layers)]
    caches_tp = [(kc, kc) for _ in range(cfg.num_hidden_layers)]

    def run(p, ids, caches, offset):
        logits, caches = model_tp.apply(
            p, ids, kv_caches=caches, seqlen_offset=offset
        )
        return logits, caches

    def make(offset, seqlen):
        return shard_map(
            functools.partial(run, offset=offset),
            mesh=mesh,
            in_specs=(specs, P(), cache_specs),
            out_specs=(P(None, None, "tp"), cache_specs),
            check_vma=False,
        )

    logits, caches_tp = make(0, n)(params_tp, jnp.asarray(prompt), caches_tp)
    toks_tp = [int(jnp.argmax(logits[0, -1, :cfg.vocab_size]))]
    for step in range(5):
        logits, caches_tp = make(n + step, 1)(
            params_tp, jnp.asarray([[toks_tp[-1]]], jnp.int32), caches_tp
        )
        toks_tp.append(int(jnp.argmax(logits[0, 0, :cfg.vocab_size])))
    assert toks_tp == toks, (toks_tp, toks)


def test_context_parallel_forward_matches_single_device():
    """Ring attention inside the model: sequence sharded over a cp axis,
    logits match the single-device forward (SURVEY D5 new design)."""
    cp = 4
    cfg = _mk_config(dtype=jnp.float32)
    model = GPTLMHeadModel(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 256)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids[:, :8])
    expect, _ = model.apply(params, ids)

    cfg_cp = GPTConfig(**{**cfg.__dict__, "context_parallel_axis": "tp"})
    model_cp = GPTLMHeadModel(cfg_cp)
    mesh = make_mesh(dp=1, tp=cp)
    out = shard_map(
        lambda p, x: model_cp.apply(p, x)[0],
        mesh=mesh,
        in_specs=(P(), P(None, "tp")),
        out_specs=P(None, "tp"),
        check_vma=False,
    )(params, ids)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), atol=2e-4, rtol=1e-3
    )


def test_context_parallel_zigzag_matches_single_device():
    """Balanced zigzag CP with ROTARY: the data pipeline feeds
    zigzag-permuted token shards; MHA rebuilds rotary at the matching
    zigzag global positions and the ring masks by the same positions, so
    unsharding the logits must reproduce the single-device forward."""
    from xhy_flash_attention_tpu.parallel.ring import (
        zigzag_shard,
        zigzag_unshard,
    )

    cp = 4
    cfg = _mk_config(dtype=jnp.float32)
    model = GPTLMHeadModel(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 256)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids[:, :8])
    expect, _ = model.apply(params, ids)

    cfg_cp = GPTConfig(**{**cfg.__dict__, "context_parallel_axis": "tp",
                          "context_parallel_zigzag": True})
    model_cp = GPTLMHeadModel(cfg_cp)
    mesh = make_mesh(dp=1, tp=cp)
    ids_z = zigzag_shard(ids, cp, axis=1)
    out_z = shard_map(
        lambda p, x: model_cp.apply(p, x)[0],
        mesh=mesh,
        in_specs=(P(), P(None, "tp")),
        out_specs=P(None, "tp"),
        check_vma=False,
    )(params, ids_z)
    out = zigzag_unshard(out_z, cp, axis=1)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), atol=2e-4, rtol=1e-3
    )
