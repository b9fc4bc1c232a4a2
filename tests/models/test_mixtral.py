"""Mixtral (MoE) logits parity vs HF + expert-parallel equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from xhy_flash_attention_tpu.models.gpt import GPTLMHeadModel
from xhy_flash_attention_tpu.models.mixtral import (
    mixtral_config_to_gpt_config,
    remap_state_dict_hf_mixtral,
)


def _tiny_hf_cfg(sliding_window=None):
    return transformers.MixtralConfig(
        vocab_size=173, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        sliding_window=sliding_window, attention_dropout=0.0,
        tie_word_embeddings=False, output_router_logits=False,
    )


@pytest.mark.parametrize("sliding_window", [None, 16])
def test_mixtral_logits_match_hf(sliding_window):
    hf_cfg = _tiny_hf_cfg(sliding_window)
    torch.manual_seed(0)
    hf_model = transformers.MixtralForCausalLM(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    cfg = mixtral_config_to_gpt_config(hf_cfg)
    model = GPTLMHeadModel(cfg)
    params = remap_state_dict_hf_mixtral(sd, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, hf_cfg.vocab_size, (2, 48))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    out, _ = model.apply(params, jnp.asarray(ids, jnp.int32))
    err = np.abs(np.asarray(out)[..., :hf_cfg.vocab_size] - ref).max()
    assert err < 3e-3, err


def test_moe_expert_parallel_matches_dense():
    """EP over 4 ranks == single-device MoE."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from xhy_flash_attention_tpu.modules.moe import MoEMlp

    E, k, d, inner, n = 4, 2, 64, 128, 32
    dense = MoEMlp(num_experts=E, num_experts_per_tok=k,
                   hidden_features=inner)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    params = dense.init(jax.random.PRNGKey(0), x)
    expect = dense.apply(params, x)

    ep = 4
    mesh = Mesh(np.asarray(jax.devices()[:ep]), ("ep",))
    local = MoEMlp(num_experts=E // ep, num_experts_per_tok=k,
                   hidden_features=inner, ep_axis="ep",
                   num_experts_global=E)

    def run(p, x):
        return local.apply(p, x)

    specs = {"params": {"gate": {"kernel": P()},
                        "w1": P("ep", None, None),
                        "w2": P("ep", None, None)}}
    out = shard_map(
        run, mesh=mesh, in_specs=(specs, P()), out_specs=P(),
        check_vma=False,
    )(params, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), atol=2e-5, rtol=1e-4
    )


def test_moe_grouped_matches_dense_dispatch():
    """Grouped (ragged_dot megablocks-style) dispatch == dense dispatch,
    single device."""
    from xhy_flash_attention_tpu.modules.moe import MoEMlp

    E, k = 8, 2
    moe_d = MoEMlp(num_experts=E, num_experts_per_tok=k,
                   hidden_features=64, grouped=False)
    moe_g = MoEMlp(num_experts=E, num_experts_per_tok=k,
                   hidden_features=64, grouped=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (96, 32), jnp.float32)
    params = moe_d.init(jax.random.PRNGKey(1), x)
    out_d = moe_d.apply(params, x)
    out_g = jax.jit(moe_g.apply)(params, x)
    np.testing.assert_allclose(
        np.asarray(out_g), np.asarray(out_d), atol=2e-5, rtol=1e-4
    )


def test_moe_grouped_expert_parallel():
    """Grouped dispatch under EP: non-local assignments sort to the tail
    (ragged_dot zero rows) and the psum reassembles exactly."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from xhy_flash_attention_tpu.modules.moe import MoEMlp

    E, k, ep = 8, 2, 4
    moe_d = MoEMlp(num_experts=E, num_experts_per_tok=k,
                   hidden_features=64, grouped=False)
    x = jax.random.normal(jax.random.PRNGKey(2), (64, 32), jnp.float32)
    params = moe_d.init(jax.random.PRNGKey(3), x)
    expect = moe_d.apply(params, x)

    local = MoEMlp(num_experts=E // ep, num_experts_per_tok=k,
                   hidden_features=64, ep_axis="ep",
                   num_experts_global=E, grouped=True)
    mesh = Mesh(np.asarray(jax.devices()[:ep]), ("ep",))
    run = shard_map(
        lambda p, x: local.apply(p, x),
        mesh=mesh,
        in_specs=({"params": {"gate": {"kernel": P()},
                              "w1": P("ep", None, None),
                              "w2": P("ep", None, None)}}, P()),
        out_specs=P(),
        check_vma=False,
    )
    out = jax.jit(run)(params, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), atol=2e-5, rtol=1e-4
    )
