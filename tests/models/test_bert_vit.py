"""BERT and ViT parity vs HuggingFace torch (≙ reference
tests/models/test_bert.py, test_vit.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_bert_hidden_states_match_hf():
    from xhy_flash_attention_tpu.models.bert import (
        BertModel,
        bert_config_to_config,
        remap_state_dict_hf_bert,
    )

    hf_cfg = transformers.BertConfig(
        vocab_size=211, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=256,
        max_position_embeddings=128, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf_model = transformers.BertModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    cfg = bert_config_to_config(hf_cfg)
    model = BertModel(cfg)
    params = remap_state_dict_hf_bert(sd, cfg)

    rng = np.random.default_rng(0)
    b, s = 2, 48
    ids = rng.integers(0, hf_cfg.vocab_size, (b, s))
    # ragged attention mask incl. a fully-padded tail
    lens = np.array([s, s - 17])
    mask = (np.arange(s)[None, :] < lens[:, None]).astype(np.int64)

    with torch.no_grad():
        ref = hf_model(
            torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    out, pooled = model.apply(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
    )
    out = np.asarray(out)
    # compare only valid positions (HF computes garbage on pads too,
    # but values at pads are not meaningful)
    err = (np.abs(out - ref) * mask[:, :, None]).max()
    assert err < 2e-3, err
    assert pooled.shape == (b, hf_cfg.hidden_size)

    # pooler parity (depends only on CLS, always valid)
    with torch.no_grad():
        ref_pooled = hf_model(
            torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).pooler_output.numpy()
    err_p = np.abs(np.asarray(pooled) - ref_pooled).max()
    assert err_p < 2e-3, err_p


def test_bert_pretraining_heads():
    from xhy_flash_attention_tpu.models.bert import (
        BertConfig,
        BertForPreTraining,
    )

    cfg = BertConfig(
        vocab_size=211, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = BertForPreTraining(cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    mlm, nsp = model.apply(params, ids)
    assert mlm.shape == (2, 32, cfg.padded_vocab_size)
    assert nsp.shape == (2, 2)
    # masked-token-only head: gathered rows match the full pass
    pos = jnp.asarray([[1, 5, 7], [0, 2, 30]], jnp.int32)
    mlm_sub, _ = model.apply(params, ids, masked_positions=pos)
    full_rows = jnp.take_along_axis(mlm, pos[:, :, None], axis=1)
    np.testing.assert_allclose(
        np.asarray(mlm_sub), np.asarray(full_rows), atol=1e-5
    )


def test_vit_hidden_states_match_hf():
    from xhy_flash_attention_tpu.models.vit import (
        VisionTransformer,
        remap_state_dict_hf_vit,
        vit_config_to_config,
    )

    hf_cfg = transformers.ViTConfig(
        image_size=32, patch_size=8, num_channels=3, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf_model = transformers.ViTModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    cfg = vit_config_to_config(hf_cfg, num_classes=0)
    model = VisionTransformer(cfg)
    params = remap_state_dict_hf_vit(sd, cfg)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf_model(torch.tensor(pixels)).last_hidden_state.numpy()
    out = model.apply(params, jnp.asarray(pixels), features_only=True)
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 2e-3, err
