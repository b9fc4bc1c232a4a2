"""Vision Transformer with flash attention (≙ reference
flash_attn/models/vit.py — a timm-compatible ViT whose blocks run the fused
attention/MLP path).

Prenorm blocks on the shared Block module; class token + learned position
embeddings; sequence length is padded inside the attention kernel so the
197-token (224/16 + cls) case needs no special handling.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers.patch_embed import PatchEmbed
from ..modules.block import Block, _Norm
from ..modules.mha import MHA
from ..modules.mlp import Mlp

__all__ = ["ViTConfig", "VisionTransformer", "vit_config_to_config",
           "remap_state_dict_hf_vit"]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-6
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    use_cls_token: bool = True
    global_pool: str = "token"  # "token" | "avg"
    dtype: Any = jnp.float32


class VisionTransformer(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, deterministic: bool = True,
                 features_only: bool = False):
        """pixels: (b, c, h, w). Returns logits (b, num_classes) or, with
        features_only, the final hidden states (b, tokens, d)."""
        c = self.config
        x = PatchEmbed(
            img_size=c.img_size, patch_size=c.patch_size, in_chans=c.in_chans,
            embed_dim=c.embed_dim, dtype=c.dtype, name="patch_embed",
        )(pixels)
        b, n, d = x.shape
        if c.use_cls_token:
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, d),
                             jnp.float32)
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (b, 1, d)).astype(x.dtype), x], axis=1
            )
            n += 1
        pos = self.param("pos_embed",
                         nn.initializers.normal(stddev=0.02), (1, n, d),
                         jnp.float32)
        x = x + pos.astype(x.dtype)
        if not deterministic and c.drop_rate > 0:
            keep = 1.0 - c.drop_rate
            x = x * jax.random.bernoulli(
                self.make_rng("dropout"), keep, x.shape
            ).astype(x.dtype) / keep

        residual = None
        for i in range(c.depth):
            x, residual, _ = Block(
                dim=c.embed_dim,
                mixer=lambda *, name: MHA(
                    embed_dim=c.embed_dim, num_heads=c.num_heads,
                    causal=False, qkv_proj_bias=c.qkv_bias,
                    dropout=c.attn_drop_rate, dtype=c.dtype, name=name,
                ),
                mlp=lambda *, name: Mlp(
                    hidden_features=int(c.embed_dim * c.mlp_ratio),
                    activation="gelu", dtype=c.dtype, name=name,
                ),
                norm_eps=c.layer_norm_eps,
                prenorm=True,
                resid_dropout1=c.drop_rate,
                resid_dropout2=c.drop_rate,
                name=f"blocks_{i}",
            )(x, residual, deterministic=deterministic)
        x = _Norm(eps=c.layer_norm_eps, name="norm")(
            x, residual, 0.0, False, False
        )
        if features_only:
            return x
        if c.global_pool == "avg":
            feat = x[:, 1 if c.use_cls_token else 0:].mean(axis=1)
        else:
            feat = x[:, 0]
        if c.num_classes == 0:
            return feat
        return nn.Dense(c.num_classes, dtype=c.dtype, name="head")(feat)


def vit_config_to_config(hf_config, num_classes=0,
                         dtype=jnp.float32) -> ViTConfig:
    """transformers.ViTConfig -> ViTConfig."""
    c = hf_config
    return ViTConfig(
        img_size=c.image_size,
        patch_size=c.patch_size,
        in_chans=c.num_channels,
        num_classes=num_classes,
        embed_dim=c.hidden_size,
        depth=c.num_hidden_layers,
        num_heads=c.num_attention_heads,
        mlp_ratio=c.intermediate_size / c.hidden_size,
        qkv_bias=c.qkv_bias,
        layer_norm_eps=c.layer_norm_eps,
        drop_rate=c.hidden_dropout_prob,
        attn_drop_rate=c.attention_probs_dropout_prob,
        dtype=dtype,
    )


def remap_state_dict_hf_vit(state_dict: Dict[str, Any], config: ViTConfig):
    """torch transformers ViTModel state_dict (numpy) -> flax params."""
    import numpy as np

    sd = {k.removeprefix("vit."): v for k, v in state_dict.items()}

    def t(name):
        return jnp.asarray(np.asarray(sd[name]).T)

    def g(name):
        return jnp.asarray(np.asarray(sd[name]))

    # conv kernel: torch (out, in, kh, kw) -> flax (kh, kw, in, out)
    conv = np.asarray(sd["embeddings.patch_embeddings.projection.weight"])
    params: Dict[str, Any] = {
        "cls_token": g("embeddings.cls_token").reshape(1, 1, -1),
        "pos_embed": g("embeddings.position_embeddings"),
        "patch_embed": {
            "proj": {
                "kernel": jnp.asarray(conv.transpose(2, 3, 1, 0)),
                "bias": g("embeddings.patch_embeddings.projection.bias"),
            }
        },
        "norm": {"weight": g("layernorm.weight"),
                 "bias": g("layernorm.bias")},
    }
    for i in range(config.depth):
        p = f"encoder.layer.{i}."
        wqkv = jnp.concatenate([
            t(p + "attention.attention.query.weight"),
            t(p + "attention.attention.key.weight"),
            t(p + "attention.attention.value.weight"),
        ], axis=1)
        bqkv = jnp.concatenate([
            g(p + "attention.attention.query.bias"),
            g(p + "attention.attention.key.bias"),
            g(p + "attention.attention.value.bias"),
        ])
        params[f"blocks_{i}"] = {
            "norm1": {"weight": g(p + "layernorm_before.weight"),
                      "bias": g(p + "layernorm_before.bias")},
            "norm2": {"weight": g(p + "layernorm_after.weight"),
                      "bias": g(p + "layernorm_after.bias")},
            "mixer": {
                "Wqkv": {"kernel": wqkv, "bias": bqkv},
                "out_proj": {"kernel": t(p + "attention.output.dense.weight"),
                             "bias": g(p + "attention.output.dense.bias")},
            },
            "mlp": {
                "fc1": {"kernel": t(p + "intermediate.dense.weight"),
                        "bias": g(p + "intermediate.dense.bias")},
                "fc2": {"kernel": t(p + "output.dense.weight"),
                        "bias": g(p + "output.dense.bias")},
            },
        }
    return {"params": params}
