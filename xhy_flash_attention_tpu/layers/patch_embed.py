"""Image-to-patch embedding (≙ reference flash_attn/layers/patch_embed.py).

The reference optionally flattens the conv into a linear on unfolded patches
(fused_bias_fc path); on TPU a stride=patch conv and the unfold+matmul lower
to the same MXU contraction, so a single lax.conv (NCHW in, like timm) is
used.
"""

from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp

__all__ = ["PatchEmbed"]


class PatchEmbed(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    bias: bool = True
    flatten: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (b, c, h, w) -> (b, num_patches, embed_dim) (flatten=True)."""
        p = self.patch_size
        b, c, h, w = x.shape
        assert h % p == 0 and w % p == 0, (h, w, p)
        x = x.transpose(0, 2, 3, 1)  # NHWC for flax conv
        x = nn.Conv(
            self.embed_dim, kernel_size=(p, p), strides=(p, p),
            use_bias=self.bias, dtype=self.dtype, name="proj",
        )(x)
        if self.flatten:
            x = x.reshape(b, -1, self.embed_dim)
        return x
