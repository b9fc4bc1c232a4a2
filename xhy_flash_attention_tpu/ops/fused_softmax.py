"""Scaled masked softmax (Megatron-style).

TPU-native equivalent of the reference's fused softmax kernels
(csrc/fused_softmax/fused_softmax.cpp:129-145 scaled_masked_softmax /
scaled_upper_triang_masked_softmax) and their Python wrapper
(flash_attn/fused_softmax.py:97,155 FusedScaleMaskSoftmax).

On TPU there is nothing to hand-fuse: scale + mask + softmax is a chain of
elementwise ops and a lane reduction that XLA fuses into one VPU pass over
VMEM-resident tiles, so these are plain jnp functions kept for API parity.
The `FusedScaleMaskSoftmax` class preserves the reference's semantics:
optional fp32 upcast of bf16/fp16 inputs (`softmax_in_fp32`), additive
`mask_func` behavior (masked positions filled before softmax), and the
causal (upper-triangular) fast path.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

__all__ = [
    "scaled_masked_softmax",
    "scaled_upper_triang_masked_softmax",
    "FusedScaleMaskSoftmax",
]

_MASK_FILL = -10000.0


def scaled_masked_softmax(x: jnp.ndarray, mask: Optional[jnp.ndarray],
                          scale: float = 1.0) -> jnp.ndarray:
    """softmax(scale * x + mask_fill) over the last axis.

    mask: boolean, True = masked out, broadcastable to x
    (≙ scaled_masked_softmax_forward, csrc/fused_softmax/fused_softmax.cpp).
    """
    s = x * scale
    if mask is not None:
        s = jnp.where(mask, _MASK_FILL, s)
    return _softmax(s).astype(x.dtype)


def _softmax(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def scaled_upper_triang_masked_softmax(x: jnp.ndarray,
                                       scale: float = 1.0) -> jnp.ndarray:
    """Causal softmax for (..., sq, sk) scores with sq == sk
    (≙ scaled_upper_triang_masked_softmax_forward)."""
    sq, sk = x.shape[-2], x.shape[-1]
    rows = jnp.arange(sq, dtype=jnp.int32)[:, None]
    cols = jnp.arange(sk, dtype=jnp.int32)[None, :]
    s = jnp.where(cols > rows + (sk - sq), _MASK_FILL, x * scale)
    return _softmax(s).astype(x.dtype)


class FusedScaleMaskSoftmax:
    """API-parity port of flash_attn/fused_softmax.py:97.

    attn_mask_type: "causal" uses the upper-triangular path; "padding" uses
    the explicit mask. mask_func is kept for reference compatibility but the
    standard fill value is applied directly.
    """

    def __init__(
        self,
        input_in_fp16: bool = False,
        input_in_bf16: bool = False,
        attn_mask_type: str = "padding",
        scaled_masked_softmax_fusion: bool = True,  # kept for parity; unused
        mask_func: Optional[Callable] = None,
        softmax_in_fp32: bool = True,
        scale: Optional[float] = None,
    ):
        self.input_in_float16 = input_in_fp16 or input_in_bf16
        self.attn_mask_type = attn_mask_type
        self.mask_func = mask_func
        self.softmax_in_fp32 = softmax_in_fp32
        self.scale = scale
        if self.scale is not None and not softmax_in_fp32:
            raise ValueError("softmax should be in fp32 when scaled")

    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        dtype = x.dtype
        if self.input_in_float16 and self.softmax_in_fp32:
            x = x.astype(jnp.float32)
        scale = self.scale if self.scale is not None else 1.0
        if self.attn_mask_type == "causal":
            out = scaled_upper_triang_masked_softmax(x, scale)
        elif self.mask_func is not None and mask is not None:
            out = _softmax(self.mask_func(x * scale, mask))
        else:
            out = scaled_masked_softmax(x, mask, scale)
        return out.astype(dtype)
