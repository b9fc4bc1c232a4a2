"""Shared helpers for the Pallas flash-attention kernel family."""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp

# Mask additions use a large-but-finite negative instead of -inf so that
# exp(masked - masked) never produces NaN (reference guards the same case at
# csrc/flash_attn/src/flash_fwd_kernel.h:509-514 by special-casing empty rows).
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

NEG_INF = DEFAULT_MASK_VALUE


def interpret_mode() -> bool:
    """Run Pallas kernels in interpret mode (tests on CPU set XFA_INTERPRET=1)."""
    env = os.environ.get("XFA_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() == "cpu"


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(a: int, b: int) -> int:
    return cdiv(a, b) * b


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Tile sizes for the attention kernels.

    Plays the role of the reference's per-head-dim tile table
    (csrc/flash_attn/src/flash_fwd_launch_template.h:72-87 and
    kernel_traits.h) — but chosen for the MXU/VMEM instead of smem/regs.
    """

    block_q: int = 256
    block_k: int = 256
    # backward tiles
    block_q_dkv: int = 128
    block_k_dkv: int = 256
    block_q_dq: int = 256
    block_k_dq: int = 128

    @staticmethod
    def for_shape(seqlen_q: int, seqlen_k: int, head_dim: int,
                  dtype=jnp.bfloat16) -> "BlockSizes":
        """Heuristic tile selection (≙ reference run_mha_fwd_hdim* configs)."""
        if head_dim <= 128:
            bq, bk = 256, 512
        else:
            bq, bk = 128, 256
        bq = min(bq, round_up(seqlen_q, 128))
        bk = min(bk, round_up(seqlen_k, 128))
        return BlockSizes(
            block_q=bq,
            block_k=bk,
            block_q_dkv=min(128, round_up(seqlen_q, 128)),
            block_k_dkv=min(256 if head_dim <= 128 else 128, round_up(seqlen_k, 128)),
            block_q_dq=min(256 if head_dim <= 128 else 128, round_up(seqlen_q, 128)),
            block_k_dq=min(128, round_up(seqlen_k, 128)),
        )


def pad_to_block(x: jax.Array, axis: int, block: int) -> jax.Array:
    """Zero-pad `axis` of x up to a multiple of `block`."""
    size = x.shape[axis]
    padded = round_up(size, block)
    if padded == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, padded - size)
    return jnp.pad(x, pads)
