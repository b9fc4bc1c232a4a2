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


def dropout_keep_mask(seed, salt, rows, cols, dropout_p: float):
    """Counter-based keep mask (True = keep), keyed on *global* positions.

    Plays the role of the reference's Philox counters (flash.h philox_args):
    the mask for an element depends only on (seed, salt, row, col), never on
    tile sizes or grid order, so forward and backward — with different
    tilings — regenerate identical masks. Murmur3-style finalizer over a
    Weyl-sequence mix; cheap VPU int ops, works compiled and interpreted.

    rows: int32 (m, 1) global row ids; cols: int32 (1, n) global col ids;
    seed: int32 scalar; salt: int32 scalar (e.g. batch*H + head).
    """
    u = jnp.uint32
    x = (
        rows.astype(jnp.uint32) * u(0x9E3779B1)
        + cols.astype(jnp.uint32) * u(0x85EBCA77)
        + (seed.astype(jnp.uint32) ^ (salt.astype(jnp.uint32) * u(0xC2B2AE3D)))
    )
    x = x ^ jax.lax.shift_right_logical(x, u(16))
    x = x * u(0x7FEB352D)
    x = x ^ jax.lax.shift_right_logical(x, u(15))
    x = x * u(0x846CA68B)
    x = x ^ jax.lax.shift_right_logical(x, u(16))
    threshold = u(min(int(dropout_p * 4294967296.0), 4294967295))
    return x >= threshold


def pad_to_block(x: jax.Array, axis: int, block: int) -> jax.Array:
    """Zero-pad `axis` of x up to a multiple of `block`."""
    size = x.shape[axis]
    padded = round_up(size, block)
    if padded == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, padded - size)
    return jnp.pad(x, pads)
