"""Fused softmax-cross-entropy with label smoothing and tensor-parallel
vocab sharding (≙ reference csrc/xentropy + flash_attn/losses/cross_entropy.py).

The CUDA kernel (K17, xentropy/interface.cpp:57) fuses logsumexp + nll and
exposes an in-place backward; on TPU the same fusion falls out of XLA from a
hand-written VJP (we save only (losses-independent) lse + labels, never the
softmax). The TP path mirrors the reference (cross_entropy.py:22-95): each
rank holds a vocab shard, computes a *local* lse and the local label logit,
then a psum over the tensor axis builds the global lse and picks the owning
rank's logit — one scalar-vector collective instead of gathering logits.

`ignore_index` rows produce zero loss and zero gradient.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.flash_attention.common import interpret_mode

__all__ = ["cross_entropy_loss", "CrossEntropyLoss"]

# Route the backward's dlogits through the Pallas kernel above this many
# logits elements (the lm-head hot path); tiny shapes stay pure-XLA.
_KERNEL_MIN_SIZE = 1 << 22


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ce_core(logits, labels, vocab_start, label_smoothing, ignore_index,
             lse_square_scale, axis_name):
    losses, _ = _ce_fwd_impl(
        logits, labels, label_smoothing, ignore_index, lse_square_scale,
        axis_name, vocab_start,
    )
    return losses


def cross_entropy_loss(
    logits: jax.Array,
    labels: jax.Array,
    label_smoothing: float = 0.0,
    ignore_index: int = -100,
    lse_square_scale: float = 0.0,
    axis_name: Optional[str] = None,
    vocab_start=0,
):
    """logits: (n, vocab_local) fp; labels: (n,) int32 *global* ids.

    Returns per-token losses (n,) fp32. When ``axis_name`` is set the
    function must run inside shard_map/pjit with the vocab dimension sharded
    over that mesh axis; ``vocab_start`` is this shard's global offset
    (e.g. ``jax.lax.axis_index(axis) * vocab_local`` — may be traced).
    """
    vocab_start = jnp.asarray(vocab_start, jnp.int32)
    return _ce_core(logits, labels, vocab_start, label_smoothing,
                    ignore_index, lse_square_scale, axis_name)


def _ce_fwd_impl(logits, labels, label_smoothing, ignore_index,
                 lse_square_scale, axis_name, vocab_start):
    n, v_local = logits.shape
    x = logits.astype(jnp.float32)
    m = jnp.max(x, axis=-1)
    local_lse = m + jnp.log(jnp.sum(jnp.exp(x - m[:, None]), axis=-1))
    local_labels = labels - vocab_start
    in_shard = (local_labels >= 0) & (local_labels < v_local)
    safe_labels = jnp.clip(local_labels, 0, v_local - 1)
    label_logit_local = jnp.where(
        in_shard, jnp.take_along_axis(x, safe_labels[:, None], axis=1)[:, 0], 0.0
    )
    if label_smoothing > 0.0:
        sum_logits_local = jnp.sum(x, axis=-1)
    else:
        sum_logits_local = jnp.zeros_like(local_lse)

    if axis_name is not None:
        # global lse via streaming logsumexp over shards; label logit and
        # sum-of-logits via psum (exactly one rank contributes the logit).
        gmax = jax.lax.pmax(local_lse, axis_name)
        lse = jnp.log(
            jax.lax.psum(jnp.exp(local_lse - gmax), axis_name)
        ) + gmax
        label_logit = jax.lax.psum(label_logit_local, axis_name)
        sum_logits = jax.lax.psum(sum_logits_local, axis_name)
        total_classes = v_local * jax.lax.psum(1, axis_name)
    else:
        lse = local_lse
        label_logit = label_logit_local
        sum_logits = sum_logits_local
        total_classes = v_local

    valid = labels != ignore_index
    eps = label_smoothing
    if eps > 0.0:
        # smoothed: (1-eps)*nll + eps * mean over classes of (lse - logit)
        losses = (1.0 - eps) * (lse - label_logit) + eps * (
            lse - sum_logits / total_classes
        )
    else:
        losses = lse - label_logit
    if lse_square_scale > 0.0:
        losses = losses + lse_square_scale * lse * lse
    losses = jnp.where(valid, losses, 0.0)
    return losses, (logits, labels, lse, valid)


def _ce_fwd(logits, labels, vocab_start, label_smoothing, ignore_index,
            lse_square_scale, axis_name):
    losses, res = _ce_fwd_impl(
        logits, labels, label_smoothing, ignore_index, lse_square_scale,
        axis_name, vocab_start,
    )
    return losses, res + (vocab_start,)


def _ce_dlogits_kernel(lab_ref, lse_ref, gs_ref, logits_ref, dl_ref, *, bv):
    # one (bn, bv) tile: dl = (exp(x - lse) - onehot(label)) * grad_scale
    j = pl.program_id(1)
    x = logits_ref[...].astype(jnp.float32)
    p = jnp.exp(x - lse_ref[...])  # lse (bn, 1) broadcasts over lanes
    cols = j * bv + jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    onehot = (cols == lab_ref[...]).astype(jnp.float32)  # lab -1 => no hit
    dl_ref[...] = ((p - onehot) * gs_ref[...]).astype(dl_ref.dtype)


def _ce_dlogits_pallas(logits, lab, lse, grad_scale):
    """Materialized bf16/fp32 dlogits at HBM bandwidth (eps=0 fast path).

    XLA's default is to re-fuse the exp chain into BOTH lm-head backward
    matmuls, which drags the dW matmul to ~86 TF/s (measured, gpt2m step
    profile) — one streaming pass here lets both matmuls run clean.
    """
    n, v = logits.shape
    bn = min(n, 256)
    bv = min(v, 2048)
    row = pl.BlockSpec((bn, 1), lambda i, j: (i, 0))
    # under shard_map(check_vma=True) the output must declare its mesh-axis
    # variance: the union of the operands' (dlogits varies wherever any
    # input does)
    vma = frozenset().union(*(
        getattr(jax.typeof(x), "vma", frozenset()) or frozenset()
        for x in (logits, lab, lse, grad_scale)
    ))
    if vma:
        out = jax.ShapeDtypeStruct((n, v), logits.dtype, vma=vma)
        lift = lambda x: jax.lax.pvary(
            x, tuple(vma - (getattr(jax.typeof(x), "vma", None) or frozenset()))
        )
        logits, lab, lse, grad_scale = map(lift, (logits, lab, lse, grad_scale))
    else:
        out = jax.ShapeDtypeStruct((n, v), logits.dtype)
    return pl.pallas_call(
        functools.partial(_ce_dlogits_kernel, bv=bv),
        grid=(pl.cdiv(n, bn), pl.cdiv(v, bv)),
        in_specs=[row, row, row,
                  pl.BlockSpec((bn, bv), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((bn, bv), lambda i, j: (i, j)),
        out_shape=out,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(
        lab.reshape(n, 1),
        lse.astype(jnp.float32).reshape(n, 1),
        grad_scale.reshape(n, 1),
        logits,
    )


def _ce_bwd(label_smoothing, ignore_index, lse_square_scale, axis_name,
            res, g):
    logits, labels, lse, valid, vocab_start = res
    dtype = logits.dtype
    n, v_local = logits.shape
    grad_scale = jnp.where(valid, g, 0.0).astype(jnp.float32)
    eps = label_smoothing
    local_labels = labels - vocab_start
    in_shard = (local_labels >= 0) & (local_labels < v_local)
    # interpret mode can't run the kernel body under shard_map's vma
    # tracking (pvary'd refs feed plain-iota compares); the compiled path
    # discharges the body outside vma semantics and is fine
    vma_blocked = interpret_mode() and bool(
        getattr(jax.typeof(logits), "vma", None) or frozenset()
    )
    if (
        eps == 0.0
        and lse_square_scale == 0.0
        and n * v_local >= _KERNEL_MIN_SIZE
        and not vma_blocked
        and os.environ.get("XFA_XENT_KERNEL", "1") != "0"
    ):
        lab = jnp.where(in_shard, local_labels, -1).astype(jnp.int32)
        return _ce_dlogits_pallas(logits, lab, lse, grad_scale), None, None
    x = logits.astype(jnp.float32)
    # softmax over the global vocab: exp(x - lse)
    p = jnp.exp(x - lse[:, None])
    total = v_local
    if axis_name is not None:
        total = v_local * jax.lax.psum(1, axis_name)
    safe = jnp.clip(local_labels, 0, v_local - 1)
    onehot = jax.nn.one_hot(safe, v_local, dtype=jnp.float32) * in_shard[:, None]
    if eps > 0.0:
        dlogits = p * (1.0 + 2.0 * lse_square_scale * lse[:, None]) \
            - (1.0 - eps) * onehot - eps / total
    else:
        dlogits = p * (1.0 + 2.0 * lse_square_scale * lse[:, None]) - onehot
    dlogits = dlogits * grad_scale[:, None]
    # NOTE: an optimization_barrier here (materializing through XLA) was
    # measured NET SLOWER (gpt2m 92.20 vs 91.62 ms) — the Pallas streaming
    # kernel above is how the hot path escapes the re-fused exp chain.
    return dlogits.astype(dtype), None, None


_ce_core.defvjp(_ce_fwd, _ce_bwd)


class CrossEntropyLoss:
    """Module-style wrapper (≙ reference CrossEntropyLoss,
    losses/cross_entropy.py:106). reduction in {'mean','sum','none'};
    mean divides by the number of non-ignored tokens."""

    def __init__(self, ignore_index: int = -100, reduction: str = "mean",
                 label_smoothing: float = 0.0, lse_square_scale: float = 0.0,
                 axis_name: Optional[str] = None):
        self.ignore_index = ignore_index
        self.reduction = reduction
        self.label_smoothing = label_smoothing
        self.lse_square_scale = lse_square_scale
        self.axis_name = axis_name

    def __call__(self, logits, labels, vocab_start: int = 0):
        losses = cross_entropy_loss(
            logits, labels, self.label_smoothing, self.ignore_index,
            self.lse_square_scale, self.axis_name, vocab_start,
        )
        if self.reduction == "none":
            return losses
        if self.reduction == "sum":
            return jnp.sum(losses)
        count = jnp.sum(labels != self.ignore_index)
        total = jnp.sum(losses)
        if self.axis_name is not None:
            # per-rank token shards: caller decides; here logits rows are
            # replicated across the tensor axis so no extra reduction.
            pass
        return total / jnp.maximum(count, 1)
