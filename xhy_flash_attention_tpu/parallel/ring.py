"""Ring attention — context parallelism over the sequence axis.

The reference scopes out cross-device long-context support entirely
(training/README.md:23-27; SURVEY.md D5): its long-context story is
single-GPU linear-memory attention. The TPU build supplies the cross-chip
scaling this leaves open (BASELINE north star: multi-host decode/prefill
scaling ≥80%): sequences shard over a mesh axis, KV blocks rotate around the
ICI ring via `jax.lax.ppermute`, and each step's partial attention merges
with the split-KV LSE rule (inference/combine.py — the same math as the
reference's FA3 combine kernel, flash_fwd_combine_kernel.h).

Causal masking across shards uses the kernels' *position* path
(q_positions/kv_positions with per-block min/max skip stats): shard offsets
are traced `axis_index` values, so the static-offset causal path cannot
express them — but block skipping still prunes the fully-masked steps, so a
causal ring does ~half the work, matching the single-device causal saving.

Backward is the standard ring: dK/dV accumulators travel around the ring
with their KV block and arrive home after N steps; dQ accumulates locally.

Causal load balance: with contiguous shards, ring step t is gated by the
ranks whose (q shard, rotated kv shard) pair is fully visible — the
fully-masked ranks skip their blocks (cheap) but still wait at the next
ppermute, so a causal ring runs at ~50% utilization. `zigzag=True` uses
the llama3-style layout instead: rank r owns sequence chunks r and
2n-1-r (one early, one late), so every rank carries the same visible
area at every step and the causal ring balances. The PERMUTATION IS THE
CALLER'S CONTRACT: tokens (and any position ids fed to rotary/position
embeddings) must be pre-permuted with `zigzag_shard` and outputs
restored with `zigzag_unshard`; the kernels themselves just see the
matching global positions.
All state is carried by lax-compatible Python loops over the (static) axis
size, so XLA can overlap each step's ppermute with the previous step's
kernel.

Use inside shard_map with the sequence dimension sharded over `axis_name`:

    mesh = Mesh(devices, ("sp",))
    out = shard_map(
        lambda q, k, v: ring_flash_attention(q, k, v, axis_name="sp",
                                             causal=True),
        mesh=mesh,
        in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None),
    )(q, k, v)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.flash_attention.bwd import flash_attention_bwd
from ..ops.flash_attention.fwd import flash_attention_fwd

__all__ = ["ring_flash_attention", "sharded_kv_decode", "zigzag_shard",
           "zigzag_unshard"]


def _zigzag_perm(n: int):
    """Chunk order (c0, c_{2n-1}, c1, c_{2n-2}, ...): rank r of an even
    n-way split gets chunks (c_r, c_{2n-1-r})."""
    perm = []
    for r in range(n):
        perm += [r, 2 * n - 1 - r]
    return perm


def _permute_chunks(x, n, axis, perm):
    S = x.shape[axis]
    assert S % (2 * n) == 0, (S, n)
    xs = jnp.split(x, 2 * n, axis=axis)
    return jnp.concatenate([xs[c] for c in perm], axis=axis)


def zigzag_shard(x: jax.Array, n: int, axis: int = 1) -> jax.Array:
    """Reorder a GLOBAL sequence axis into the zigzag layout (see
    _zigzag_perm). Apply before sharding; apply the same permutation to
    position ids."""
    return _permute_chunks(x, n, axis, _zigzag_perm(n))


def zigzag_unshard(x: jax.Array, n: int, axis: int = 1) -> jax.Array:
    """Inverse of zigzag_shard on the same global axis."""
    perm = _zigzag_perm(n)
    inv = [0] * len(perm)
    for i, c in enumerate(perm):
        inv[c] = i
    return _permute_chunks(x, n, axis, inv)


def _rotate(x, axis_name, n):
    """Send to the next rank in the ring (rank r -> r+1 mod n)."""
    perm = [(i, (i + 1) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def _merge(o, lse, o_new, lse_new):
    """Running LSE merge of normalized partials (≙ combine kernel math)."""
    lse_max = jnp.maximum(lse, lse_new)
    # exp(-inf - -inf) guarded: where both are -inf the weights are 0
    w_old = jnp.exp(jnp.maximum(lse - lse_max, -1e30))
    w_new = jnp.exp(jnp.maximum(lse_new - lse_max, -1e30))
    w_old = jnp.where(jnp.isfinite(lse), w_old, 0.0)
    w_new = jnp.where(jnp.isfinite(lse_new), w_new, 0.0)
    tot = w_old + w_new
    safe = jnp.maximum(tot, 1e-37)
    o_merged = (o * (w_old / safe)[..., None] + o_new * (w_new / safe)[..., None])
    lse_merged = jnp.where(
        tot > 0.0, lse_max + jnp.log(safe), jnp.inf
    )
    return o_merged, lse_merged


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def ring_flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    softcap: float = 0.0,
    zigzag: bool = False,
) -> jax.Array:
    """Flash attention over a sequence sharded on `axis_name`.

    q, k, v: local shards (b, h, s_local, d) inside shard_map. Returns the
    local output shard (b, h, s_local, d). Differentiable in q, k, v.
    zigzag: shards follow the balanced layout (see module docstring);
    tokens must be pre-permuted with zigzag_shard.
    """
    out, _ = _ring_fwd_impl(q, k, v, axis_name, causal, softmax_scale,
                            softcap, zigzag)
    return out


def _positions(s_local, axis_name, batch, zigzag=False):
    me = jax.lax.axis_index(axis_name)
    if zigzag:
        # rank r owns chunks r and 2n-1-r of the 2n-chunk global split
        n = jax.lax.psum(1, axis_name)
        half = s_local // 2
        a = jnp.arange(half, dtype=jnp.int32)
        pos = jnp.concatenate([me * half + a,
                               (2 * n - 1 - me) * half + a])
    else:
        pos = me * s_local + jnp.arange(s_local, dtype=jnp.int32)
    return jnp.broadcast_to(pos, (batch, s_local))


def _ring_fwd_impl(q, k, v, axis_name, causal, softmax_scale, softcap,
                   zigzag=False):
    n = jax.lax.psum(1, axis_name)
    b, h, s_local, d = q.shape
    if zigzag and s_local % 2 != 0:
        raise ValueError("zigzag needs an even local sequence length")
    scale = softmax_scale if softmax_scale is not None else d ** -0.5
    qpos = _positions(s_local, axis_name, b, zigzag) if causal else None
    kpos = qpos

    o = jnp.zeros((b, h, s_local, d), jnp.float32)
    lse = jnp.full((b, h, s_local), -jnp.inf, jnp.float32)
    k_r, v_r, kpos_r = k, v, kpos
    for step in range(n):
        o_i, lse_i = flash_attention_fwd(
            q, k_r, v_r,
            sm_scale=scale, softcap=softcap,
            # causal=True folds to a (-1, 0) position-window: the kernels
            # bound kpos <= qpos (global positions carried by the shards)
            causal=causal,
            q_positions=qpos, kv_positions=kpos_r,
            need_lse=True,
        )
        # lse_i is +inf on rows with no visible keys this step; map to -inf
        # (zero weight) for the merge
        lse_i = jnp.where(jnp.isposinf(lse_i), -jnp.inf, lse_i)
        o, lse = _merge(o, lse, o_i.astype(jnp.float32), lse_i)
        if step != n - 1:
            k_r = _rotate(k_r, axis_name, n)
            v_r = _rotate(v_r, axis_name, n)
            if causal:
                kpos_r = _rotate(kpos_r, axis_name, n)
    # empty rows (no keys anywhere): out = 0, lse = +inf — same contract as
    # the single-device kernel (flash_fwd_kernel.h:509-514)
    lse_out = jnp.where(jnp.isneginf(lse), jnp.inf, lse)
    return o.astype(q.dtype), lse_out


def _ring_fwd(q, k, v, axis_name, causal, softmax_scale, softcap,
              zigzag=False):
    out, lse = _ring_fwd_impl(q, k, v, axis_name, causal, softmax_scale,
                              softcap, zigzag)
    return out, (q, k, v, out, lse)


def _ring_bwd(axis_name, causal, softmax_scale, softcap, zigzag, res, do):
    q, k, v, out, lse = res
    n = jax.lax.psum(1, axis_name)
    b, h, s_local, d = q.shape
    scale = softmax_scale if softmax_scale is not None else d ** -0.5
    qpos = _positions(s_local, axis_name, b, zigzag) if causal else None

    dq = jnp.zeros_like(q, jnp.float32)
    # (k block, v block, its positions, its dk accum, its dv accum) travel
    # together around the ring and arrive home after n steps
    k_r, v_r = k, v
    kpos_r = qpos
    dk_r = jnp.zeros((b,) + k.shape[1:], jnp.float32)
    dv_r = jnp.zeros((b,) + v.shape[1:], jnp.float32)
    for step in range(n):
        dq_i, dk_i, dv_i, _ = flash_attention_bwd(
            q, k_r, v_r, out, lse, do,
            sm_scale=scale, softcap=softcap, causal=causal,
            q_positions=qpos, kv_positions=kpos_r,
        )
        dq = dq + dq_i.astype(jnp.float32)
        dk_r = dk_r + dk_i.astype(jnp.float32)
        dv_r = dv_r + dv_i.astype(jnp.float32)
        k_r = _rotate(k_r, axis_name, n)
        v_r = _rotate(v_r, axis_name, n)
        dk_r = _rotate(dk_r, axis_name, n)
        dv_r = _rotate(dv_r, axis_name, n)
        if causal:
            kpos_r = _rotate(kpos_r, axis_name, n)
    # after n rotations every block is home again
    return dq.astype(q.dtype), dk_r.astype(k.dtype), dv_r.astype(v.dtype)


ring_flash_attention.defvjp(_ring_fwd, _ring_bwd)


def sharded_kv_decode(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    lengths: jax.Array,
    axis_name: str,
    *,
    softmax_scale: Optional[float] = None,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
) -> jax.Array:
    """Decode with the KV cache sharded over `axis_name` (the BASELINE
    multi-host FP8-KV decode path): queries are replicated, each chip
    computes partials on its cache shard, and the LSE merge runs as one
    round of cheap collectives (pmax + 2×psum) over ICI — decode needs no
    ring since q is tiny.

    q: (b, sq, h, d) replicated; k/v_cache: (b, hk, S_local, d) local shard;
    lengths: (b,) int32 valid length *within this shard*.
    """
    from ..inference.combine import _splitkv_partials

    b, sq, h, d = q.shape
    hk = k_cache.shape[1]
    g = h // hk
    rows = sq * g
    scale = softmax_scale if softmax_scale is not None else d ** -0.5
    out_p, m_p, l_p = _splitkv_partials(
        q, k_cache, v_cache, lengths,
        softmax_scale=scale, window_size=window_size, softcap=softcap,
    )
    # merge across chips: global max, then weighted sums (2 psums + 1 pmax
    # of tiny tensors — bandwidth-negligible next to the cache reads)
    m_g = jax.lax.pmax(m_p, axis_name)
    w = jnp.exp(m_p - m_g) * l_p
    l_g = jax.lax.psum(w, axis_name)
    o_g = jax.lax.psum(out_p * w, axis_name)
    safe = jnp.maximum(l_g, 1e-37)
    out = (o_g / safe)[:, :, :rows]
    out = out.reshape(b, hk, sq, g, d).transpose(0, 2, 1, 3, 4)
    return out.reshape(b, sq, h, d).astype(q.dtype)
