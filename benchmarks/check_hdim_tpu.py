"""Real-TPU compile/run check across head-dim classes.

The interpret-mode suite sweeps d in 32..256 (tests/test_flash_attn.py
hdim sweep), but Mosaic lane alignment is exactly where odd dims can fail
to COMPILE on hardware — so this script jit-compiles and runs fwd+bwd for
one representative shape per head-dim class on the real chip and checks
numerics against the fp32 reference (loose bf16 tolerance).

Usage: PYTHONPATH=. python benchmarks/check_hdim_tpu.py [d ...]
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from xhy_flash_attention_tpu import flash_attn_func
from xhy_flash_attention_tpu.ops.flash_attention.reference import attention_ref


def check(d, s=256, b=1, h=2, causal=True):
    keys = jax.random.split(jax.random.PRNGKey(d), 4)
    q = jax.random.normal(keys[0], (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, s, h, d), jnp.bfloat16)
    do = jax.random.normal(keys[3], (b, s, h, d), jnp.bfloat16)

    def f(q, k, v):
        return flash_attn_func(q, k, v, causal=causal)

    out, vjp = jax.jit(lambda q, k, v, do: (
        lambda o, vj: (o, vj(do))
    )(*jax.vjp(f, q, k, v)))(q, k, v, do)
    dq, dk, dv = vjp
    ref, _ = attention_ref(q, k, v, causal=causal, upcast=True)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    finite = all(bool(jnp.all(jnp.isfinite(x))) for x in (out, dq, dk, dv))
    status = "ok" if (err < 0.1 and finite) else "FAIL"
    print(f"d={d:4d} s={s} causal={causal}: maxerr={err:.4f} "
          f"grads_finite={finite} -> {status}", flush=True)
    return status == "ok"


if __name__ == "__main__":
    dims = [int(a) for a in sys.argv[1:]] or [32, 40, 59, 96, 111, 160, 256]
    print(jax.devices(), flush=True)
    ok = all([check(d) for d in dims])
    sys.exit(0 if ok else 1)
