"""Does Mosaic overlap MXU matmuls with VPU elementwise within one body?

The gpt2 training attention shape (s=1024, d=64) runs with a single
1024x1024 tile per (b, h): the kernel body is QK -> softmax -> PV with no
grid-level pipelining, and the measured time matches the SERIAL sum of
MXU + VPU. This toy isolates the scheduler question: the same
matmul->exp->matmul chain, (a) monolithic vs (b) split into kv sub-chunks
so chunk i+1's QK (MXU) is independent of chunk i's exp (VPU). If Mosaic
interleaves the independent chains, (b) should run ~25-30% faster, and
the real fwd kernel earns an in-body sub-block pipeline at small shapes.

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/ab_mxu_vpu_overlap.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, ".")

from xhy_flash_attention_tpu.utils.benchmark import benchmark_chained

S, D = 1024, 64
BH = 64  # b*h grid steps, matches gpt2m b4 h16


def _serial_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp(s - 8.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0] = (pv / l[:, :1]).astype(o_ref.dtype)


def _chunked_kernel(q_ref, k_ref, v_ref, o_ref, *, nc):
    q = q_ref[0]
    cs = S // nc
    # issue ALL QK matmuls first (independent MXU chain), then exps (VPU),
    # then PVs — explicit interleaving freedom for the scheduler
    ss = [
        jax.lax.dot_general(
            q, k_ref[0, i * cs:(i + 1) * cs],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        for i in range(nc)
    ]
    ps = [jnp.exp(s - 8.0) for s in ss]
    l = functools.reduce(
        lambda a, b: a + b,
        [jnp.sum(p, axis=-1, keepdims=True) for p in ps])
    pvs = [
        jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, i * cs:(i + 1) * cs, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        for i, p in enumerate(ps)
    ]
    pv = functools.reduce(lambda a, b: a + b, pvs)
    o_ref[0] = (pv / l[:, :1]).astype(o_ref.dtype)


def run(kernel, name):
    q = jax.random.normal(jax.random.PRNGKey(0), (BH, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (BH, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (BH, S, D), jnp.bfloat16)

    f = pl.pallas_call(
        kernel,
        grid=(BH,),
        in_specs=[pl.BlockSpec((1, S, D), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, S, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, S, D), jnp.bfloat16),
    )
    # ~175 us/iter: n=600 puts >=100 ms on the chip per chain (CLAUDE.md)
    t = benchmark_chained(lambda c: (f(*c), c[1], c[2]), (q, k, v), n=600)
    flops = 4 * S * S * D * BH  # non-causal accounting (full rectangle)
    print(f"{name:24s} {t * 1e6:8.1f} us   {flops / t / 1e12:6.1f} TFLOP/s",
          flush=True)
    return t


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    t1 = run(_serial_kernel, "monolithic")
    for nc in (2, 4, 8):
        run(functools.partial(_chunked_kernel, nc=nc), f"chunked nc={nc}")
    t1b = run(_serial_kernel, "monolithic (repeat)")
