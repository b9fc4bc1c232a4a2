"""A/B: the dW (weight-gradient) matmul orientation on TPU.

dW = x^T @ g contracts the TOKEN axis — the LEADING axis of both saved
activations x (t, in) and upstream grads g (t, out). The gpt2m step trace
shows every such matmul (qkv dW 102 TF/s, lm_head dW 85-100 TF/s) running
at ~half the 185-192 TF/s the N-N forward matmuls hit, and dW is ~1/3 of
all matmul FLOPs. Candidates:
  A  direct dot_general contracting dim 0 of both (what autodiff emits)
  B  materialize x^T (optimization_barrier), then N-N dot
  C  materialize g^T instead, compute dW^T = g^T-major
Run: PYTHONPATH=.:/root/.axon_site python benchmarks/ab_dw_matmul.py
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from xhy_flash_attention_tpu.utils.benchmark import benchmark_chained

SHAPES = [
    ("qkv dW", 4096, 1024, 3072),
    ("fc1 dW", 4096, 1024, 4096),
    ("fc2 dW", 4096, 4096, 1024),
    ("lm_head dW", 4096, 1024, 50304),
]


def tf(name, fn, x, g, flops):
    t = benchmark_chained(fn, (x, g), n=12)
    print(f"  {name:28s} {t * 1e6:9.1f} us  {flops / t / 1e12:6.1f} TFLOP/s",
          flush=True)


def main():
    print(jax.devices(), flush=True)
    for label, t_, i_, o_ in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (t_, i_), jnp.bfloat16)
        g = jax.random.normal(jax.random.PRNGKey(1), (t_, o_), jnp.bfloat16)
        flops = 2 * t_ * i_ * o_
        print(f"{label}: x ({t_},{i_}) g ({t_},{o_})", flush=True)

        def a_direct(c):
            x, g = c
            dw = jax.lax.dot_general(
                x, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # depend on ALL of dw or XLA dead-codes the matmul down to
            # the one demanded column (CLAUDE.md environment rules)
            z = jax.lax.optimization_barrier(jnp.sum(dw))
            return (x + (z * 0).astype(x.dtype), g)

        def b_xt(c):
            x, g = c
            xt = jax.lax.optimization_barrier(x.T)
            dw = jax.lax.dot_general(
                xt, g, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            z = jax.lax.optimization_barrier(jnp.sum(dw))
            return (x + (z * 0).astype(x.dtype), g)

        def c_gt(c):
            x, g = c
            gt = jax.lax.optimization_barrier(g.T)
            dwt = jax.lax.dot_general(
                gt, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            z = jax.lax.optimization_barrier(jnp.sum(dwt))
            return (x + (z * 0).astype(x.dtype), g)

        def d_fp32out_bf16(c):
            x, g = c
            dw = jax.lax.dot_general(
                x, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16)
            z = jax.lax.optimization_barrier(jnp.sum(dw))
            return (x + (z * 0).astype(x.dtype), g)

        tf("A direct T-N fp32 out", a_direct, x, g, flops)
        tf("B barrier(x^T) then N-N", b_xt, x, g, flops)
        tf("C barrier(g^T), dW^T", c_gt, x, g, flops)
        tf("D direct T-N bf16 out", d_fp32out_bf16, x, g, flops)


if __name__ == "__main__":
    main()
