"""A/B: e4m3 -> bf16 dequant strategies inside a Pallas kernel on v5e.

v5e has no fp8 hardware; Mosaic's astype(bf16) emulation measured ~10x
slower than the int8 native convert on the decode path (fp8-KV roofline
0.09 vs int8 0.88). Candidates:

  bits:    integer bit reconstruction via f32 —
             u8 (s eeee mmm) -> u32 -> ((u&0x80)<<24 | (u&0x7f)<<20)
             bitcast f32 -> * 2^120 (exponent rebias)
           EXACT FOR NORMALS ONLY on TPU: e=0 inputs land in the f32
           SUBNORMAL range, which the VPU flushes to zero (measured: max
           error 0.01367 = the largest e4m3 subnormal). Max abs error vs
           exact = 7/8 * 2^-6 ~ 1.4e-2, i.e. 3e-5 of the 448 quant range.
  bits_x:  same + a select patching e==0 through an integer->f32 convert
           of the mantissa (exact on all finite codes).
  astype:  Mosaic's emulated convert (the current kernel path).
  int8:    native int8->bf16 convert — the floor we want to reach.

Run on the chip: PYTHONPATH=. python benchmarks/ab_fp8_convert.py
"""

import functools
import statistics
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 2048, 512  # per-block tile; grid multiplies work


def fp8_bits_to_f32(u8, exact_subnormals=False):
    """e4m3fn bits (uint8 array) -> f32 values.

    Integer-only + one fmul; with exact_subnormals, adds a compare+select
    that routes e==0 codes through an int->f32 convert (otherwise they are
    flushed to zero by the TPU's FTZ on the f32-subnormal intermediate)."""
    u = u8.astype(jnp.uint32)
    bits = ((u & 0x80) << 24) | ((u & 0x7F) << 20)
    val = jax.lax.bitcast_convert_type(bits, jnp.float32) * jnp.float32(
        2.0 ** 120)
    if exact_subnormals:
        m = (u & 0x07).astype(jnp.int32)
        m = jnp.where((u & 0x80) != 0, -m, m)
        sub = m.astype(jnp.float32) * jnp.float32(2.0 ** -9)
        val = jnp.where((u & 0x78) == 0, sub, val)
    return val


def _kernel(x_ref, c_ref, o_ref, *, mode):
    x = x_ref[...]
    if mode in ("astype", "int8"):
        y = x.astype(jnp.bfloat16)
    elif mode == "bits":
        u8 = jax.lax.bitcast_convert_type(x, jnp.uint8)
        y = fp8_bits_to_f32(u8).astype(jnp.bfloat16)
    elif mode == "bits_x":
        u8 = jax.lax.bitcast_convert_type(x, jnp.uint8)
        y = fp8_bits_to_f32(u8, exact_subnormals=True).astype(jnp.bfloat16)
    elif mode == "asr":
        # 3 int ops: (i32 << 24) >> 4 puts s at 31, eeee at 26..23, mmm at
        # 22..20; the AND clears the sign-extension garbage in bits 30..27
        i = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
        t = jax.lax.shift_right_arithmetic(i << 24, 4) & jnp.int32(
            -2013265921)  # 0x87FFFFFF
        y = (jax.lax.bitcast_convert_type(t, jnp.float32)
             * jnp.float32(2.0 ** 120)).astype(jnp.bfloat16)
    elif mode == "swar16":
        # cache stored as u16 (2 fp8/elem): widen u16->u32, assemble BOTH
        # bf16s inside the u32 word (pure bit moves, no rounding), bitcast
        # to (R, C/2, 2) bf16 and reshape to (R, C) — the u32 lane IS a
        # packed bf16 pair in Mosaic's native layout
        w = x.astype(jnp.uint32)
        out = (((w & 0x8000) << 16) | ((w & 0x7F00) << 12)
               | ((w & 0x80) << 8) | ((w & 0x7F) << 4))
        y2 = jax.lax.bitcast_convert_type(out, jnp.bfloat16) \
            * jnp.bfloat16(2.0 ** 120)
        y = y2.reshape(x.shape[0], x.shape[1] * 2)
    elif mode == "swar":
        # two fp8 -> two bf16 assembled inside ONE u32 word: pure bit
        # moves, no widening convert, no rounding; one packed bf16 fmul
        R_, C_ = x.shape
        u8 = jax.lax.bitcast_convert_type(x, jnp.uint8)
        w = jax.lax.bitcast_convert_type(
            u8.reshape(R_, C_ // 2, 2), jnp.uint16).astype(jnp.uint32)
        out = (((w & 0x8000) << 16) | ((w & 0x7F00) << 12)
               | ((w & 0x80) << 8) | ((w & 0x7F) << 4))
        y2 = jax.lax.bitcast_convert_type(out, jnp.bfloat16)
        y = (y2 * jnp.bfloat16(2.0 ** 120)).reshape(R_, C_)
    # reduce so the convert cannot be elided; output stays tiny. The
    # carry input makes each chained call's operands differ — without it
    # XLA hoists the (loop-invariant) pallas call out of the scan and the
    # chain times nothing.
    r = jnp.sum(y.astype(jnp.float32), axis=0, keepdims=True)
    if r.shape[1] != o_ref.shape[1]:  # swar16: y is (R, 2C); fold halves
        r = r[:, :o_ref.shape[1]] + r[:, o_ref.shape[1]:]
    o_ref[...] = r + c_ref[...]


def run(mode, dtype, grid=64, iters=600):
    x = jax.random.normal(jax.random.PRNGKey(0), (grid * R, C), jnp.float32)
    if dtype == jnp.int8:
        x = jnp.clip(x * 30, -127, 127).astype(jnp.int8)
    elif dtype == jnp.uint16:
        # packed pairs of e4m3 bytes: (R, C) u16 lanes hold 2C fp8 values
        # (twice the bytes/values of the u8 modes; Gelem/s normalizes)
        x2 = jax.random.normal(
            jax.random.PRNGKey(1), (grid * R, 2 * C), jnp.float32)
        b8 = jax.lax.bitcast_convert_type(
            x2.astype(jnp.float8_e4m3fn), jnp.uint8)
        b8 = b8.reshape(grid * R, C, 2).astype(jnp.uint32)
        x = ((b8[..., 1] << 8) | b8[..., 0]).astype(jnp.uint16)
    else:
        x = x.astype(dtype)

    f = pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=(grid,),
        in_specs=[pl.BlockSpec((R, C), lambda i: (i, 0)),
                  pl.BlockSpec((1, C), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, C), jnp.float32),
    )

    def chain(x, c, n):
        out, _ = jax.lax.scan(lambda c, _: (f(x, c), None), c, None,
                              length=n)
        return out[0, 0]

    c0 = jnp.zeros((1, C), jnp.float32)
    g1 = jax.jit(functools.partial(chain, n=iters // 4))
    g2 = jax.jit(functools.partial(chain, n=iters))
    float(g1(x, c0)); float(g2(x, c0))
    t1s, t2s = [], []
    for _ in range(5):
        t0 = time.perf_counter(); float(g1(x, c0)); t1 = time.perf_counter()
        float(g2(x, c0)); t2 = time.perf_counter()
        t1s.append(t1 - t0); t2s.append(t2 - t1)
    dt = (statistics.median(t2s) - statistics.median(t1s)) / (iters - iters // 4)
    elems = grid * R * C * (2 if dtype == jnp.uint16 else 1)
    bw = elems / dt / 1e9
    print(f"{mode:8s} {str(dtype.__name__ if hasattr(dtype, '__name__') else dtype):10s}"
          f" {dt*1e6:9.1f} us/iter  {bw:8.2f} Gelem/s  "
          f"({elems/1e6:.1f} M elems)")
    return bw


def check_bits_correct():
    import numpy as np
    u = jnp.arange(256, dtype=jnp.uint8)
    ref = jax.lax.bitcast_convert_type(u, jnp.float8_e4m3fn).astype(jnp.float32)
    r = np.asarray(ref)
    finite = np.isfinite(r)  # skip the two NaN encodings (s.1111.111)

    vx = np.asarray(fp8_bits_to_f32(u, exact_subnormals=True))
    assert np.array_equal(vx[finite], r[finite]), \
        np.max(np.abs(vx[finite] - r[finite]))
    print("bits_x exact on all", int(finite.sum()), "finite e4m3 codes")

    v = np.asarray(fp8_bits_to_f32(u))
    err = np.max(np.abs(v[finite] - r[finite]))
    # plain bits flushes ONLY the 14 nonzero subnormal codes (TPU FTZ);
    # everything else must be exact
    sub = (np.arange(256) & 0x78) == 0
    assert np.array_equal(v[finite & ~sub], r[finite & ~sub])
    print(f"bits flushes subnormals only: max err {err:.6f} "
          f"(= {err/448:.2e} of the 448 e4m3 range)")


if __name__ == "__main__":
    check_bits_correct()
    run("int8", jnp.int8)
    run("swar16", jnp.uint16)
    run("asr", jnp.float8_e4m3fn)
    run("swar16", jnp.uint16)
    run("asr", jnp.float8_e4m3fn)
