"""Real-TPU compile/run smoke for every FEATURE kernel path, fwd+bwd.

The interpret-mode suite covers these numerically, but compiled Mosaic is
where scalar-prefetch index maps, DMA tables and lane layouts can fail —
so this script runs each feature configuration on the real chip and
checks numerics against the fp32 reference. Output is appended to
CHECKS.md (with date + device kind) as the committed on-chip evidence
trail.

The axon tunnel intermittently hangs at device init: run under `timeout`
and retry (the wrapper below retries device init itself up to 3 times
when invoked with --retry-init).

Usage: PYTHONPATH=. timeout 1200 python benchmarks/check_features_tpu.py
"""

import datetime
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

LINES = []


def log(msg):
    print(msg, flush=True)
    LINES.append(msg)


def _contract(out, ref, lp, grads, grads_ref, grads_lp, what):
    """Kernel error <= 2x the low-precision-reorder baseline error."""
    ok = True
    e = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    el = float(jnp.max(jnp.abs(lp.astype(jnp.float32) - ref)))
    ok &= e <= 2 * el + 1e-4
    detail = [f"out {e:.4f}/{el:.4f}"]
    for g, gr, gl, n in zip(grads, grads_ref, grads_lp, "qkv"):
        eg = float(jnp.max(jnp.abs(g.astype(jnp.float32)
                                   - gr.astype(jnp.float32))))
        egl = float(jnp.max(jnp.abs(gl.astype(jnp.float32)
                                    - gr.astype(jnp.float32))))
        ok &= eg <= 2 * egl + 1e-3
        detail.append(f"d{n} {eg:.4f}/{egl:.4f}")
    log(f"  {what}: {'ok' if ok else 'FAIL'} ({', '.join(detail)})")
    return ok


def _run_case(name, fn, ref_fn, q, k, v, do):
    out, vjp = jax.vjp(fn, q, k, v)
    grads = vjp(do)
    ref, vjp_r = jax.vjp(lambda *a: ref_fn(*a, upcast=True), q, k, v)
    grads_ref = vjp_r(do)
    lp, vjp_l = jax.vjp(lambda *a: ref_fn(*a, upcast=False), q, k, v)
    grads_lp = vjp_l(do)
    return _contract(out, ref.astype(jnp.float32), lp, grads, grads_ref,
                     grads_lp, name)


def main():
    from xhy_flash_attention_tpu import flash_attn_func, flash_attn_varlen_func
    from xhy_flash_attention_tpu.ops.flash_attention import (
        blockmask_to_dense,
        blocksparse_attention,
        flashmask_attention,
        flashmask_to_dense,
    )
    from xhy_flash_attention_tpu.ops.flash_attention.interface import (
        flash_attention,
    )
    from xhy_flash_attention_tpu.ops.flash_attention.common import (
        dropout_keep_mask,
    )
    from xhy_flash_attention_tpu.ops.flash_attention.reference import (
        attention_ref,
    )

    dev = jax.devices()[0]
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%MZ")
    log(f"## Feature-kernel chip smoke — {stamp}, device {dev.device_kind}")
    ok = True
    rng = np.random.default_rng(0)
    b, s, h, d = 2, 2048, 4, 128

    def rand(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape), dtype)

    q, k, v, do = (rand((b, s, h, d)) for _ in range(4))

    # 1. flashmask (causal LT document mask), hm in {1, h}
    for hm in (1, h):
        doc = np.sort(rng.integers(1, s, (b, hm, 3)), axis=-1)
        down = np.full((b, hm, s, 1), s, np.int32)
        for bi in range(b):
            for hj in range(hm):
                bounds = [0, *doc[bi, hj], s]
                for lo, hi in zip(bounds[:-1], bounds[1:]):
                    down[bi, hj, lo:hi, 0] = hi
        fm = jnp.asarray(down)

        def fn(q_, k_, v_):
            o = flashmask_attention(
                jnp.swapaxes(q_, 1, 2), jnp.swapaxes(k_, 1, 2),
                jnp.swapaxes(v_, 1, 2), fm, causal=True)
            return jnp.swapaxes(o, 1, 2)

        dense = flashmask_to_dense(fm, s, causal=True)
        bias = jnp.where(dense, 0.0, -jnp.inf).astype(jnp.float32)

        def ref_fn(q_, k_, v_, upcast):
            return attention_ref(q_, k_, v_, attn_bias=bias, causal=True,
                                 upcast=upcast, reorder_ops=not upcast)[0]

        ok &= _run_case(f"flashmask hm={hm} fwd+bwd", fn, ref_fn, q, k, v, do)

    # 2. blocksparse, bm_heads in {1, h}
    gsz = 512
    nb = s // gsz
    for bmh in (1, h):
        bm = jnp.maximum(
            jnp.asarray(rng.integers(0, 2, (1, bmh, nb, nb)), jnp.int32),
            jnp.eye(nb, dtype=jnp.int32)[None, None])

        def fn(q_, k_, v_):
            o = blocksparse_attention(
                jnp.swapaxes(q_, 1, 2), jnp.swapaxes(k_, 1, 2),
                jnp.swapaxes(v_, 1, 2), bm, block_size=gsz, causal=True)
            return jnp.swapaxes(o, 1, 2)

        dense = blockmask_to_dense(bm, s, s, gsz)
        bias = jnp.where(dense, 0.0, -jnp.inf).astype(jnp.float32)

        def ref_fn(q_, k_, v_, upcast):
            return attention_ref(q_, k_, v_, attn_bias=bias, causal=True,
                                 upcast=upcast, reorder_ops=not upcast)[0]

        ok &= _run_case(f"blocksparse bm_heads={bmh} fwd+bwd", fn, ref_fn,
                        q, k, v, do)

    # 3. varlen decoupled packing (cu_seqlens_q != cu_seqlens_k), causal
    cu_q = jnp.asarray([0, 700, 1500, 2048], jnp.int32)
    cu_k = jnp.asarray([0, 900, 1800, 2048], jnp.int32)
    qp, kp, vp, dop = (x[0] for x in (q, k, v, do))

    def fn_v(q_, k_, v_):
        return flash_attn_varlen_func(q_, k_, v_, cu_q, cu_k, 0, 0,
                                      causal=True)

    # reference: per-sequence bottom-right-aligned causal attention
    def ref_v(q_, k_, v_, upcast):
        outs = []
        for i in range(3):
            qs = q_[cu_q[i]:cu_q[i + 1]][None]
            ks = k_[cu_k[i]:cu_k[i + 1]][None]
            vs = v_[cu_k[i]:cu_k[i + 1]][None]
            o = attention_ref(qs, ks, vs, causal=True, upcast=upcast,
                              reorder_ops=not upcast)[0]
            outs.append(o[0])
        return jnp.concatenate(outs, axis=0)

    out, vjp = jax.vjp(fn_v, qp, kp, vp)
    grads = vjp(dop)
    ref, vjp_r = jax.vjp(lambda *a: ref_v(*a, upcast=True), qp, kp, vp)
    grads_ref = vjp_r(dop)
    lp, vjp_l = jax.vjp(lambda *a: ref_v(*a, upcast=False), qp, kp, vp)
    grads_lp = vjp_l(dop)
    ok &= _contract(out, ref.astype(jnp.float32), lp, grads, grads_ref,
                    grads_lp, "varlen decoupled q/k packing fwd+bwd")

    # 4. dropout (recompute parity via the kernel's own keep mask)
    p_drop, seed = 0.2, 17
    sd = 512  # keep the dense keep-mask reference small

    qd, kd, vd, dod = (x[:, :sd] for x in (q, k, v, do))
    rows = jnp.arange(sd, dtype=jnp.int32)[:, None]
    cols = jnp.arange(sd, dtype=jnp.int32)[None, :]
    keep = jnp.stack([
        jnp.stack([
            dropout_keep_mask(jnp.int32(seed), jnp.int32(bi * h + hi),
                              rows, cols, p_drop)
            for hi in range(h)
        ]) for bi in range(b)
    ])

    def fn_d(q_, k_, v_):
        return flash_attn_func(q_, k_, v_, dropout_p=p_drop, causal=True,
                               dropout_seed=seed)

    def ref_d(q_, k_, v_, upcast):
        return attention_ref(q_, k_, v_, dropout_p=p_drop,
                             dropout_mask=keep, causal=True, upcast=upcast,
                             reorder_ops=not upcast)[0]

    ok &= _run_case("dropout p=0.2 fwd+bwd", fn_d, ref_d, qd, kd, vd, dod)

    # 5. segments (packed documents, shared packing)
    seg = jnp.asarray(
        np.repeat(np.arange(4), s // 4)[None].repeat(b, 0), jnp.int32)

    def fn_s(q_, k_, v_):
        o = flash_attention(
            jnp.swapaxes(q_, 1, 2), jnp.swapaxes(k_, 1, 2),
            jnp.swapaxes(v_, 1, 2), None, seg, seg, causal=True)
        return jnp.swapaxes(o, 1, 2)

    segmask = (seg[:, :, None] == seg[:, None, :])[:, None]
    bias_s = jnp.where(segmask, 0.0, -jnp.inf).astype(jnp.float32)

    def ref_s(q_, k_, v_, upcast):
        return attention_ref(q_, k_, v_, attn_bias=bias_s, causal=True,
                             upcast=upcast, reorder_ops=not upcast)[0]

    ok &= _run_case("segments (packed docs) fwd+bwd", fn_s, ref_s,
                    q, k, v, do)

    # 6. bias + dbias (batch-broadcast, streamed backward)
    sb = 512
    qb, kb, vb, dob = (x[:, :sb] for x in (q, k, v, do))
    bias_t = rand((1, h, sb, sb), jnp.float32) * 0.1

    def fn_b(q_, k_, v_):
        qt = jnp.swapaxes(q_, 1, 2)
        o = flash_attention(qt, jnp.swapaxes(k_, 1, 2),
                            jnp.swapaxes(v_, 1, 2), bias_t, causal=True)
        return jnp.swapaxes(o, 1, 2)

    def ref_b(q_, k_, v_, upcast):
        return attention_ref(q_, k_, v_, attn_bias=bias_t, causal=True,
                             upcast=upcast, reorder_ops=not upcast)[0]

    ok &= _run_case("bias (1,h,s,s) + streamed dbias fwd+bwd", fn_b, ref_b,
                    qb, kb, vb, dob)

    # 9. packed-page chunked decode with mixed/empty lengths — the per-page
    # DMA validity guards are compiled-only (interpret falls back to
    # clamped copies), so this is the one path the CPU suite cannot cover
    try:
        from xhy_flash_attention_tpu.inference.paged import (
            PagedKVCache, paged_flash_decode,
        )
        from xhy_flash_attention_tpu.ops.flash_attention.decode_kernel \
            import flash_decode

        pb, ph, phk, pd, ps, npp = 4, 4, 2, 128, 128, 8
        S = ps * npp
        lengths = [1000, 0, 77, 1]
        kf = rng.standard_normal((pb, phk, S, pd)).astype(np.float32)
        vf = rng.standard_normal((pb, phk, S, pd)).astype(np.float32)
        kpg = np.zeros((pb * npp + 1, phk, ps, pd), np.float32)
        vpg = np.zeros_like(kpg)
        table = np.zeros((pb, npp), np.int32)
        pg = 1
        for i in range(pb):
            for blk in range(npp):
                table[i, blk] = pg
                kpg[pg] = kf[i, :, blk * ps:(blk + 1) * ps]
                vpg[pg] = vf[i, :, blk * ps:(blk + 1) * ps]
                pg += 1
        cache = PagedKVCache.from_kv(
            jnp.asarray(kpg, jnp.bfloat16), jnp.asarray(vpg, jnp.bfloat16),
            jnp.asarray(table), jnp.asarray(lengths, jnp.int32))
        pq = jnp.asarray(rng.standard_normal((pb, 1, ph, pd)), jnp.bfloat16)
        outp = jax.jit(lambda q_, c: paged_flash_decode(
            q_, c, softmax_scale=pd ** -0.5))(pq, cache)
        refp = flash_decode(pq, jnp.asarray(kf, jnp.bfloat16),
                            jnp.asarray(vf, jnp.bfloat16),
                            jnp.asarray(lengths, jnp.int32),
                            softmax_scale=pd ** -0.5)
        live = np.asarray(lengths) > 0
        err = np.abs(np.asarray(outp, np.float32)[live]
                     - np.asarray(refp, np.float32).reshape(
                         outp.shape)[live]).max()
        pok = err < 0.05
        ok &= pok
        log(f"  paged chunked decode (guards, mixed/empty lengths): "
            f"{'ok' if pok else 'FAIL'} (err {err:.4f} vs contiguous)")
    except Exception as e:  # noqa: BLE001
        ok = False
        log(f"  paged chunked decode: FAIL ({type(e).__name__}: {e})")

    log(f"  RESULT: {'ALL OK' if ok else 'FAILURES PRESENT'}")
    return ok


if __name__ == "__main__":
    success = main()
    if jax.devices()[0].platform != "cpu":
        # only real-chip runs join the committed evidence trail
        with open("CHECKS.md", "a") as f:
            f.write("\n".join(LINES) + "\n\n")
    sys.exit(0 if success else 1)
