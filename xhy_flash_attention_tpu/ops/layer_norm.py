"""Fused dropout + residual-add + LayerNorm/RMSNorm — Pallas TPU kernels.

≙ reference csrc/layer_norm (K15, `dropout_add_ln_fwd/bwd`,
ln_api.cpp:832-846) and the wrappers in flash_attn/ops/layer_norm.py /
rms_norm.py. Semantics preserved:

    x1 = x0 * rowscale * colscale          (stochastic depth / LayerScale)
    xd = dropout(x1, p) / (1 - p)
    residual_out = xd + residual           (fp32 if residual_in_fp32)
    out = norm(residual_out) * gamma + beta

prenorm returns (out, residual_out). The CUDA side compiles one kernel per
hidden size 256..8192 (ln_fwd_256.cu...); here a single Pallas kernel takes
the hidden dim as the block's minor axis and a row-block heuristic picks the
tile height — JIT specialization replaces the kernel zoo.

The backward regenerates the dropout mask from the same per-row-block PRNG
seed (no mask tensor is stored), accumulates dgamma/dbeta/dcolscale as
per-block partials reduced by XLA, and is fully deterministic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention.common import dropout_keep_mask, interpret_mode, round_up

__all__ = [
    "dropout_add_layer_norm",
    "dropout_add_rms_norm",
    "layer_norm",
    "rms_norm",
]


def _rows_per_block(hidden: int) -> int:
    # keep each fp32 buffer around <= 1 MiB
    r = 1 << max(3, (1 << 20) // (hidden * 4)).bit_length() - 1
    return int(min(256, max(8, r)))


def _ln_fwd_kernel(refs, *, p):
    it = iter(refs)
    if p["dropout_p"] > 0.0:
        seed_ref = next(it)
    x0_ref = next(it)
    res_ref = next(it) if p["has_residual"] else None
    gamma_ref = next(it)
    beta_ref = next(it) if p["has_beta"] else None
    rowscale_ref = next(it) if p["has_rowscale"] else None
    colscale_ref = next(it) if p["has_colscale"] else None
    out_ref = next(it)
    resout_ref = next(it) if p["save_stats"] else None
    mu_ref = next(it) if (p["save_stats"] and not p["is_rms"]) else None
    rstd_ref = next(it) if p["save_stats"] else None

    i = pl.program_id(0)
    x = x0_ref[...].astype(jnp.float32)
    if p["has_rowscale"]:
        x = x * rowscale_ref[...].astype(jnp.float32)  # (br, 1)
    if p["has_colscale"]:
        x = x * colscale_ref[...].astype(jnp.float32)[None, :]
    if p["dropout_p"] > 0.0:
        rows_g = i * x.shape[0] + jax.lax.broadcasted_iota(
            jnp.int32, (x.shape[0], 1), 0
        )
        cols_g = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1]), 1)
        keep = dropout_keep_mask(
            seed_ref[0], jnp.int32(0), rows_g, cols_g, p["dropout_p"]
        )
        x = jnp.where(keep, x, 0.0) * (1.0 / (1.0 - p["dropout_p"]))
    if p["has_residual"]:
        x = x + res_ref[...].astype(jnp.float32)
    if p["save_stats"]:
        resout_ref[...] = x.astype(resout_ref.dtype)
    if p["is_rms"]:
        mu = None
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        xc = x
    else:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        xc = x - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + p["eps"])
    y = xc * rstd
    out = y * gamma_ref[...].astype(jnp.float32)[None, :]
    if p["has_beta"]:
        out = out + beta_ref[...].astype(jnp.float32)[None, :]
    out_ref[...] = out.astype(out_ref.dtype)
    if p["save_stats"]:
        if not p["is_rms"]:
            mu_ref[...] = jnp.broadcast_to(mu, (mu.shape[0], 8))
        rstd_ref[...] = jnp.broadcast_to(rstd, (rstd.shape[0], 8))


def _ln_bwd_kernel(refs, *, p):
    it = iter(refs)
    if p["dropout_p"] > 0.0:
        seed_ref = next(it)
    dout_ref = next(it)
    dres_in_ref = next(it) if p["prenorm"] else None
    resout_ref = next(it)
    mu_ref = None if p["is_rms"] else next(it)
    rstd_ref = next(it)
    gamma_ref = next(it)
    x0_ref = next(it) if p["has_colscale"] else None
    rowscale_ref = next(it) if p["has_rowscale"] else None
    colscale_ref = next(it) if p["has_colscale"] else None
    dx0_ref = next(it)
    dres_ref = next(it) if p["has_residual"] else None
    dgamma_ref = next(it)
    dbeta_ref = next(it) if p["has_beta"] else None
    dcolscale_ref = next(it) if p["has_colscale"] else None

    i = pl.program_id(0)
    h = p["hidden"]
    res = resout_ref[...].astype(jnp.float32)
    rstd = rstd_ref[...][:, :1]
    if p["is_rms"]:
        xhat = res * rstd
    else:
        xhat = (res - mu_ref[...][:, :1]) * rstd
    dout = dout_ref[...].astype(jnp.float32)
    gamma = gamma_ref[...].astype(jnp.float32)[None, :]
    dy = dout * gamma
    c1 = jnp.mean(dy * xhat, axis=-1, keepdims=True)
    if p["is_rms"]:
        dres = (dy - xhat * c1) * rstd
    else:
        c2 = jnp.mean(dy, axis=-1, keepdims=True)
        dres = (dy - xhat * c1 - c2) * rstd
    if p["prenorm"]:
        dres = dres + dres_in_ref[...].astype(jnp.float32)

    dgamma_ref[...] = jnp.sum(dout * xhat, axis=0, keepdims=True)[None]
    if p["has_beta"]:
        dbeta_ref[...] = jnp.sum(dout, axis=0, keepdims=True)[None]
    if p["has_residual"]:
        dres_ref[...] = dres.astype(dres_ref.dtype)

    dx1 = dres
    if p["dropout_p"] > 0.0:
        rows_g = i * dres.shape[0] + jax.lax.broadcasted_iota(
            jnp.int32, (dres.shape[0], 1), 0
        )
        cols_g = jax.lax.broadcasted_iota(jnp.int32, (1, h), 1)
        keep = dropout_keep_mask(
            seed_ref[0], jnp.int32(0), rows_g, cols_g, p["dropout_p"]
        )
        dx1 = jnp.where(keep, dx1, 0.0) * (1.0 / (1.0 - p["dropout_p"]))
    if p["has_colscale"]:
        x0 = x0_ref[...].astype(jnp.float32)
        if p["has_rowscale"]:
            x0 = x0 * rowscale_ref[...].astype(jnp.float32)
        dcolscale_ref[...] = jnp.sum(dx1 * x0, axis=0, keepdims=True)[None]
        dx0 = dx1 * colscale_ref[...].astype(jnp.float32)[None, :]
    else:
        dx0 = dx1
    if p["has_rowscale"]:
        dx0 = dx0 * rowscale_ref[...].astype(jnp.float32)
    dx0_ref[...] = dx0.astype(dx0_ref.dtype)


def _ln_fwd_entry(*refs, p):
    _ln_fwd_kernel(refs, p=p)


def _ln_bwd_entry(*refs, p):
    _ln_bwd_kernel(refs, p=p)


def _pad_rows(x, rows):
    if x.shape[0] == rows:
        return x
    return jnp.pad(x, [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1))


def _fwd_call(x0, residual, gamma, beta, rowscale, colscale, seed, *,
              dropout_p, eps, is_rms, residual_in_fp32, save_stats,
              interpret=None):
    n, h = x0.shape
    br = _rows_per_block(h)
    npad = round_up(n, br)
    grid = (npad // br,)
    p = dict(
        dropout_p=dropout_p, eps=eps, is_rms=is_rms,
        has_residual=residual is not None,
        has_beta=beta is not None,
        has_rowscale=rowscale is not None,
        has_colscale=colscale is not None,
        save_stats=save_stats, hidden=h,
    )
    inputs, in_specs = [], []
    nsp = 0
    if dropout_p > 0.0:
        inputs.append(jnp.asarray(seed, jnp.int32).reshape((1,)))
        nsp = 1
    inputs.append(_pad_rows(x0, npad))
    in_specs.append(pl.BlockSpec((br, h), lambda i, *_: (i, 0)))
    if residual is not None:
        inputs.append(_pad_rows(residual, npad))
        in_specs.append(pl.BlockSpec((br, h), lambda i, *_: (i, 0)))
    inputs.append(gamma)
    in_specs.append(pl.BlockSpec((h,), lambda i, *_: (0,)))
    if beta is not None:
        inputs.append(beta)
        in_specs.append(pl.BlockSpec((h,), lambda i, *_: (0,)))
    if rowscale is not None:
        inputs.append(_pad_rows(rowscale, npad)[:, None])
        in_specs.append(pl.BlockSpec((br, 1), lambda i, *_: (i, 0)))
    if colscale is not None:
        inputs.append(colscale)
        in_specs.append(pl.BlockSpec((h,), lambda i, *_: (0,)))

    res_dtype = jnp.float32 if residual_in_fp32 else x0.dtype
    out_shape = [jax.ShapeDtypeStruct((npad, h), x0.dtype)]
    out_specs = [pl.BlockSpec((br, h), lambda i, *_: (i, 0))]
    if save_stats:
        out_shape.append(jax.ShapeDtypeStruct((npad, h), res_dtype))
        out_specs.append(pl.BlockSpec((br, h), lambda i, *_: (i, 0)))
        if not is_rms:
            out_shape.append(jax.ShapeDtypeStruct((npad, 8), jnp.float32))
            out_specs.append(pl.BlockSpec((br, 8), lambda i, *_: (i, 0)))
        out_shape.append(jax.ShapeDtypeStruct((npad, 8), jnp.float32))
        out_specs.append(pl.BlockSpec((br, 8), lambda i, *_: (i, 0)))

    outs = pl.pallas_call(
        functools.partial(_ln_fwd_entry, p=p),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsp, grid=grid,
            in_specs=in_specs, out_specs=out_specs,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret_mode() if interpret is None else interpret,
    )(*inputs)
    outs = [o[:n] for o in outs]
    if not save_stats:
        return outs[0], None, None, None
    if is_rms:
        out, resout, rstd = outs
        return out, resout, None, rstd
    out, resout, mu, rstd = outs
    return out, resout, mu, rstd


def _bwd_call(dout, dres_in, resout, mu, rstd, gamma, x0, rowscale, colscale,
              seed, *, dropout_p, eps, is_rms, prenorm, has_residual,
              has_beta, x0_dtype, res_dtype, interpret=None):
    n, h = dout.shape
    br = _rows_per_block(h)
    npad = round_up(n, br)
    nblocks = npad // br
    p = dict(
        dropout_p=dropout_p, eps=eps, is_rms=is_rms, prenorm=prenorm,
        has_residual=has_residual, has_beta=has_beta,
        has_rowscale=rowscale is not None,
        has_colscale=colscale is not None,
        hidden=h,
    )
    inputs, in_specs = [], []
    nsp = 0
    if dropout_p > 0.0:
        inputs.append(jnp.asarray(seed, jnp.int32).reshape((1,)))
        nsp = 1

    def add(x, spec):
        inputs.append(x)
        in_specs.append(spec)

    row2d = pl.BlockSpec((br, h), lambda i, *_: (i, 0))
    vec_h = pl.BlockSpec((h,), lambda i, *_: (0,))
    vec_r8 = pl.BlockSpec((br, 8), lambda i, *_: (i, 0))
    add(_pad_rows(dout, npad), row2d)
    if prenorm:
        add(_pad_rows(dres_in, npad), row2d)
    add(_pad_rows(resout, npad), row2d)
    if not is_rms:
        add(_pad_rows(mu, npad), vec_r8)
    add(_pad_rows(rstd, npad), vec_r8)
    add(gamma, vec_h)
    if colscale is not None:
        add(_pad_rows(x0, npad), row2d)
    if rowscale is not None:
        add(_pad_rows(rowscale, npad)[:, None],
            pl.BlockSpec((br, 1), lambda i, *_: (i, 0)))
    if colscale is not None:
        add(colscale, vec_h)

    out_shape = [jax.ShapeDtypeStruct((npad, h), x0_dtype)]
    out_specs = [row2d]
    if has_residual:
        out_shape.append(jax.ShapeDtypeStruct((npad, h), res_dtype))
        out_specs.append(row2d)
    part = pl.BlockSpec((1, 1, h), lambda i, *_: (i, 0, 0))
    out_shape.append(jax.ShapeDtypeStruct((nblocks, 1, h), jnp.float32))
    out_specs.append(part)
    if has_beta:
        out_shape.append(jax.ShapeDtypeStruct((nblocks, 1, h), jnp.float32))
        out_specs.append(part)
    if colscale is not None:
        out_shape.append(jax.ShapeDtypeStruct((nblocks, 1, h), jnp.float32))
        out_specs.append(part)

    outs = pl.pallas_call(
        functools.partial(_ln_bwd_entry, p=p),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsp, grid=(nblocks,),
            in_specs=in_specs, out_specs=out_specs,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret_mode() if interpret is None else interpret,
    )(*inputs)
    it = iter(outs)
    dx0 = next(it)[:n]
    dres = next(it)[:n] if has_residual else None
    dgamma = jnp.sum(next(it), axis=(0, 1))
    dbeta = jnp.sum(next(it), axis=(0, 1)) if has_beta else None
    dcolscale = (
        jnp.sum(next(it), axis=(0, 1)) if colscale is not None else None
    )
    return dx0, dres, dgamma, dbeta, dcolscale


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _dropout_add_norm(x0, residual, gamma, beta, rowscale, colscale, seed,
                      dropout_p, eps, is_rms, prenorm, residual_in_fp32):
    out, resout, _, _ = _fwd_call(
        x0, residual, gamma, beta, rowscale, colscale, seed,
        dropout_p=dropout_p, eps=eps, is_rms=is_rms,
        residual_in_fp32=residual_in_fp32,
        save_stats=prenorm,
    )
    return (out, resout) if prenorm else out


def _dan_fwd(x0, residual, gamma, beta, rowscale, colscale, seed,
             dropout_p, eps, is_rms, prenorm, residual_in_fp32):
    out, resout, mu, rstd = _fwd_call(
        x0, residual, gamma, beta, rowscale, colscale, seed,
        dropout_p=dropout_p, eps=eps, is_rms=is_rms,
        residual_in_fp32=residual_in_fp32, save_stats=True,
    )
    res = (x0, residual, gamma, beta, rowscale, colscale, seed,
           resout, mu, rstd)
    return ((out, resout) if prenorm else out), res


def _dan_bwd(dropout_p, eps, is_rms, prenorm, residual_in_fp32, res, g):
    (x0, residual, gamma, beta, rowscale, colscale, seed,
     resout, mu, rstd) = res
    if prenorm:
        dout, dres_in = g
    else:
        dout, dres_in = g, None
    dx0, dres, dgamma, dbeta, dcolscale = _bwd_call(
        dout, dres_in, resout, mu, rstd, gamma, x0, rowscale, colscale, seed,
        dropout_p=dropout_p, eps=eps, is_rms=is_rms, prenorm=prenorm,
        has_residual=residual is not None, has_beta=beta is not None,
        x0_dtype=x0.dtype,
        res_dtype=residual.dtype if residual is not None else x0.dtype,
    )
    dgamma = dgamma.astype(gamma.dtype)
    if dbeta is not None:
        dbeta = dbeta.astype(beta.dtype)
    if dcolscale is not None:
        dcolscale = dcolscale.astype(colscale.dtype)
    return (dx0, dres, dgamma, dbeta, None, dcolscale, None)


_dropout_add_norm.defvjp(_dan_fwd, _dan_bwd)


def _flatten_call(x0, residual, gamma, beta, rowscale, colscale, seed,
                  dropout_p, eps, is_rms, prenorm, residual_in_fp32):
    shape = x0.shape
    h = shape[-1]
    x0f = x0.reshape(-1, h)
    resf = residual.reshape(-1, h) if residual is not None else None
    rsf = rowscale.reshape(-1) if rowscale is not None else None
    if dropout_p > 0.0 and seed is None:
        raise ValueError("dropout_p > 0 requires a seed")
    out = _dropout_add_norm(
        x0f, resf, gamma, beta, rsf, colscale, seed,
        float(dropout_p), float(eps), bool(is_rms), bool(prenorm),
        bool(residual_in_fp32),
    )
    if prenorm:
        o, r = out
        return o.reshape(shape), r.reshape(shape)
    return out.reshape(shape)


def dropout_add_layer_norm(x0, residual, weight, bias, dropout_p, epsilon,
                           rowscale=None, layerscale=None, prenorm=False,
                           residual_in_fp32=False, seed=None):
    """≙ reference dropout_add_layer_norm (ops/layer_norm.py)."""
    return _flatten_call(x0, residual, weight, bias, rowscale, layerscale,
                         seed, dropout_p, epsilon, False, prenorm,
                         residual_in_fp32)


def dropout_add_rms_norm(x0, residual, weight, bias, dropout_p, epsilon,
                         rowscale=None, layerscale=None, prenorm=False,
                         residual_in_fp32=False, seed=None):
    """≙ reference dropout_add_rms_norm (ops/rms_norm.py). bias may be None."""
    return _flatten_call(x0, residual, weight, bias, rowscale, layerscale,
                         seed, dropout_p, epsilon, True, prenorm,
                         residual_in_fp32)


def layer_norm(x, weight, bias, epsilon=1e-6):
    return dropout_add_layer_norm(x, None, weight, bias, 0.0, epsilon)


def rms_norm(x, weight, epsilon=1e-6):
    return dropout_add_rms_norm(x, None, weight, None, 0.0, epsilon)


def dropout_add_layer_norm_parallel_residual(
    x0, x1, residual, weight0, bias0, weight1, bias1, dropout_p, epsilon,
    prenorm=False, residual_in_fp32=False, seed=None, is_rms=False,
):
    """Dual-norm parallel residual (≙ reference
    dropout_add_ln_parallel_residual, csrc/layer_norm/ln_api.cpp:840-846,
    used by GPT-J/NeoX-style blocks): one dropout-add of x0 (+ x1) into the
    residual stream, then two independent norms of the same sum.

    The sum is computed once through the fused kernel for norm0; norm1 is a
    plain norm of the returned residual (XLA fuses it into the same pass —
    no second HBM round-trip of the sum).
    """
    x0s = x0 if x1 is None else x0 + x1.astype(x0.dtype)
    fused = dropout_add_rms_norm if is_rms else dropout_add_layer_norm
    out0, resout = fused(
        x0s, residual, weight0, bias0, dropout_p, epsilon,
        prenorm=True, residual_in_fp32=residual_in_fp32, seed=seed,
    )
    if weight1 is None:
        out1 = None
    else:
        plain = dropout_add_rms_norm if is_rms else dropout_add_layer_norm
        out1 = plain(resout.astype(x0.dtype), None, weight1, bias1, 0.0,
                     epsilon)
    if prenorm:
        return out0, out1, resout
    return out0, out1


def dropout_add_rms_norm_parallel_residual(
    x0, x1, residual, weight0, bias0, weight1, bias1, dropout_p, epsilon,
    prenorm=False, residual_in_fp32=False, seed=None,
):
    return dropout_add_layer_norm_parallel_residual(
        x0, x1, residual, weight0, bias0, weight1, bias1, dropout_p, epsilon,
        prenorm=prenorm, residual_in_fp32=residual_in_fp32, seed=seed,
        is_rms=True,
    )


def dropout_add_layer_norm_subset(
    x0, residual, weight, bias, dropout_p, epsilon,
    layerscale=None, x0_subset=None, out_subset=None,
    rowscale_const=1.0, out_numrows=0,
    prenorm=False, residual_in_fp32=False, seed=None,
):
    """Subset in/out variant (≙ reference dropout_add_ln subset paths used by
    BERT's masked-token MLM head): x0 rows are scattered into the residual at
    `x0_subset` indices before the norm; only `out_subset` rows of the
    normalized output are returned.

    On TPU the scatter/gather are XLA ops fused around the same kernel; the
    FLOP savings of the reference's subset kernel come from the gather
    before the (large) head matmul, which the caller keeps.
    """
    h = weight.shape[-1]
    if x0_subset is not None:
        # x0 holds only the subset rows; scatter them into a zero stream at
        # the given flattened row indices before the fused add+norm
        n = int(np.prod(residual.shape[:-1]))
        full = jnp.zeros((n, h), x0.dtype)
        full = full.at[x0_subset.reshape(-1)].set(
            x0.reshape(-1, h) * rowscale_const
        )
        x0 = full.reshape(residual.shape)
    elif rowscale_const != 1.0:
        x0 = x0 * rowscale_const
    out = dropout_add_layer_norm(
        x0, residual, weight, bias, dropout_p, epsilon,
        prenorm=prenorm, residual_in_fp32=residual_in_fp32, seed=seed,
    )
    normed, resout = out if prenorm else (out, None)
    if out_subset is not None:
        rows = normed.reshape(-1, h)[out_subset.reshape(-1)]
        if out_numrows:
            rows = rows[:out_numrows]
        normed = rows
    return (normed, resout) if prenorm else normed
