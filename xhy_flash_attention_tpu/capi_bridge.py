"""numpy-in / numpy-out shims behind the embeddable C API.

The reference exposes every kernel entry point as a typed extern "C"
symbol (/root/reference/csrc/capi/flash_attn.h:11-319: flash_attn_fwd/bwd,
flash_attn_varlen_fwd/bwd with attn_mask + the flashmask vectors,
calc_reduced_attn_scores). On TPU the kernels are XLA executables owned by
the JAX runtime, so the C library (csrc/capi/xfa_capi.cpp) embeds CPython
and calls these functions: plain positional args, numpy arrays in, numpy
arrays out — everything the C side needs to do is copy host buffers.

Layouts follow the reference C API: dense tensors are (b, s, h, d),
packed varlen tensors are (total, h, d) with (b+1,) int32 cu_seqlens,
softmax_lse is (b, h, sq) fp32, attention bias ("attn_mask") is fp32
broadcastable (bias_b, bias_h, sq, sk), and the flashmask sparse mask is
the (b, hm, sk, nv) startend_row_indices tensor (nv in {1, 2, 4} — the
reference's downstart/upend/downend/upstart pointers stacked).

dtype: "float32" or "bfloat16" (bf16 buffers cross the ABI as raw 2-byte
elements; ml_dtypes — shipped with jax — gives numpy the dtype).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

__all__ = [
    "attn_fwd", "attn_bwd", "varlen_fwd", "varlen_bwd", "reduced_scores",
    "np_dtype",
]

_DTYPES = {"float32": np.float32, "bfloat16": ml_dtypes.bfloat16}


def np_dtype(name: str):
    return _DTYPES[name]


def _to_bhsd(x):
    return jnp.swapaxes(jnp.asarray(x), 1, 2)


def _fm_call_kwargs(fm_idx, causal):
    """startend_row_indices (b, hm, sk, nv) -> flashmask kernel inputs."""
    from .ops.flash_attention.common import fm_mode_for

    idx = jnp.asarray(fm_idx, jnp.int32)
    nv = idx.shape[-1]
    return {
        "flashmask_vecs": jnp.moveaxis(idx, -1, 2),  # (b, hm, nv, sk)
        "flashmask_mode": fm_mode_for(causal, nv),
    }


def attn_fwd(q, k, v, bias, fm_idx, p_dropout, seed, softmax_scale,
             causal, window_left, window_right, softcap):
    """Dense forward (≙ flash_attn_fwd, capi/flash_attn.h:11).

    q (b, sq, h, d), k/v (b, sk, hk, d) numpy (f32 or bf16);
    bias fp32 (bias_b, bias_h, sq, sk) or None; fm_idx (b, hm, sk, nv)
    int32 or None. Returns (out (b, sq, h, d) same dtype, lse (b, h, sq)
    fp32) as numpy arrays.
    """
    if bias is not None and fm_idx is not None:
        raise ValueError("attn_mask and flashmask are mutually exclusive")
    from .ops.flash_attention.interface import flash_attention

    qt, kt, vt = _to_bhsd(q), _to_bhsd(k), _to_bhsd(v)
    kwargs = dict(
        softmax_scale=float(softmax_scale) if softmax_scale > 0 else None,
        causal=bool(causal),
        window_size=(int(window_left), int(window_right)),
        softcap=float(softcap),
        dropout_p=float(p_dropout),
        dropout_seed=int(seed) if p_dropout > 0 else None,
        return_lse=True,
    )
    if fm_idx is not None:
        if p_dropout > 0 or softcap > 0 or window_left >= 0 \
                or window_right >= 0:
            raise ValueError(
                "flashmask composes with causal/scale only "
                "(no dropout/window/softcap), like flashmask_attention")
        from .ops.flash_attention.flashmask import flashmask_attention

        out, lse = flashmask_attention(
            qt, kt, vt,
            jnp.asarray(fm_idx, jnp.int32),
            causal=bool(causal),
            softmax_scale=kwargs["softmax_scale"],
            return_lse=True,
        )
    else:
        b = None if bias is None else jnp.asarray(bias, jnp.float32)
        out, lse = flash_attention(qt, kt, vt, b, **kwargs)
    out = np.asarray(jnp.swapaxes(out, 1, 2))
    return out, np.asarray(lse, np.float32)


def attn_bwd(dout, q, k, v, out, lse, bias, fm_idx, p_dropout, seed,
             softmax_scale, causal, window_left, window_right, softcap):
    """Dense backward (≙ flash_attn_bwd, capi/flash_attn.h:100).

    Takes the forward's saved out/lse like the reference (no fwd
    recompute). Returns (dq, dk, dv, dbias) — dbias fp32 in the bias's
    broadcast shape, or None when bias is None.
    """
    if bias is not None and fm_idx is not None:
        raise ValueError("attn_mask and flashmask are mutually exclusive")
    from .ops.flash_attention.bwd import flash_attention_bwd

    d = q.shape[-1]
    scale = float(softmax_scale) if softmax_scale > 0 else d ** -0.5
    kwargs = dict(
        sm_scale=scale,
        causal=bool(causal),
        window_size=(int(window_left), int(window_right)),
        softcap=float(softcap),
        dropout_p=float(p_dropout),
        dropout_seed=int(seed) if p_dropout > 0 else None,
    )
    if fm_idx is not None:
        kwargs.update(_fm_call_kwargs(fm_idx, bool(causal)))
    dq, dk, dv, dbias = flash_attention_bwd(
        _to_bhsd(q), _to_bhsd(k), _to_bhsd(v), _to_bhsd(out),
        jnp.asarray(lse, jnp.float32), _to_bhsd(dout),
        None if bias is None else jnp.asarray(bias, jnp.float32),
        **kwargs,
    )
    dq = np.asarray(jnp.swapaxes(dq, 1, 2))
    dk = np.asarray(jnp.swapaxes(dk, 1, 2))
    dv = np.asarray(jnp.swapaxes(dv, 1, 2))
    return dq, dk, dv, (None if dbias is None
                        else np.asarray(dbias, np.float32))


def varlen_fwd(q, k, v, cu_seqlens_q, cu_seqlens_k, p_dropout, seed,
               softmax_scale, causal, window_left, window_right, softcap):
    """Packed varlen forward (≙ flash_attn_varlen_fwd, capi/flash_attn.h:57).

    q (total_q, h, d), k/v (total_k, hk, d), cu_seqlens (b+1,) int32.
    Returns (out (total_q, h, d), lse (h, total_q) fp32).
    """
    from .ops.flash_attention.interface import flash_attn_varlen_func

    out, lse = flash_attn_varlen_func(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(cu_seqlens_q, jnp.int32),
        jnp.asarray(cu_seqlens_k, jnp.int32),
        0, 0,
        dropout_p=float(p_dropout),
        softmax_scale=float(softmax_scale) if softmax_scale > 0 else None,
        causal=bool(causal),
        window_size=(int(window_left), int(window_right)),
        softcap=float(softcap),
        dropout_seed=int(seed) if p_dropout > 0 else None,
        return_lse=True,
    )
    return np.asarray(out), np.asarray(lse, np.float32)


def varlen_bwd(dout, q, k, v, cu_seqlens_q, cu_seqlens_k, p_dropout, seed,
               softmax_scale, causal, window_left, window_right, softcap):
    """Packed varlen backward (≙ flash_attn_varlen_bwd,
    capi/flash_attn.h:163). Computed as the VJP of the packed forward
    (one fwd recompute — the varlen glue derives segment ids and
    bottom-right-aligned positions from cu_seqlens, so reusing the
    differentiable entry point keeps the two in lockstep)."""
    from .ops.flash_attention.interface import flash_attn_varlen_func

    def f(q, k, v):
        return flash_attn_varlen_func(
            q, k, v,
            jnp.asarray(cu_seqlens_q, jnp.int32),
            jnp.asarray(cu_seqlens_k, jnp.int32),
            0, 0,
            dropout_p=float(p_dropout),
            softmax_scale=float(softmax_scale) if softmax_scale > 0
            else None,
            causal=bool(causal),
            window_size=(int(window_left), int(window_right)),
            softcap=float(softcap),
            dropout_seed=int(seed) if p_dropout > 0 else None,
        )

    _, vjp = jax.vjp(f, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    dq, dk, dv = vjp(jnp.asarray(dout, q.dtype))
    return np.asarray(dq), np.asarray(dk), np.asarray(dv)


def reduced_scores(q, k, lse, causal, softmax_scale):
    """≙ calc_reduced_attn_scores (capi/flash_attn.h:223): per-key
    attention mass summed over queries. q (b, sq, h, d), k (b, sk, hk, d);
    lse (b, h, sq) fp32 from a prior fwd, or None to compute it here.
    Returns (b, h, sk) fp32."""
    from .ops.flash_attention.fwd import flash_attention_fwd
    from .ops.flash_attention.reduced_scores import calc_reduced_attn_scores

    qt, kt = _to_bhsd(q), _to_bhsd(k)
    d = q.shape[-1]
    scale = float(softmax_scale) if softmax_scale > 0 else d ** -0.5
    if lse is None:
        _, lse = flash_attention_fwd(
            qt, kt, kt, sm_scale=scale, causal=bool(causal))
    red = calc_reduced_attn_scores(
        qt, kt, jnp.asarray(lse, jnp.float32), causal=bool(causal),
        softmax_scale=scale,
    )
    return np.asarray(red, np.float32)
