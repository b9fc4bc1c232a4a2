"""GPT model hub (≙ reference flash_attn/models/gpt.py).

Config-driven factory: every decoder-only family (GPT-2, Llama, OPT, GPT-J,
NeoX, Falcon, Mistral) is this skeleton plus a config translation and a
weight remap (reference pattern: llama_config_to_gpt2_config, llama.py:191).
flax.linen modules; KV caches are functional pytrees threaded through the
call (see modules/mha.py).

Always-on fusions (the reference gates these behind use_flash_attn /
fused_mlp / fused_dropout_add_ln — here they are the only path):
Pallas flash attention, fused dropout-add-norm, XLA-fused dense+activation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..modules.block import Block, _Norm
from ..modules.embedding import GPT2Embeddings
from ..modules.mha import MHA
from ..modules.mlp import GatedMlp, Mlp


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    vocab_size: int = 50257
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    num_attention_heads_kv: Optional[int] = None
    head_dim: Optional[int] = None
    intermediate_size: Optional[int] = None
    max_position_embeddings: int = 1024  # 0 => rotary-only
    activation_function: str = "gelu_approx"  # swiglu/geglu -> GatedMlp
    rms_norm: bool = False
    layer_norm_epsilon: float = 1e-5
    rotary_emb_fraction: float = 0.0
    rotary_emb_base: float = 10000.0
    rotary_emb_interleaved: bool = False
    window_size: Tuple[int, int] = (-1, -1)
    attn_softcap: float = 0.0
    embd_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    residual_in_fp32: bool = True
    prenorm: bool = True
    parallel_block: bool = False
    parallel_block_tied_norm: bool = True
    lm_head_bias: bool = False
    tie_word_embeddings: bool = True
    pad_vocab_size_multiple: int = 1
    qkv_proj_bias: bool = True
    out_proj_bias: bool = True
    mlp_fc1_bias: bool = True
    mlp_fc2_bias: bool = True
    word_embed_proj_dim: Optional[int] = None
    initializer_range: float = 0.02
    # mixture-of-experts MLP (Mixtral): 0 = dense MLP
    num_local_experts: int = 0
    num_experts_per_tok: int = 2
    expert_parallel_axis: Optional[str] = None  # EP mesh axis in shard_map
    # rematerialize each block in backward (jax.checkpoint — trades ~1/3
    # more FLOPs for O(layers) less activation memory)
    remat: bool = False
    # what remat keeps: "save_attn" saves the flash-attention outputs
    # (out + lse, named in the kernel's custom_vjp) so the backward never
    # re-runs the attention forward kernel — the most expensive recompute
    # — for one (b, s, h, d) bf16 + (b, h, s) fp32 saved per layer;
    # "nothing" recomputes everything (minimum memory)
    remat_policy: str = "save_attn"
    # weight-only quantized projections: None | "int8" | "int4" (serving;
    # load weights via quantize_gpt_params)
    weight_quant: Optional[str] = None
    # inside shard_map with the sequence sharded on this axis: ring
    # attention in every layer (context parallelism)
    context_parallel_axis: Optional[str] = None
    # balanced llama3-style causal ring layout (parallel/ring.py): the
    # data pipeline feeds zigzag_shard-permuted token shards; rotary and
    # position embeddings are applied at the matching zigzag positions
    context_parallel_zigzag: bool = False
    # inside shard_map: Megatron tensor/sequence parallelism (D2/D3)
    tensor_parallel_axis: Optional[str] = None
    sequence_parallel: bool = False
    dtype: Any = jnp.float32

    @property
    def weight_quant_dtype(self):
        return {None: None, "int8": jnp.int8, "int4": jnp.int4}[
            self.weight_quant]

    @property
    def padded_vocab_size(self) -> int:
        m = self.pad_vocab_size_multiple
        return (self.vocab_size + m - 1) // m * m


def _mixer_cls(config: GPTConfig):
    rotary_dim = 0
    if config.rotary_emb_fraction > 0:
        hd = config.head_dim or config.hidden_size // config.num_attention_heads
        rotary_dim = int(hd * config.rotary_emb_fraction)
    return functools.partial(
        MHA,
        embed_dim=config.hidden_size,
        num_heads=config.num_attention_heads,
        num_heads_kv=config.num_attention_heads_kv,
        head_dim=config.head_dim,
        qkv_proj_bias=config.qkv_proj_bias,
        out_proj_bias=config.out_proj_bias,
        dropout=config.attn_pdrop,
        causal=True,
        window_size=config.window_size,
        softcap=config.attn_softcap,
        rotary_emb_dim=rotary_dim,
        rotary_emb_base=config.rotary_emb_base,
        rotary_emb_interleaved=config.rotary_emb_interleaved,
        tp_axis=config.tensor_parallel_axis,
        sequence_parallel=config.sequence_parallel,
        dtype=config.dtype,
        weight_quant_dtype=config.weight_quant_dtype,
        context_parallel_axis=config.context_parallel_axis,
        context_parallel_zigzag=config.context_parallel_zigzag,
    )


def _mlp_cls(config: GPTConfig):
    inner = config.intermediate_size or 4 * config.hidden_size
    if config.num_local_experts > 0:
        from ..modules.moe import MoEMlp

        ep = config.expert_parallel_axis
        e = config.num_local_experts
        return functools.partial(
            MoEMlp,
            num_experts=e,
            num_experts_per_tok=config.num_experts_per_tok,
            hidden_features=inner,
            ep_axis=ep,
            num_experts_global=None,
            dtype=config.dtype,
        )
    if config.activation_function in ("swiglu", "geglu"):
        return functools.partial(
            GatedMlp,
            hidden_features=inner,
            activation="silu" if config.activation_function == "swiglu" else "gelu_approx",
            bias1=config.mlp_fc1_bias,
            bias2=config.mlp_fc2_bias,
            multiple_of=1,  # intermediate_size is already final here
            tp_axis=config.tensor_parallel_axis,
            sequence_parallel=config.sequence_parallel,
            dtype=config.dtype,
            weight_quant_dtype=config.weight_quant_dtype,
        )
    return functools.partial(
        Mlp,
        hidden_features=inner,
        activation=config.activation_function,
        bias1=config.mlp_fc1_bias,
        bias2=config.mlp_fc2_bias,
        tp_axis=config.tensor_parallel_axis,
        sequence_parallel=config.sequence_parallel,
        dtype=config.dtype,
        weight_quant_dtype=config.weight_quant_dtype,
    )


class GPTModel(nn.Module):
    config: GPTConfig
    shared_embed: Optional[nn.Module] = None  # tied word embedding table

    @nn.compact
    def __call__(self, input_ids, position_ids=None, *, kv_caches=None,
                 seqlen_offset=0, deterministic=True, segment_ids=None,
                 dropout_seeds=None):
        """Returns (hidden_states, new_kv_caches)."""
        c = self.config
        if (c.context_parallel_axis is not None
                and isinstance(seqlen_offset, int) and seqlen_offset == 0):
            # context parallelism: this shard's rows start at its global
            # offset (positions/rotary must see absolute positions)
            if c.context_parallel_zigzag:
                # zigzag layout: this shard holds chunks r and 2n-1-r —
                # feed the matching global positions to the (learned)
                # position embeddings; MHA rebuilds rotary the same way
                n_cp = jax.lax.psum(1, c.context_parallel_axis)
                me = jax.lax.axis_index(c.context_parallel_axis)
                half = input_ids.shape[1] // 2
                a = jnp.arange(half, dtype=jnp.int32)
                zz = jnp.concatenate(
                    [me * half + a, (2 * n_cp - 1 - me) * half + a])
                if position_ids is None:
                    position_ids = jnp.broadcast_to(zz, input_ids.shape)
            else:
                seqlen_offset = (
                    jax.lax.axis_index(c.context_parallel_axis)
                    * input_ids.shape[1]
                )
        x = GPT2Embeddings(
            embed_dim=c.hidden_size,
            vocab_size=c.padded_vocab_size,
            max_position_embeddings=c.max_position_embeddings,
            word_embed_proj_dim=c.word_embed_proj_dim,
            word_embed=self.shared_embed,
            tp_axis=c.tensor_parallel_axis,
            sequence_parallel=c.sequence_parallel,
            dtype=c.dtype,
            name="embeddings",
        )(input_ids, position_ids, seqlen_offset=seqlen_offset)
        # embedding dropout (reference emb_drop, gpt.py:359-366)
        if not deterministic and c.embd_pdrop > 0.0:
            x = x * jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - c.embd_pdrop, x.shape
            ).astype(x.dtype) / (1.0 - c.embd_pdrop)

        residual = None
        hidden = x
        new_caches = [] if kv_caches is not None else None
        mixer = _mixer_cls(c)
        mlp = _mlp_cls(c)
        block_cls = Block
        use_remat = c.remat and kv_caches is None
        if use_remat:
            # deterministic and seqlen_offset are python statics (indices
            # count from self: self=0, hidden=1, residual=2, ...)
            if c.remat_policy == "save_attn":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "attn_lse")
            elif c.remat_policy == "save_dots":
                # Save every matmul output AND the attention out/lse (the
                # pallas call is opaque to dots_saveable) — the backward
                # recomputes only cheap VPU elementwise (norms, gelu,
                # residual adds), which overlaps with the bwd matmuls.
                # ~4/3x cheaper in MXU time than "save_attn" at ~1.7 GB
                # extra residency for gpt2m b4 s1024.
                policy = jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_saveable,
                    jax.checkpoint_policies.save_only_these_names(
                        "attn_out", "attn_lse"),
                )
            else:
                policy = jax.checkpoint_policies.nothing_saveable
            block_cls = nn.remat(
                Block, static_argnums=(3, 6), prevent_cse=False,
                policy=policy,
            )
        for i in range(c.num_hidden_layers):
            cache_i = kv_caches[i] if kv_caches is not None else None
            hidden, residual, new_cache = block_cls(
                dim=c.hidden_size,
                mixer=mixer,
                mlp=mlp,
                norm_eps=c.layer_norm_epsilon,
                rms_norm=c.rms_norm,
                prenorm=c.prenorm,
                resid_dropout1=c.embd_pdrop if i == 0 else c.resid_pdrop,
                resid_dropout2=c.resid_pdrop,
                residual_in_fp32=c.residual_in_fp32,
                parallel_block=c.parallel_block,
                parallel_block_tied_norm=c.parallel_block_tied_norm,
                name=f"layers_{i}",
            )(
                hidden, residual, deterministic, (None, None),
                cache_i, seqlen_offset, segment_ids, segment_ids,
            )
            if new_caches is not None:
                new_caches.append(new_cache)
        if c.prenorm:
            # final fused norm over (hidden, residual) (reference
            # gpt.py:399-415); postnorm models (OPT-350m) have none
            normf = _Norm(rms=c.rms_norm, eps=c.layer_norm_epsilon,
                          name="norm_f")
            drop_f = 0.0 if deterministic else c.resid_pdrop
            hidden = normf(hidden, residual, drop_f, False, c.residual_in_fp32)
        return hidden, new_caches


class GPTLMHeadModel(nn.Module):
    config: GPTConfig

    def setup(self):
        c = self.config
        if c.tie_word_embeddings:
            # shared table: used by the embedding layer and attended by the
            # head (≙ reference tie_weights, gpt.py:441-457); lives in
            # word_embed_proj_dim when the embedding is factorized (OPT-350m)
            self.wte = nn.Embed(
                c.padded_vocab_size,
                c.word_embed_proj_dim or c.hidden_size, dtype=c.dtype,
                embedding_init=nn.initializers.normal(
                    stddev=c.initializer_range
                ),
                name="wte",
            )
            self.transformer = GPTModel(c, shared_embed=self.wte,
                                        name="transformer")
        elif c.weight_quant is not None:
            from ..modules.linear import QuantDense

            self.transformer = GPTModel(c, name="transformer")
            self.lm_head = QuantDense(
                c.padded_vocab_size, use_bias=c.lm_head_bias,
                quant_dtype=c.weight_quant_dtype, dtype=c.dtype,
                name="lm_head",
            )
        else:
            self.transformer = GPTModel(c, name="transformer")
            self.lm_head = nn.Dense(
                c.padded_vocab_size, use_bias=c.lm_head_bias, dtype=c.dtype,
                kernel_init=nn.initializers.normal(
                    stddev=c.initializer_range
                ),
                name="lm_head",
            )
        if c.word_embed_proj_dim is not None:
            # OPT-style factorized head: hidden -> word_embed_proj_dim
            # before scoring (≙ reference project_out, models/opt.py:26)
            self.project_out = nn.Dense(
                c.word_embed_proj_dim, use_bias=False, dtype=c.dtype,
                name="project_out",
            )

    def __call__(self, input_ids, position_ids=None, *, kv_caches=None,
                 seqlen_offset=0, deterministic=True, segment_ids=None):
        hidden, new_caches = self.transformer(
            input_ids, position_ids, kv_caches=kv_caches,
            seqlen_offset=seqlen_offset, deterministic=deterministic,
            segment_ids=segment_ids,
        )
        c = self.config
        if c.tensor_parallel_axis is not None:
            # the head is column-parallel: SP gathers sequence shards so
            # every rank scores all rows against its vocab shard; without SP
            # the identity/psum `f` operator fixes the input cotangent
            # (≙ reference lm_head ColumnParallelLinear)
            from ..modules.linear import gather_sp_input

            hidden = gather_sp_input(
                hidden, c.tensor_parallel_axis, c.sequence_parallel
            )
        if c.word_embed_proj_dim is not None:
            hidden = self.project_out(hidden)
        if c.tie_word_embeddings:
            logits = self.wte.attend(hidden)
        else:
            logits = self.lm_head(hidden)
        return logits, new_caches

    def allocate_kv_caches(self, batch_size: int, max_seqlen: int,
                           dtype=None):
        """Per-layer (k, v) caches (≙ allocate_inference_cache, gpt.py)."""
        c = self.config
        hk = c.num_attention_heads_kv or c.num_attention_heads
        d = c.head_dim or c.hidden_size // c.num_attention_heads
        dtype = dtype or c.dtype
        shape = (batch_size, hk, max_seqlen, d)
        if jnp.dtype(dtype) in (jnp.int8.dtype, jnp.float8_e4m3fn.dtype):
            # quantized KV cache (≙ FA3 FP8 KV / BASELINE INT8-KV target)
            from ..ops.quant import QuantizedKV

            def mk():
                return QuantizedKV(
                    jnp.zeros(shape, dtype),
                    jnp.ones(shape[:-1] + (1,), jnp.float32),
                )

            return [(mk(), mk()) for _ in range(c.num_hidden_layers)]
        return [
            (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
            for _ in range(c.num_hidden_layers)
        ]


def quantize_gpt_params(params, config: GPTConfig):
    """Float params -> weight-only-quantized params for a model built with
    config.weight_quant set: every projection `kernel` (mixer/mlp/lm_head)
    becomes (kernel_q, kernel_scale) with per-output-channel scales
    (≙ BASELINE config #3 weight-only INT8/INT4 serving). Embeddings and
    norms stay float (their reads are negligible)."""
    from ..ops.quant import quantize_weight

    dtype = config.weight_quant_dtype
    assert dtype is not None, "config.weight_quant must be set"

    def walk(tree, in_proj):
        out = {}
        for key, val in tree.items():
            proj_scope = in_proj or key in ("mixer", "mlp", "lm_head")
            if isinstance(val, dict):
                if "kernel" in val and proj_scope:
                    new = {kk: vv for kk, vv in val.items() if kk != "kernel"}
                    wq, scale = quantize_weight(val["kernel"], dtype)
                    new["kernel_q"] = wq
                    new["kernel_scale"] = scale
                    out[key] = new
                else:
                    out[key] = walk(val, proj_scope)
            else:
                out[key] = val
        return out

    p = dict(params["params"]) if "params" in params else dict(params)
    quantized = walk(p, False)
    return {"params": quantized} if "params" in params else quantized


# ---------------------------------------------------------------------------
# HF GPT-2 remap (≙ reference remap_state_dict_hf_gpt2 / gpt2_config handling)
# ---------------------------------------------------------------------------

def gpt2_config_to_gpt_config(hf_config, dtype=jnp.float32) -> GPTConfig:
    """Translate a transformers GPT2Config (≙ reference uses GPT2Config
    directly; we normalize into GPTConfig)."""
    g = hf_config
    return GPTConfig(
        vocab_size=g.vocab_size,
        hidden_size=g.n_embd,
        num_hidden_layers=g.n_layer,
        num_attention_heads=g.n_head,
        intermediate_size=g.n_inner if g.n_inner is not None else 4 * g.n_embd,
        max_position_embeddings=g.n_positions,
        activation_function="gelu_approx",
        layer_norm_epsilon=g.layer_norm_epsilon,
        embd_pdrop=g.embd_pdrop,
        resid_pdrop=g.resid_pdrop,
        attn_pdrop=g.attn_pdrop,
        tie_word_embeddings=True,
        dtype=dtype,
    )


def remap_state_dict_megatron(state_dict, config: GPTConfig):
    """Megatron-LM GPT checkpoint (numpy values) -> flax params
    (≙ reference remap_state_dict_megatron, models/gpt.py:697).

    Megatron stores torch (out, in) weights with Wqkv interleaved per head
    ((nheads 3 headdim), hidden) and keys under language_model.encoder.
    """
    import numpy as np
    import re

    sd = {}
    for k, v in state_dict.items():
        k = re.sub(r"^language_model\.encoder\.", "", k)
        k = re.sub(r"^language_model\.", "", k)
        sd[k] = np.asarray(v)

    def t(name):
        return jnp.asarray(sd[name].T)

    def g(name):
        return jnp.asarray(sd[name])

    h = config.num_attention_heads
    d = config.head_dim or config.hidden_size // h
    V = config.padded_vocab_size
    emb = sd["embedding.word_embeddings.weight"]
    if emb.shape[0] < V:
        emb = np.concatenate(
            [emb, np.zeros((V - emb.shape[0], emb.shape[1]), emb.dtype)]
        )
    elif emb.shape[0] > V:
        emb = emb[:V]
    params = {
        "wte": {"embedding": jnp.asarray(emb)},
        "transformer": {
            "embeddings": {
                "position_embeddings": {
                    "embedding": g("embedding.position_embeddings.weight")
                }
            },
            "norm_f": {"weight": g("final_layernorm.weight"),
                       "bias": g("final_layernorm.bias")},
        },
    }

    def deinterleave(w):
        shape = w.shape[1:]
        w = w.reshape(h, 3, d, *shape)
        return np.moveaxis(w, 1, 0).reshape(3 * h * d, *shape)

    for i in range(config.num_hidden_layers):
        p = f"layers.{i}."
        wqkv = deinterleave(
            sd[p + "self_attention.query_key_value.weight"]
        ).T
        bqkv = deinterleave(sd[p + "self_attention.query_key_value.bias"])
        params["transformer"][f"layers_{i}"] = {
            "norm1": {"weight": g(p + "input_layernorm.weight"),
                      "bias": g(p + "input_layernorm.bias")},
            "norm2": {"weight": g(p + "post_attention_layernorm.weight"),
                      "bias": g(p + "post_attention_layernorm.bias")},
            "mixer": {
                "Wqkv": {"kernel": jnp.asarray(wqkv),
                         "bias": jnp.asarray(bqkv)},
                "out_proj": {"kernel": t(p + "self_attention.dense.weight"),
                             "bias": g(p + "self_attention.dense.bias")},
            },
            "mlp": {
                "fc1": {"kernel": t(p + "mlp.dense_h_to_4h.weight"),
                        "bias": g(p + "mlp.dense_h_to_4h.bias")},
                "fc2": {"kernel": t(p + "mlp.dense_4h_to_h.weight"),
                        "bias": g(p + "mlp.dense_4h_to_h.bias")},
            },
        }
    return {"params": params}


def remap_state_dict_hf_gpt2(state_dict, config: GPTConfig):
    """torch GPT2LMHeadModel state_dict (numpy values) -> flax params.

    HF Conv1D stores weight as (in, out) — already flax kernel layout.
    """
    import numpy as np

    def g(name):
        return jnp.asarray(np.asarray(state_dict[name]))

    V = config.padded_vocab_size
    wte = np.asarray(state_dict["transformer.wte.weight"])
    if wte.shape[0] < V:
        wte = np.concatenate(
            [wte, np.zeros((V - wte.shape[0], wte.shape[1]), wte.dtype)]
        )
    params = {
        "wte": {"embedding": jnp.asarray(wte)},
        "transformer": {
            "embeddings": {
                "position_embeddings": {
                    "embedding": g("transformer.wpe.weight")
                }
            },
            "norm_f": {
                "weight": g("transformer.ln_f.weight"),
                "bias": g("transformer.ln_f.bias"),
            },
        },
    }
    for i in range(config.num_hidden_layers):
        p = f"transformer.h.{i}."
        params["transformer"][f"layers_{i}"] = {
            "norm1": {"weight": g(p + "ln_1.weight"),
                      "bias": g(p + "ln_1.bias")},
            "norm2": {"weight": g(p + "ln_2.weight"),
                      "bias": g(p + "ln_2.bias")},
            "mixer": {
                "Wqkv": {"kernel": g(p + "attn.c_attn.weight"),
                         "bias": g(p + "attn.c_attn.bias")},
                "out_proj": {"kernel": g(p + "attn.c_proj.weight"),
                             "bias": g(p + "attn.c_proj.bias")},
            },
            "mlp": {
                "fc1": {"kernel": g(p + "mlp.c_fc.weight"),
                        "bias": g(p + "mlp.c_fc.bias")},
                "fc2": {"kernel": g(p + "mlp.c_proj.weight"),
                        "bias": g(p + "mlp.c_proj.bias")},
            },
        }
    return {"params": params}
