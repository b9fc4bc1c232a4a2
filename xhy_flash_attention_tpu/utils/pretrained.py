"""HF checkpoint loading (≙ reference flash_attn/utils/pretrained.py
state_dict_from_pretrained + the from_pretrained dispatch in models/gpt.py:232).

Loads a torch state dict from a local path or the HF hub (when network and
`transformers` are available), converts tensors to numpy, and dispatches to
the per-family remap onto the GPT skeleton.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

__all__ = ["state_dict_from_pretrained", "gpt_params_from_pretrained",
           "MODEL_FAMILIES"]


def state_dict_from_pretrained(model_name: str, device=None, dtype=None
                               ) -> Dict[str, Any]:
    """Fetch a torch state dict as numpy arrays.

    Accepts a local directory (with pytorch_model.bin / model.safetensors)
    or a hub id. Mirrors the reference helper but returns numpy so no torch
    tensors leak into the JAX program.
    """
    import numpy as np

    if os.path.isdir(model_name):
        for fname in ("model.safetensors", "pytorch_model.bin"):
            path = os.path.join(model_name, fname)
            if os.path.exists(path):
                if fname.endswith(".safetensors"):
                    from safetensors.numpy import load_file

                    return load_file(path)
                import torch

                sd = torch.load(path, map_location="cpu",
                                weights_only=True)
                return {k: v.numpy() for k, v in sd.items()}
        raise FileNotFoundError(f"no checkpoint found in {model_name}")
    # hub path: go through transformers (downloads weights)
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(model_name)
    sd = model.state_dict()
    out = {k: v.to(getattr(torch, dtype) if isinstance(dtype, str) else
                   (dtype or v.dtype)).numpy() for k, v in sd.items()}
    del model
    return out


def _family_of(model_name: str, hf_config) -> str:
    mt = getattr(hf_config, "model_type", "")
    for fam in ("llama", "mistral", "opt", "gptj", "gpt_neox", "falcon",
                "gpt2"):
        if fam in mt or fam in model_name.lower():
            return "llama" if fam == "mistral" else fam
    raise ValueError(f"unsupported model family for {model_name} ({mt})")


def gpt_params_from_pretrained(
    model_name: str,
    hf_config,
    state_dict: Optional[Dict[str, Any]] = None,
    dtype=jnp.float32,
) -> Tuple[Any, Dict[str, Any]]:
    """(GPTConfig, flax params) for any supported decoder family
    (≙ the remap dispatch in reference models/gpt.py:232-263)."""
    from ..models import falcon, gpt, gpt_neox, gptj, llama, opt

    fam = _family_of(model_name, hf_config)
    table = {
        "gpt2": (gpt.gpt2_config_to_gpt_config, gpt.remap_state_dict_hf_gpt2),
        "llama": (llama.llama_config_to_gpt_config,
                  llama.remap_state_dict_hf_llama),
        "opt": (opt.opt_config_to_gpt_config, opt.remap_state_dict_hf_opt),
        "gptj": (gptj.gptj_config_to_gpt_config,
                 gptj.remap_state_dict_hf_gptj),
        "gpt_neox": (gpt_neox.gpt_neox_config_to_gpt_config,
                     gpt_neox.remap_state_dict_hf_gpt_neox),
        "falcon": (falcon.falcon_config_to_gpt_config,
                   falcon.remap_state_dict_hf_falcon),
    }
    to_config, remap = table[fam]
    cfg = to_config(hf_config, dtype=dtype)
    if state_dict is None:
        state_dict = state_dict_from_pretrained(model_name)
    return cfg, remap(state_dict, cfg)


MODEL_FAMILIES = ("gpt2", "llama", "mistral", "opt", "gptj", "gpt_neox",
                  "falcon")
