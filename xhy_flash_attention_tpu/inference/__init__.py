"""Inference runtime: paged KV cache, split-KV decode, continuous batching.

≙ reference FA3 decode features (csrc/flash_attn_v3/flash_api.h:100-150 —
page_table/page_size, knew/vnew append, num_splits + combine kernel) and the
CUDA-graph decode machinery (flash_attn/utils/generation.py:202-300), rebuilt
TPU-native: bucketed jit replaces graph capture, page tables ride
scalar-prefetch SMEM, and the split-KV combine is the same LSE merge used by
the cross-chip ring decode.
"""

from .paged import (
    PagedKVCache,
    paged_flash_decode,
    append_paged_kv,
)
from .combine import merge_attention_partials, flash_decode_splitkv
from .engine import InferenceEngine, Request
from .fused_step import fused_decode_step
from .tp import tp_model_apply
