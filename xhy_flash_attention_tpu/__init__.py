"""xhy_flash_attention_tpu — a TPU-native flash-attention framework.

Built from scratch on JAX/XLA/Pallas: MXU-tiled flash-attention kernels,
fused transformer ops, a tensor/sequence-parallel model zoo, a quantized
inference engine, and a training harness. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"

from .ops.flash_attention import (
    BlockSizes,
    blocksparse_attention,
    calc_reduced_attn_scores,
    flashmask_attention,
    flash_attention,
    flash_attn_fp8_func,
    flash_attn_with_kvcache,
    flash_attn_func,
    flash_attn_qkvpacked_func,
    flash_attn_kvpacked_func,
    flash_attn_varlen_func,
    flash_attn_varlen_qkvpacked_func,
    flash_attn_varlen_kvpacked_func,
)
