"""FlashMask block-skipping benchmark.

Shows the point of FlashMask (≙ the reference fork's headline feature):
a document mask over a long packed sequence makes most (q-block, kv-block)
tiles fully masked; the kernel skips them from the scalar-prefetched block
stats, so runtime tracks the *visible* area, not O(s²).

Run: PYTHONPATH=.:$PYTHONPATH python benchmarks/benchmark_flashmask.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from xhy_flash_attention_tpu.ops.flash_attention import (
    causal_document_mask,
    flashmask_attention,
)
from xhy_flash_attention_tpu.ops.flash_attention.interface import flash_attention
from xhy_flash_attention_tpu.utils.benchmark import benchmark_chained


def run(b=2, h=16, s=8192, d=128):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)

    def dense_step(x):
        return flash_attention(x, x, x, causal=True)

    t_dense = benchmark_chained(dense_step, q, n=12)
    flops_dense = 4 * b * h * s * s * d * 0.5
    print(f"dense causal s={s}: {flops_dense / t_dense / 1e12:.1f} TFLOP/s "
          f"({t_dense * 1e3:.2f} ms)", flush=True)

    for ndocs in (4, 16, 64):
        doc_len = s // ndocs
        docs = jnp.asarray(
            np.repeat(np.arange(ndocs), doc_len)[None].repeat(b, 0), jnp.int32
        )
        idx = causal_document_mask(docs)

        def fm_step(x, idx=idx):
            return flashmask_attention(x, x, x, idx, causal=True)

        t = benchmark_chained(fm_step, q, n=12)
        # visible work: ndocs causal blocks of doc_len
        flops_vis = 4 * b * h * ndocs * doc_len * doc_len * d * 0.5
        print(f"docmask ndocs={ndocs}: {t * 1e3:.2f} ms "
              f"({t_dense / t:.2f}x vs dense causal; visible area "
              f"{flops_vis / flops_dense:.1%}, achieved "
              f"{flops_vis / t / 1e12:.1f} TF/s on visible work)", flush=True)


if __name__ == "__main__":
    run()
