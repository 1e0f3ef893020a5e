"""TPU compute kernels: exact/approx MIPS top-k and on-device k-means."""

from proqa_tpu.ops.mips import (
    mips_topk,
    mips_topk_blockmax,
    mips_topk_chunked_approx,
    mips_topk_reference,
)

__all__ = [
    "mips_topk",
    "mips_topk_blockmax",
    "mips_topk_chunked_approx",
    "mips_topk_reference",
]
