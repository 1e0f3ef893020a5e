"""Device-mesh parallelism: mesh helpers, sharded corpus search, DP training.

The reference's distribution story is NCCL DataParallel/DDP
(/root/reference/retrieval/train_retriever.py:64-74,167-171). Here the
equivalents are XLA-native: a 1-D `jax.sharding.Mesh` over the `data` axis;
pjit-sharded batches (gradient all-reduce over ICI inserted by XLA); and a
row-sharded corpus with a cross-chip top-k candidate merge for MIPS.
"""

from proqa_tpu.parallel.mesh import (
    DATA_AXIS,
    host_device_count,
    make_mesh,
    replicate,
    shard_batch,
    shard_rows,
)
from proqa_tpu.parallel.search import sharded_mips_topk

__all__ = [
    "DATA_AXIS",
    "host_device_count",
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_rows",
    "sharded_mips_topk",
]
