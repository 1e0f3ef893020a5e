"""Host-side data pipeline: document store, datasets, samplers, static-shape
collation, prefetching loader."""

from proqa_tpu.data.docdb import DocDB
from proqa_tpu.data.collate import collate_tokens, pad_to
from proqa_tpu.data.datasets import (
    ClusterPairDataset,
    EncodeDataset,
    PairDataset,
    cluster_batch_order,
    grouped_shuffle_order,
)
from proqa_tpu.data.loader import BatchLoader

__all__ = [
    "BatchLoader",
    "ClusterPairDataset",
    "DocDB",
    "EncodeDataset",
    "PairDataset",
    "cluster_batch_order",
    "collate_tokens",
    "grouped_shuffle_order",
    "pad_to",
]
