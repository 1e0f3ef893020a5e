"""Dense corpus index: HBM-resident embedding matrix + id mapping + search,
plus index building, recall evaluation, corpus clustering, and IVF."""

from proqa_tpu.index.idmap import IdMap
from proqa_tpu.index.dense import DenseIndex, IVFDenseIndex
from proqa_tpu.index.build import build_index, encode_corpus
from proqa_tpu.index.cluster import cluster_corpus_embeddings, write_cluster_shards
from proqa_tpu.index.ivf import IVFIndex, build_ivf
from proqa_tpu.index.recall import evaluate_retrieval, recall_at_k

__all__ = [
    "DenseIndex",
    "IVFDenseIndex",
    "IVFIndex",
    "IdMap",
    "build_index",
    "build_ivf",
    "cluster_corpus_embeddings",
    "encode_corpus",
    "evaluate_retrieval",
    "recall_at_k",
    "write_cluster_shards",
]
