"""Dense corpus index: HBM-resident embedding matrix + id mapping + search."""

from proqa_tpu.index.idmap import IdMap
from proqa_tpu.index.dense import DenseIndex

__all__ = ["DenseIndex", "IdMap"]
