"""Corpus clustering for progressive (cluster-batched) retriever pretraining.

Equivalent of /root/reference/retrieval/group_paras.py: k-means the training
pairs' paragraph embeddings (on-device Lloyd's — ops/kmeans.py — instead of
FAISS), then shard the pretraining jsonl so each output file holds one
cluster's examples. ClusterPairDataset + cluster_batch_order consume the
shards so every batch carries hard in-batch negatives.

(Note: the reference's clusering() trains on a global variable instead of its
argument — group_paras.py:45 — reproduced here *correctly*.)
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from proqa_tpu.ops.kmeans import kmeans


def cluster_corpus_embeddings(
    embeddings: np.ndarray,
    ncentroids: int = 10000,
    *,
    niter: int = 250,
    max_points_per_centroid: int | None = 1000,
    spherical: bool = False,
    seed: int = 0,
    init: str = "auto",
) -> np.ndarray:
    """Cluster [N, D] embeddings; returns int32 assignments [N]. Defaults
    mirror the reference recipe (ncentroids 10000 / niter 250 /
    max_points_per_centroid 1000 — group_paras.py:57-59)."""
    res = kmeans(
        jax.random.PRNGKey(seed),
        jnp.asarray(embeddings, jnp.float32),
        ncentroids,
        niter=niter,
        spherical=spherical,
        max_points_per_centroid=max_points_per_centroid,
        init=init,
    )
    return np.asarray(res.assignments)


def write_cluster_shards(
    pairs_jsonl: str, assignments: np.ndarray, out_dir: str, prefix: str = "split_"
) -> int:
    """Write one `<prefix><cluster>.jsonl` per non-empty cluster; line i of
    pairs_jsonl goes to shard assignments[i]. Returns shard count."""
    os.makedirs(out_dir, exist_ok=True)
    with open(pairs_jsonl) as f:
        lines = f.readlines()
    assert len(lines) == len(assignments), (
        f"{len(lines)} pairs vs {len(assignments)} assignments"
    )
    ncentroids = int(assignments.max()) + 1 if len(assignments) else 0
    buckets: dict[int, list[str]] = {}
    for line, a in zip(lines, assignments):
        buckets.setdefault(int(a), []).append(line)
    width = len(str(max(ncentroids - 1, 0)))
    for c, bucket in sorted(buckets.items()):
        with open(os.path.join(out_dir, f"{prefix}{c:0{width}d}.jsonl"), "w") as f:
            f.writelines(bucket)
    return len(buckets)
