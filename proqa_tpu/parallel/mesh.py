"""Mesh construction and sharding helpers (single axis: `data`).

BERT-base workloads need no TP/PP (SURVEY.md §2.7); the scale axes are the
batch (DP pretraining) and the corpus rows (sharded MIPS), both mapped onto
one ICI mesh axis.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def host_device_count() -> int:
    return len(jax.devices())


def shard_batch(mesh: Mesh, tree):
    """Shard leading (batch) dim of every leaf over the data axis."""
    def put(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def shard_rows(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Shard a [N, ...] matrix's rows over the data axis (corpus layout)."""
    spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
