"""On-device Lloyd's k-means for corpus clustering.

Replaces faiss.Clustering (/root/reference/retrieval/group_paras.py:20-53):
spherical (inner-product) or L2 geometry, `max_points_per_centroid`
subsampling, empty-cluster carryover. Assignment and centroid update are both
MXU matmuls (scores and one-hot aggregation), scanned over data chunks so
[N, k] distance matrices never materialize.

Used for cluster-batched "progressive" retriever pretraining (writing one
shard per cluster, reference group_paras.group_paras) and for IVF coarse
quantizers (index/ivf.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class KMeansResult(NamedTuple):
    centroids: jax.Array     # [k, D] f32
    assignments: jax.Array   # [N] i32
    # mean best ASSIGNMENT SCORE (higher = better for both geometries):
    # inner product when spherical, the L2 surrogate x.c - |c|^2/2 otherwise
    # (NOT a distance — it grows as clustering improves and can be negative)
    objective: jax.Array


def _chunk_scores(x: jax.Array, centroids: jax.Array, spherical: bool) -> jax.Array:
    """Higher is better. L2 argmin == argmax of (x.c - |c|^2/2)."""
    # f32 scoring pinned to true-f32 (repo convention: TPU DEFAULT silently
    # runs bf16 passes, making near-tie assignments backend-dependent)
    ip = jnp.einsum("nd,kd->nk", x, centroids,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    if spherical:
        return ip
    c_sq = 0.5 * jnp.sum(jnp.square(centroids), axis=-1)
    return ip - c_sq[None, :]


@functools.partial(jax.jit, static_argnames=("spherical", "chunk"))
def assign_clusters(
    data: jax.Array, centroids: jax.Array, *, spherical: bool = False, chunk: int = 1 << 16
):
    """Nearest-centroid assignment, scanned over row chunks.

    Returns (assignments [N] i32, best_scores [N] f32). N is padded internally
    to a chunk multiple; callers receive exactly N entries.
    """
    n, d = data.shape
    pad = (-n) % chunk
    if pad:
        data = jnp.pad(data, ((0, pad), (0, 0)))
    chunks = data.reshape(-1, chunk, d)

    def body(_, x):
        s = _chunk_scores(x.astype(jnp.float32), centroids, spherical)
        return None, (jnp.argmax(s, axis=-1).astype(jnp.int32), jnp.max(s, axis=-1))

    _, (a, v) = jax.lax.scan(body, None, chunks)
    return a.reshape(-1)[:n], v.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("k", "spherical", "chunk"))
def _lloyd_iter(data, centroids, *, k, spherical, chunk):
    n, d = data.shape
    pad = (-n) % chunk
    valid_n = n
    if pad:
        data = jnp.pad(data, ((0, pad), (0, 0)))
    chunks = data.reshape(-1, chunk, d)
    offs = jnp.arange(chunks.shape[0]) * chunk

    def body(carry, inp):
        sums, counts, obj = carry
        x, off = inp
        x32 = x.astype(jnp.float32)
        s = _chunk_scores(x32, centroids, spherical)
        row_valid = (off + jnp.arange(chunk)) < valid_n
        a = jnp.argmax(s, axis=-1)
        onehot = (
            jax.nn.one_hot(a, k, dtype=jnp.float32) * row_valid[:, None]
        )
        sums = sums + jnp.einsum("nk,nd->kd", onehot, x32, preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(onehot, axis=0)
        obj = obj + jnp.sum(jnp.max(s, axis=-1) * row_valid)
        return (sums, counts, obj), None

    init = (
        jnp.zeros((k, d), jnp.float32),
        jnp.zeros((k,), jnp.float32),
        jnp.zeros((), jnp.float32),
    )
    (sums, counts, obj), _ = jax.lax.scan(body, init, (chunks, offs))

    new_centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    # Empty clusters keep their previous centroid (FAISS-style carryover).
    new_centroids = jnp.where((counts > 0)[:, None], new_centroids, centroids)
    if spherical:
        norm = jnp.linalg.norm(new_centroids, axis=-1, keepdims=True)
        new_centroids = new_centroids / jnp.maximum(norm, 1e-12)
    return new_centroids, obj / valid_n


def _kmeanspp_init(rng, train, k, spherical):
    """k-means++ seeding: sample each next centroid ∝ squared distance to the
    nearest chosen one. O(k·N·D) — use for moderate k; random init for huge k."""
    n = train.shape[0]
    rng_first, rng = jax.random.split(rng)  # never consume a key twice
    first = jax.random.randint(rng_first, (), 0, n)
    x32 = train.astype(jnp.float32)

    def body(carry, r):
        centroids, d2 = carry
        total = jnp.sum(d2)
        # all-zero residuals (k >= distinct points): ∝-d2 sampling would
        # cumsum zeros and silently clamp to the LAST row for every
        # remaining centroid — fall back to uniform (duplicates are then
        # benign: Lloyd's empty-cluster carryover keeps them stable)
        probs = jnp.where(
            total > 0.0, d2 / jnp.maximum(total, 1e-12), jnp.full_like(d2, 1.0 / n)
        )
        nxt = jax.random.choice(r, n, p=probs)
        c = x32[nxt]
        nd2 = jnp.sum(jnp.square(x32 - c[None, :]), axis=-1)
        return (centroids, jnp.minimum(d2, nd2)), c

    c0 = x32[first]
    d2 = jnp.sum(jnp.square(x32 - c0[None, :]), axis=-1)
    keys = jax.random.split(rng, k - 1)
    (_, _), rest = jax.lax.scan(body, (None, d2), keys)
    return jnp.concatenate([c0[None, :], rest], axis=0)


def kmeans(
    rng: jax.Array,
    data: jax.Array,
    k: int,
    *,
    niter: int = 25,
    spherical: bool = False,
    max_points_per_centroid: int | None = None,
    chunk: int = 1 << 16,
    init: str = "auto",
) -> KMeansResult:
    """Lloyd's k-means. Final assignment covers the FULL dataset even when
    training is subsampled via max_points_per_centroid (FAISS semantics,
    reference group_paras.py:43).

    init: "kmeans++" | "random" | "auto" (++ for k <= 1024, else random —
    matching FAISS's random sampling at corpus-clustering scale).
    """
    # bound the [chunk, k] score matrix to ~256MB f32 (k=10000 corpus-scale
    # clustering would otherwise materialize multi-GB score chunks)
    chunk = min(chunk, max(1024, (1 << 26) // max(k, 1)))
    n = data.shape[0]
    train = data
    # split per use: reusing one key for subsample AND init would correlate
    # the draws (init picks a deterministic function of the subsample)
    rng_sub, rng_init = jax.random.split(rng)
    if max_points_per_centroid is not None and n > k * max_points_per_centroid:
        sel = jax.random.choice(rng_sub, n, shape=(k * max_points_per_centroid,), replace=False)
        train = jnp.take(data, sel, axis=0)

    if init == "auto":
        init = "kmeans++" if k <= 1024 else "random"
    if init == "kmeans++":
        centroids = _kmeanspp_init(rng_init, train, k, spherical)
    else:
        init_sel = jax.random.choice(rng_init, train.shape[0], shape=(k,), replace=False)
        centroids = jnp.take(train, init_sel, axis=0).astype(jnp.float32)
    if spherical:
        centroids = centroids / jnp.maximum(
            jnp.linalg.norm(centroids, axis=-1, keepdims=True), 1e-12
        )

    obj = jnp.zeros(())
    for _ in range(niter):
        centroids, obj = _lloyd_iter(train, centroids, k=k, spherical=spherical, chunk=chunk)

    assignments, _ = assign_clusters(data, centroids, spherical=spherical, chunk=chunk)
    return KMeansResult(centroids, assignments, obj)
