"""IVF (inverted-file) approximate MIPS index, TPU-native.

Equivalent of faiss.IndexIVFFlat as used by the reference QA sampler
(/root/reference/qa/online_sampler.py:75-79: nlist=100, nprobe=20, top-5000).
TPU redesign: the coarse quantizer is an on-device k-means (ops/kmeans.py);
inverted lists are realized by REORDERING the corpus cluster-contiguously and
padding every cluster to a fixed capacity, so a search is:

    centroid scores [Q, nlist] (MXU) -> top-nprobe clusters (exact_topk)
    -> gather [Q, nprobe, cap, D] slabs -> score -> exact_topk over probes.

Rows overflowing a cluster's capacity land in a dense overflow region that is
always scanned exactly, so no vector is ever silently dropped. All shapes are
static; one compile per (nprobe, k).

When to use: small query batches / very large corpora. For batched queries the
exact block-max search (ops/pallas_mips.py) amortizes the corpus read across
the whole batch and is usually faster AND exact — measure both (bench.py).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import ClassVar

import jax
import jax.numpy as jnp
import numpy as np

from proqa_tpu.ops.kmeans import assign_clusters, kmeans
from proqa_tpu.ops.mips import NEG_INF, _precision, exact_topk, mips_topk


@dataclasses.dataclass
class IVFIndex:
    centroids: jax.Array        # [nlist, D] f32
    slabs: jax.Array            # [nlist, cap, D] padded cluster-contiguous rows
    slab_rows: jax.Array        # [nlist, cap] original row id (-1 = padding)
    overflow: jax.Array         # [n_over_padded, D]
    overflow_rows: jax.Array    # [n_over_padded] original row id (-1 = padding)
    nprobe: int = 20
    # metric the quantizer was TRAINED with; probe selection must match it
    # (faiss uses one quantizer for assignment and probing alike)
    spherical: bool = True

    @property
    def nlist(self) -> int:
        return self.centroids.shape[0]

    @property
    def capacity(self) -> int:
        return self.slabs.shape[1]

    # search gathers [Qchunk, nprobe, cap, D] slabs; cap the envelope so a
    # large query batch chunks instead of silently OOMing HBM.
    # ClassVar: a tuning constant, not a dataclass field
    GATHER_BUDGET_BYTES: ClassVar[int] = 1 << 30

    def search(self, queries, k: int):
        """Returns (values [Q, k] f32, original row indices [Q, k] i32).

        Query batches whose slab-gather envelope would exceed
        GATHER_BUDGET_BYTES are processed in fixed-size chunks (the last
        chunk padded, so at most two compiled shapes per (k, nprobe))."""
        q = jnp.asarray(queries, dtype=self.slabs.dtype)
        qn = q.shape[0]
        nprobe = min(self.nprobe, self.nlist)
        per_q = nprobe * self.capacity * q.shape[1] * q.dtype.itemsize
        chunk = max(8, int(self.GATHER_BUDGET_BYTES // max(per_q, 1)) // 8 * 8)
        if qn <= chunk:
            return self._search_call(q, k)
        outs = []
        for s in range(0, qn, chunk):
            part = q[s : s + chunk]
            if part.shape[0] < chunk:
                part = jnp.pad(part, ((0, chunk - part.shape[0]), (0, 0)))
            outs.append(self._search_call(part, k))
        vals = jnp.concatenate([v for v, _ in outs])[:qn]
        idx = jnp.concatenate([i for _, i in outs])[:qn]
        return vals, idx

    def _search_call(self, q, k: int):
        return _ivf_search(
            q, self.centroids, self.slabs, self.slab_rows,
            self.overflow, self.overflow_rows, k=k, nprobe=self.nprobe,
            spherical=self.spherical,
        )


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "spherical"))
def _ivf_search(q, centroids, slabs, slab_rows, overflow, overflow_rows, *, k,
                nprobe, spherical=True):
    qn, d = q.shape
    nlist, cap, _ = slabs.shape
    nprobe = min(nprobe, nlist)

    c_scores = jnp.einsum(
        "qd,ld->ql", q.astype(jnp.float32), centroids,
        preferred_element_type=jnp.float32, precision=_precision(jnp.float32),
    )
    if not spherical:
        # L2-trained quantizer: rows were ASSIGNED by argmin ||x - c||^2
        # (== argmax x.c - |c|^2/2); probing by raw IP would use a different
        # geometry and can skip the slab a gold row actually lives in
        c_scores = c_scores - 0.5 * jnp.sum(jnp.square(centroids), axis=1)[None, :]
    _, probes = exact_topk(c_scores, nprobe)                      # [Q, nprobe]

    cand = jnp.take(slabs, probes, axis=0)                        # [Q, nprobe, cap, D]
    s = jnp.einsum(
        "qpcd,qd->qpc", cand.astype(q.dtype), q,
        preferred_element_type=jnp.float32, precision=_precision(q.dtype),
    ).reshape(qn, nprobe * cap)
    rows = jnp.take(slab_rows, probes, axis=0).reshape(qn, nprobe * cap)
    s = jnp.where(rows >= 0, s, NEG_INF)

    if overflow.shape[0] > 0:
        s_over = jnp.einsum(
            "nd,qd->qn", overflow.astype(q.dtype), q,
            preferred_element_type=jnp.float32, precision=_precision(q.dtype),
        )
        s_over = jnp.where(overflow_rows[None, :] >= 0, s_over, NEG_INF)
        s = jnp.concatenate([s, s_over], axis=1)
        rows = jnp.concatenate(
            [rows, jnp.broadcast_to(overflow_rows[None, :], s_over.shape).astype(rows.dtype)],
            axis=1,
        )

    k_eff = min(k, s.shape[1])
    vals, sel = exact_topk(s, k_eff)
    idx = jnp.take_along_axis(rows, sel, axis=1)
    # When the probed clusters + overflow hold fewer than k real rows, the
    # tail selects -1 padding slots. -1 must never escape: Python indexing
    # maps it to the LAST doc (IdMap) and jnp.take wraps it to the last row
    # unless every consumer remembers mode="clip". Match DenseIndex's
    # degenerate contract instead:
    # row 0 with a NEG_INF score, which no score-ranking consumer can pick
    # ahead of a real candidate.
    invalid = idx < 0
    idx = jnp.where(invalid, 0, idx)
    vals = jnp.where(invalid, NEG_INF, vals)
    return vals, idx.astype(jnp.int32)


def build_ivf(
    embeddings,
    *,
    nlist: int = 100,
    nprobe: int = 20,
    niter: int = 20,
    capacity_factor: float = 2.0,
    spherical: bool = True,
    seed: int = 0,
    dtype=jnp.bfloat16,
    max_points_per_centroid: int | None = 1000,
) -> IVFIndex:
    """Train the coarse quantizer and lay the corpus out cluster-contiguously.

    capacity = capacity_factor * N/nlist (rounded up to 8); overflow beyond it
    goes to the always-scanned dense region.
    """
    emb = np.asarray(embeddings, np.float32)
    n, d = emb.shape
    res = kmeans(
        jax.random.PRNGKey(seed), jnp.asarray(emb), nlist,
        niter=niter, spherical=spherical,
        max_points_per_centroid=max_points_per_centroid,
    )
    assign = np.asarray(res.assignments)

    cap = max(8, int(np.ceil(capacity_factor * n / nlist / 8)) * 8)
    # Vectorized slab fill (a Python per-row loop is minutes at 4M+ rows on a
    # 1-core host): stable cluster-major sort, then each row's slot is its
    # rank within its cluster. Rows ranked past `cap` overflow — the same
    # first-cap-rows-by-row-id selection the sequential fill made.
    order = np.argsort(assign, kind="stable")            # cluster-major, row-stable
    sorted_assign = assign[order]
    counts = np.bincount(assign, minlength=nlist)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(n, dtype=np.int64) - starts[sorted_assign]
    in_slab = pos < cap

    slabs = np.zeros((nlist * cap, d), np.float32)
    slab_rows = np.full((nlist * cap,), -1, np.int64)
    slot = sorted_assign[in_slab] * cap + pos[in_slab]
    slabs[slot] = emb[order[in_slab]]
    slab_rows[slot] = order[in_slab]
    slabs = slabs.reshape(nlist, cap, d)
    slab_rows = slab_rows.reshape(nlist, cap)

    over_sel = order[~in_slab]
    n_over = over_sel.shape[0]
    over_pad = max(8, int(np.ceil(max(n_over, 1) / 8)) * 8) if n_over else 0
    overflow = np.zeros((over_pad, d), np.float32)
    overflow_rows = np.full((over_pad,), -1, np.int64)
    if n_over:
        overflow[:n_over] = emb[over_sel]
        overflow_rows[:n_over] = over_sel

    return IVFIndex(
        centroids=jnp.asarray(res.centroids),
        slabs=jnp.asarray(slabs, dtype),
        slab_rows=jnp.asarray(slab_rows, jnp.int32),
        overflow=jnp.asarray(overflow, dtype),
        overflow_rows=jnp.asarray(overflow_rows, jnp.int32),
        nprobe=nprobe,
        spherical=spherical,
    )
