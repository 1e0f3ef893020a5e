"""Corpus-sharded MIPS: each chip searches its HBM shard, candidates merge
over ICI.

Scaling design (SURVEY.md §5.7-5.8): the corpus embedding matrix [N, D] is
row-sharded across the mesh; every chip runs the local exact block-max search
(ops/mips.py) over its [N/n, D] shard, then the tiny [Q, k] candidate lists
are all-gathered over ICI and reduced to the global top-k. Communication is
O(Q * k * n_devices) — negligible next to the local scoring.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from proqa_tpu.ops.mips import NEG_INF, mips_topk, sanitize_padding
from proqa_tpu.parallel.mesh import DATA_AXIS


def sharded_mips_topk(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    mesh: Mesh,
    *,
    exact: bool = True,
    n_valid: int | None = None,
    scales: jax.Array | None = None,
    quant_block: int = 1,
    **search_kw,
):
    """Global top-k over a row-sharded corpus.

    queries: [Q, D] (replicated); corpus: [N, D] sharded P('data', None).
    Returns replicated (values [Q, k], indices [Q, k]) with global row ids.
    N must divide evenly by the mesh size (pad the corpus at build time);
    n_valid masks trailing padded rows by their GLOBAL index.
    scales: [N/quant_block] f32 for an int8 corpus (ops/quant.py), sharded
    with the rows (each shard's row count must divide by quant_block).
    """
    n_dev = mesh.shape[DATA_AXIS]
    n = corpus.shape[0]
    assert n % n_dev == 0, f"corpus rows {n} not divisible by mesh size {n_dev}"
    local_n = n // n_dev

    # a shard can hold fewer rows than k (large k over many chips): each
    # chip contributes its whole shard and the merge finds the global top-k
    k_local = min(k, local_n)

    def local_search(q, c_local, *rest):
        sc_local = rest[0] if rest else None
        offset = jax.lax.axis_index(DATA_AXIS).astype(jnp.int32) * local_n
        if n_valid is not None and n_valid < n:
            # Mask padded rows BEFORE the local top-k: zero-vector pads score
            # exactly 0 and would otherwise win local slots over genuine
            # negative-score rows, evicting true candidates on the padded
            # shard. Per-shard valid count is traced from axis_index.
            local_valid = jnp.clip(jnp.int32(n_valid) - offset, 0, local_n)
            vals, idx = mips_topk(
                q, c_local, k_local, exact=exact, n_valid=local_valid,
                scales=sc_local, quant_block=quant_block, **search_kw
            )
        else:
            vals, idx = mips_topk(q, c_local, k_local, exact=exact,
                                  scales=sc_local, quant_block=quant_block,
                                  **search_kw)
        idx = idx + offset
        if n_valid is not None and n_valid < n:
            vals = jnp.where(idx < n_valid, vals, jnp.float32(NEG_INF))
        if k_local < k:
            # pad local lists to k columns so the ICI merge keeps a static
            # [Q, n_dev*k] shape; padded slots carry the index-wide
            # degenerate contract (row 0, NEG_INF) and lose the merge to
            # any real candidate
            vals = jnp.pad(vals, ((0, 0), (0, k - k_local)),
                           constant_values=float(NEG_INF))
            idx = jnp.pad(idx, ((0, 0), (0, k - k_local)))
        # [n_dev, Q, k] on every chip
        all_vals = jax.lax.all_gather(vals, DATA_AXIS)
        all_idx = jax.lax.all_gather(idx, DATA_AXIS)
        q_n = q.shape[0]
        cat_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(q_n, n_dev * k)
        cat_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(q_n, n_dev * k)
        mv, sel = jax.lax.top_k(cat_vals, k)
        mi = jnp.take_along_axis(cat_idx, sel, axis=1)
        # re-assert the (NEG_INF, row 0) degenerate contract after the merge:
        # a fully-padded shard's sanitized local row 0 became `offset` above —
        # a PADDED global id that IdMap would map out of range
        return sanitize_padding(mv, mi)

    in_specs = (P(), P(DATA_AXIS, None))
    operands = (queries, corpus)
    if scales is not None:
        assert scales.shape == (n // quant_block,)
        assert local_n % quant_block == 0, (
            f"shard rows {local_n} not divisible by quant_block {quant_block}"
        )
        in_specs += (P(DATA_AXIS),)
        operands += (scales,)
    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(*operands)


def sharded_matvec_stats(corpus: jax.Array, mesh: Mesh):
    """Cheap sanity op: per-shard row-count and norm sum (debug/telemetry)."""

    def local(c):
        return (
            jax.lax.psum(jnp.asarray(c.shape[0], jnp.int32), DATA_AXIS),
            jax.lax.psum(jnp.sum(jnp.square(c.astype(jnp.float32))), DATA_AXIS),
        )

    fn = shard_map(
        local, mesh=mesh, in_specs=(P(DATA_AXIS, None),), out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(corpus)
