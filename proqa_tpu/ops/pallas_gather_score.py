"""Pallas streaming candidate-block scorer (MIPS phase 2).

XLA's gather of each query's top-kb candidate blocks materializes a
[Q, kb, block, D] intermediate and re-reads it for scoring (~15ms of the
exact-search budget at Q=2048). This kernel streams the blocks instead:
block ids arrive via scalar prefetch, the pipeline DMAs each (block, D) slab
HBM->VMEM double-buffered, and scores are reduced in VMEM — HBM traffic is
exactly one read of the candidate slabs plus the small score output.

Grid: (Q/QB, kb/JB); each step handles QB queries x JB candidate blocks via
QB*JB input refs over the same blocked corpus with per-ref index maps (a
Pallas idiom for data-dependent multi-gather). Per candidate block an NT
matmul scores all QB queries (MXU is free here — the kernel is DMA-bound)
and the owning query's row is written lane-major.

STATUS: experimental — correct (interpreter-tested), but the scalar-prefetch
multi-ref program currently hits pathological remote-compile times on this
toolchain, so the default exact search keeps the XLA gather for phase 2
(~16 ms on-device at Q=2048, kb=80, block=64).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from proqa_tpu.ops.mips import _precision

_NT = (((1,), (1,)), ((), ()))  # contract last dims: [QB,D] x [block,D] -> [QB,block]


def _kernel(ids_ref, q_ref, *refs, qb: int, jb: int, block: int):
    out_ref = refs[-1]
    c_refs = refs[:-1]
    q = q_ref[:]                                   # [QB, D]
    for jj in range(jb):
        for qi in range(qb):
            c = c_refs[jj * qb + qi][0]            # [block, D]
            s = jax.lax.dot_general(
                q, c, _NT, preferred_element_type=jnp.float32,
                precision=_precision(q.dtype),  # pin: global "highest"
                # makes bf16 dots fp32 contracts, which Mosaic rejects
            )                                      # [QB, block]
            out_ref[qi, pl.ds(jj * block, block)] = s[qi, :]


@functools.partial(
    jax.jit, static_argnames=("block", "qb", "jb", "interpret")
)
def gather_score(
    queries: jax.Array,      # [Q, D]
    corpus_blocked: jax.Array,  # [NB, block, D]
    block_ids: jax.Array,    # [Q, kb] int32
    *,
    block: int,
    qb: int = 8,
    jb: int = 2,
    interpret: bool = False,
) -> jax.Array:
    """Scores of every row of each query's candidate blocks.

    Returns [Q, kb*block] f32 where out[q, j*block+b] =
    corpus[block_ids[q, j]*block + b] . queries[q].
    Requires Q % qb == 0 and kb % jb == 0.
    """
    q, d = queries.shape
    nb, blk, d2 = corpus_blocked.shape
    kb = block_ids.shape[1]
    assert blk == block and d2 == d
    assert q % qb == 0 and kb % jb == 0
    assert (jb * block) % 128 == 0, "output tile lane dim must be 128-aligned"

    grid = (q // qb, kb // jb)

    def make_index_map(qi, jj):
        return lambda i, j, ids: (ids[i * qb + qi, j * jb + jj], 0, 0)

    c_specs = [
        pl.BlockSpec((1, block, d), make_index_map(qi, jj), memory_space=pltpu.VMEM)
        for jj in range(jb)
        for qi in range(qb)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qb, d), lambda i, j, ids: (i, 0), memory_space=pltpu.VMEM),
            *c_specs,
        ],
        out_specs=pl.BlockSpec(
            (qb, jb * block), lambda i, j, ids: (i, j), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(_kernel, qb=qb, jb=jb, block=block),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q, kb * block), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * kb * block * d,
            bytes_accessed=q * kb * block * d * corpus_blocked.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(block_ids, queries, *([corpus_blocked] * (qb * jb)))
