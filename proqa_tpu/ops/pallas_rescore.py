"""Pallas DMA-streaming candidate rescorer (exact-MIPS phase 2).

STATUS — measured on v5e, round 4, and it LOSES: full pipeline 40.5 ms
(stream) vs 33.7 ms (XLA take+einsum) amortized at the headline point
(4.2M x 128, Q=2048, kb=80, block=16; /tmp-logged by tools/rescore ab run,
recorded in ROADMAP.md). The XLA rescore's whole margin over kernel+select
is only ~5.6 ms (tools/rescore_ab.py: 34.1 vs 28.4), and this kernel's
random-access pattern — kb/cpb grid steps x 64 sequential 4 KiB DMAs — pays
more in per-DMA latency than the materialized [Q, kb, B, D] gather costs in
bandwidth. Kept as a working, tested reference for DMA-streaming gathers
(and for corpora whose slabs are long enough to amortize the DMA setup);
`rescore_impl="take"` stays the dispatch default.

The idea: the XLA rescore (ops/mips.py:rescore_block_candidates)
materializes the gathered candidate slabs as a [Q, kb, block, D] HBM
intermediate and re-reads it for scoring. This kernel streams the slabs
instead: candidate block ids arrive via scalar prefetch, the kernel manually
DMAs the candidate blocks HBM->VMEM double-buffered, and scores them in
VMEM — HBM traffic is one random read of the slabs plus the [Q, kb*block]
score output, with no materialized gather.

Mosaic constraints that shaped this (v5e, jax 0.9 — each earlier variant
failed remote compile):
* matrix.vector dots are rejected ("rhs must be vector-like [B, K]") — the
  per-query dot is [1, D] x [chunk, D]^T with a STATIC [1, D] lhs slice;
* value dynamic_slice and dynamic stores with unprovable alignment are
  rejected — so the query tile lives in the grid, the per-tile query index
  is a static python unroll, and every ref load/store in the body is fully
  static; the only dynamic index is the DMA source block id, which manual
  `make_async_copy` supports;
* block shapes need sublane >= 8, so queries are tiled qb=8 per grid step;
* structurally SMALL (3 refs, one scratch): the abandoned
  ops/pallas_gather_score.py with 16 corpus refs + per-ref index maps hit
  pathological remote-compile times.

Double buffering: scratch persists across grid steps; step t waits the
copies started at step t-1 and starts step t+1's (the first step starts its
own). Grid iteration on TPU is sequential, so each step's HBM fetch hides
behind the previous step's compute.

Parity citation: phase-2 of the exact search replacing FAISS IndexFlatIP
(/root/reference/retrieval/eval_retrieval.py:102-104).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from proqa_tpu.ops.mips import _precision

_QB = 8  # queries per grid step (min sublane tile)


def _kernel(ids_ref, q_ref, hbm_ref, out_ref, cand, sems, *,
            cpq: int, block: int, cpb: int, n_steps: int):
    qi = pl.program_id(0)
    cj = pl.program_id(1)
    t = qi * cpq + cj
    total = n_steps * cpq

    def step_dma(slot, tt, ql, b):
        # tt-th step = (query tile tt//cpq, chunk tt%cpq); query-lane ql,
        # b-th block of its chunk
        bid = ids_ref[(tt // cpq) * _QB + ql, (tt % cpq) * cpb + b]
        return pltpu.make_async_copy(
            hbm_ref.at[bid], cand.at[slot, ql, b], sems.at[slot, ql, b]
        )

    def start_step(slot, tt):
        for ql in range(_QB):       # static unroll: _QB*cpb DMA starts
            for b in range(cpb):
                step_dma(slot, tt, ql, b).start()

    @pl.when(t == 0)
    def _():
        start_step(0, 0)

    slot = jax.lax.rem(t, 2)

    @pl.when(t + 1 < total)
    def _():
        start_step(jax.lax.rem(t + 1, 2), t + 1)

    for ql in range(_QB):
        for b in range(cpb):
            step_dma(slot, t, ql, b).wait()

    d = q_ref.shape[-1]
    for ql in range(_QB):           # static: per-query chunk score
        rows = cand[slot, ql].reshape(cpb * block, d)        # [128, D]
        s = jax.lax.dot_general(
            q_ref[ql:ql + 1], rows,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(q_ref.dtype),  # pin: global "highest"
            # makes bf16 dots fp32 contracts, which Mosaic rejects
        )                                                    # [1, 128]
        out_ref[ql, :] = s[0]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def gather_rescore(
    queries: jax.Array,          # [Q, D]
    corpus_blocked: jax.Array,   # [NB, block, D]
    block_ids: jax.Array,        # [Q, kb] int32
    *,
    block: int,
    interpret: bool = False,
) -> jax.Array:
    """Scores of every row of each query's candidate blocks, streamed.

    Returns [Q, kb*block] f32 with out[q, j*block + b] =
    corpus_blocked[block_ids[q, j], b] . queries[q].
    Requires Q % 8 == 0, 128 % block == 0 and kb % (128//block) == 0.
    """
    q, d = queries.shape
    nb, blk, d2 = corpus_blocked.shape
    kb = block_ids.shape[1]
    assert blk == block and d2 == d and q % _QB == 0
    assert 128 % block == 0, "compute chunk must assemble to 128 lanes"
    cpb = 128 // block
    assert kb % cpb == 0, f"kb={kb} must be a multiple of {cpb}"

    # The scalar-prefetch ids operand lives in SMEM lane-padded to 128:
    # Q * 128 * 4 B. SMEM is 1 MiB on v5e, so Q > ~2000 overflows AT COMPILE
    # (measured: Q=2048/kb=16 dies "Ran out of memory in memory space smem,
    # 1.00M of 1.00M"; Q<=1024 compiles). Chunk queries into separate
    # pallas_calls — scoped SMEM frees between calls, and back-to-back grid
    # launches cost nothing vs the HBM-bound gather itself.
    if q > _MAX_Q:
        parts = [
            _gather_rescore_1(
                queries[s:s + _MAX_Q], corpus_blocked,
                block_ids[s:s + _MAX_Q], block=block, interpret=interpret,
            )
            for s in range(0, q, _MAX_Q)
        ]
        return jnp.concatenate(parts, axis=0)
    return _gather_rescore_1(
        queries, corpus_blocked, block_ids, block=block, interpret=interpret
    )


_MAX_Q = 1024  # per-call SMEM budget: 1024 * 128 lanes * 4 B = 512 KiB


def _gather_rescore_1(
    queries: jax.Array,
    corpus_blocked: jax.Array,
    block_ids: jax.Array,
    *,
    block: int,
    interpret: bool = False,
) -> jax.Array:
    q, d = queries.shape
    nb, blk, d2 = corpus_blocked.shape
    kb = block_ids.shape[1]
    cpb = 128 // block
    cpq = kb // cpb
    n_steps = q // _QB

    grid = (n_steps, cpq)
    kernel = functools.partial(
        _kernel, cpq=cpq, block=block, cpb=cpb, n_steps=n_steps
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_QB, d), lambda qi, cj, ids: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),       # corpus stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (_QB, cpb * block), lambda qi, cj, ids: (qi, cj),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, _QB, cpb, block, d), corpus_blocked.dtype),
            pltpu.SemaphoreType.DMA((2, _QB, cpb)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q, kb * block), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * kb * block * d,
            bytes_accessed=(
                q * kb * block * d * corpus_blocked.dtype.itemsize
                + q * kb * block * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(block_ids, queries, corpus_blocked)
