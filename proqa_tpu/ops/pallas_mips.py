"""Pallas fused scoring + block-max kernel for exact MIPS.

Why a custom kernel: the exact search needs per-block score maxima over the
whole corpus (phase 1 of ops/mips.py's block-max hierarchy). Left to XLA, the
[Q, N] score matrix materializes in HBM (4 MQ bytes — 32 GB at production
sizes, OOM + pure bandwidth waste). This kernel tiles the scoring matmul on
the MXU and reduces each corpus block's maximum IN VMEM, so HBM traffic is
just the corpus read (bf16) plus the tiny [N/block, Q] maxima output.

Layout notes (see /opt/skills/guides/pallas_guide.md):
* output is corpus-block-major [NB, Q] so each grid step writes a
  (TN/block, TQ) tile with the lane dimension = TQ >= 128 (f32 tiling);
* queries enter pre-transposed [D, TQ] so the kernel is a plain [TN,D]x[D,TQ]
  MXU matmul, f32 accumulation;
* the sublane-splitting reshape [TN, TQ] -> [TN/block, block, TQ] keeps the
  lane dim intact (Mosaic-supported), then a sublane max-reduce.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from proqa_tpu.ops.mips import (
    NEG_INF, _precision, exact_topk, rescore_block_candidates,
)


def _bmax_kernel(qt_ref, c_ref, out_ref, *, block: int, tn: int, tq: int):
    # precision pinned per-dot: a global jax_default_matmul_precision of
    # "highest" (the from-scratch-training fix, CLAUDE.md) would otherwise
    # reach this dot as an fp32 contract on bf16 operands, which Mosaic
    # rejects at compile ("Bad lhs type").
    s = jnp.dot(c_ref[:], qt_ref[:], preferred_element_type=jnp.float32,
                precision=_precision(qt_ref.dtype))  # [TN, TQ]
    out_ref[:] = jnp.max(s.reshape(tn // block, block, tq), axis=1)


@functools.partial(
    jax.jit, static_argnames=("block", "tile_n", "tile_q", "interpret")
)
def block_maxima(
    queries: jax.Array,     # [Q, D] (Q % tile_q == 0)
    corpus: jax.Array,      # [N, D] (N % tile_n == 0)
    *,
    block: int = 256,
    tile_n: int = 2048,
    tile_q: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Per-(query, corpus-block) score maxima, shape [N/block, Q] f32."""
    q, d = queries.shape
    n, d2 = corpus.shape
    assert d == d2 and n % tile_n == 0 and q % tile_q == 0 and tile_n % block == 0
    nb = n // block
    qt = queries.T  # [D, Q]

    grid = (q // tile_q, n // tile_n)
    kernel = functools.partial(_bmax_kernel, block=block, tn=tile_n, tq=tile_q)
    flops = 2 * q * n * d
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, tile_q), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_n // block, tile_q), lambda i, j: (j, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb, q), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=n * d * corpus.dtype.itemsize + nb * q * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qt, corpus)


def _bmax3_kernel(qt_ref, c_ref, b3_ref, g_ref, *, block, tq, group, sub):
    """Grid (q_tiles, CG): each step scores one whole group (group*block
    corpus rows) against a query tile and writes its block maxima [TQ, G]
    plus the group max [1, 1, TQ]. Full-block writes only — Mosaic rejects
    lane-dim dynamic slices that are not provably 128-aligned.

    sub > 1 splits the step's rows into independent dot+reduce chains so the
    scheduler can overlap one chain's VPU max-reduce with the next chain's
    MXU dot (phase ablation: the reduce is ~4.4 us/step serialized after the
    ~11 us dot — ~40% of kernel time at sub=1)."""
    _bmax3_body(qt_ref, c_ref, None, b3_ref, g_ref,
                block=block, tq=tq, group=group, sub=sub)


def _bmax3_kernel_scaled(qt_ref, c_ref, sc_ref, b3_ref, g_ref, *,
                         block, tq, group, sub):
    """int8-corpus variant: rows convert int8 -> query dtype (lossless in
    bf16: integers <= 256 are exact) and the PER-BLOCK scale (ops/quant.py)
    multiplies the block maxima AFTER the max-reduce — a per-block scale is
    constant within each reduce segment, so it commutes with the max, and
    the multiply lands on the already-transposed [TQ, G] tile against a
    dense [1, G] lane vector (a per-row scale would need a [rows, 1] operand
    whose HBM layout is lane-padded 128x — measured 34 GB of scales at 67M
    rows). Emitted maxima remain true quantized-score maxima."""
    _bmax3_body(qt_ref, c_ref, sc_ref, b3_ref, g_ref,
                block=block, tq=tq, group=group, sub=sub)


def _bmax3_kernel_bounded(qt_ref, c_ref, smax_ref, smin_ref, b3_ref, g_ref, *,
                          block, tq, group, sub):
    """PER-ROW-quantized-corpus variant: the corpus carries per-row int8
    scales (better representation than per-block: a small-norm row no longer
    loses mantissa to a large-norm block-mate), but a per-row operand cannot
    ride the kernel (see _bmax3_kernel_scaled). Instead the kernel emits a
    per-block UPPER BOUND of the row-scaled scores from two per-block lane
    vectors: for unscaled block max m, s_max*m if m >= 0 else s_min*m (both
    bound s_r*d_r for every row r: d_r <= m, and the sign of m picks which
    extreme scale maximizes). Stage 2 selects blocks by bound; stage 3
    rescores with EXACT per-row scales (mips.rescore_block_candidates
    row_scales — only kb*block candidate scales are ever gathered). Bounds
    are not achieved scores, so the block-max exactness certificate weakens
    to a heuristic; measured recall lives in tools/int8_real_probe.py."""
    _bmax3_body(qt_ref, c_ref, smax_ref, b3_ref, g_ref,
                block=block, tq=tq, group=group, sub=sub, smin_ref=smin_ref)


def _bmax3_body(qt_ref, c_ref, sc_ref, b3_ref, g_ref, *, block, tq, group, sub,
                smin_ref=None):
    outs = []
    rows = group * block
    step = rows // sub
    for i in range(sub):
        s = jnp.dot(
            c_ref[i * step : (i + 1) * step].astype(qt_ref.dtype), qt_ref[:],
            preferred_element_type=jnp.float32,
            precision=_precision(qt_ref.dtype),  # never the global default:
            # an fp32 contract on bf16 operands fails Mosaic at compile
        )                                                   # [rows/sub, TQ]
        outs.append(jnp.max(s.reshape(step // block, block, tq), axis=1))
    bm = outs[0] if sub == 1 else jnp.concatenate(outs, axis=0)  # [G, TQ]
    bmt = bm.T                                              # [TQ, G]
    if smin_ref is not None:                                # per-row bound
        bmt = jnp.where(bmt >= 0.0, bmt * sc_ref[0], bmt * smin_ref[0])
    elif sc_ref is not None:
        bmt = bmt * sc_ref[0]                               # [1, G] lane bcast
    b3_ref[0] = bmt
    g_ref[0, 0] = jnp.max(bmt, axis=1)


@functools.partial(
    jax.jit, static_argnames=("block", "group", "tile_q", "sub_chunks", "interpret")
)
def block_maxima_grouped(
    queries: jax.Array,     # [Q, D] (Q % tile_q == 0)
    corpus: jax.Array,      # [N, D] (N % (group*block) == 0)
    *,
    block: int = 32,
    group: int = 128,
    tile_q: int = 512,
    sub_chunks: int = 1,
    scales: jax.Array | None = None,   # [N/block] f32 per-BLOCK scales (int8)
    scale_bounds: tuple | None = None,  # ([N/block] s_max, [N/block] s_min)
    interpret: bool = False,
):
    """Fused scoring + two-level maxima, laid out for cheap per-query
    gathering: bmax3 [CG, Q, G] (block maxima, G consecutive blocks per
    group in the minor/lane axis) and gmax [CG, 1, Q] (per-group maxima).

    The [CG, Q, G] layout makes the select-stage gather bmax3[g, q, :] a
    contiguous-row gather (~free on TPU) instead of the strided column access
    that made the round-1 [NB, Q] layout cost ~20 ms at the headline point.

    With `scales` ([N/block] f32), the corpus is per-block int8-quantized
    (ops/quant.py: the quantization block == this kernel's reduce block) and
    the emitted maxima are of the SCALED scores scale_b(r) * (q . c_r).
    """
    q, d = queries.shape
    n, d2 = corpus.shape
    rows_per_group = group * block
    assert d == d2 and q % tile_q == 0 and n % rows_per_group == 0
    assert group % sub_chunks == 0
    cg = n // rows_per_group
    qt = queries.T

    grid = (q // tile_q, cg)
    in_specs = [
        pl.BlockSpec((d, tile_q), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (rows_per_group, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM
        ),
    ]
    operands = [qt, corpus]
    assert scales is None or scale_bounds is None
    if scale_bounds is not None:
        smax, smin = scale_bounds
        assert smax.shape == smin.shape == (n // block,)
        kernel = functools.partial(
            _bmax3_kernel_bounded, block=block, tq=tile_q, group=group,
            sub=sub_chunks,
        )
        for s in (smax, smin):
            in_specs.append(pl.BlockSpec(
                (1, 1, group), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
            ))
            operands.append(s.astype(jnp.float32).reshape(cg, 1, group))
    elif scales is None:
        kernel = functools.partial(
            _bmax3_kernel, block=block, tq=tile_q, group=group, sub=sub_chunks
        )
    else:
        assert scales.shape == (n // block,), (
            f"need per-block scales [{n // block}], got {scales.shape} — the "
            "quantization block must equal the kernel block"
        )
        kernel = functools.partial(
            _bmax3_kernel_scaled, block=block, tq=tile_q, group=group,
            sub=sub_chunks,
        )
        # [CG, 1, G] with a (1, 1, G) block: Mosaic requires the block's last
        # two dims divisible by (8, 128) OR equal to the array's — (1, G)
        # matches the array exactly for any G
        in_specs.append(pl.BlockSpec(
            (1, 1, group), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
        ))
        operands.append(scales.astype(jnp.float32).reshape(cg, 1, group))
    b3, g = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (1, tile_q, group), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, tile_q), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cg, q, group), jnp.float32),
            jax.ShapeDtypeStruct((cg, 1, q), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * d,
            bytes_accessed=n * d * corpus.dtype.itemsize + cg * q * (group + 1) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return b3, g


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block", "group", "kb", "q_chunk", "tile_q", "sub_chunks",
        "interpret", "fast_select", "rescore_impl",
    ),
)
def mips_topk_pallas_v2(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    *,
    block: int = 32,
    group: int = 128,
    kb: int | None = None,
    q_chunk: int | None = None,
    tile_q: int = 512,
    sub_chunks: int = 1,
    n_valid: int | None = None,
    scales: jax.Array | None = None,
    row_scales: jax.Array | None = None,
    interpret: bool = False,
    fast_select: bool | tuple = False,
    rescore_impl: str = "take",
):
    """Exact MIPS top-k. Three stages:

      1. kernel: block maxima bmax3 [CG, Q, G] + group maxima gmax [CG, 1, Q]
      2. select: top-kb groups from gmax.T, gather their block maxima
         (contiguous rows), top-kb blocks among kb*G candidates
      3. rescore: gather kb blocks x `block` rows, exact top-k (unchunked)

    Round-3 measurement note (tools/select_ablation.py, all 8 per-stage
    combos interleaved on v5e): swapping ANY of the three lax.top_k calls
    for the recursive narrow-width hierarchy (ops.mips.exact_topk,
    fast_select=True) changes the pipeline <1 ms — the selects are ~free in
    situ (they overlap the kernel's execution), and all-hierarchical is
    ~5 ms SLOWER. Round 2's "3 top_ks at ~7 ms each" decomposition was a
    standalone-timing artifact of the tunnel's dispatch floor. Flat
    lax.top_k stays the default; `fast_select` remains for ablation.

    Exactness: hierarchical upper-bound argument at each level — any group /
    block whose max exceeds the true k-th score contains a top-k row, so at
    most k of them exist and top-kb (kb >= k) selection visits them all; ties
    can swap equal-valued results only (see ops/mips.exact_topk docstring).

    scales: per-BLOCK f32 [ceil(N/block)] for an int8-quantized corpus
    (ops/quant.py, quantization block == this `block`) — results are then
    exact w.r.t. the scaled quantized scores.

    row_scales: per-ROW f32 [N] alternative (quant_block=1 — the best int8
    representation). Stages 1-2 then select blocks by a sign-aware per-block
    UPPER BOUND (see _bmax3_kernel_bounded) and stage 3 rescores with the
    exact per-row scales — selection is heuristic (a bound is not an achieved
    score), with recall measured in tools/int8_real_probe.py; widen `kb`
    to tighten. Mutually exclusive with `scales`.
    """
    q, d = queries.shape
    n0 = corpus.shape[0]
    if n_valid is None:
        n_valid = n0
    rows_per_group = group * block
    pad = (-n0) % rows_per_group
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    n = corpus.shape[0]
    assert scales is None or row_scales is None
    if scales is not None and scales.shape[0] < n // block:
        scales = jnp.pad(scales, ((0, n // block - scales.shape[0]),),
                         constant_values=1.0)
    if row_scales is not None and row_scales.shape[0] < n:
        row_scales = jnp.pad(row_scales, ((0, n - row_scales.shape[0]),),
                             constant_values=1.0)
    nb = n // block
    cg = n // rows_per_group
    if kb is None:
        kb = k
    kb_g = min(kb, cg)          # groups to visit
    kb_b = min(kb, nb)          # blocks to visit
    assert kb_g >= min(k, cg) and kb_b >= min(k, nb)

    scale_bounds = None
    if row_scales is not None:
        rs_blocked = row_scales.astype(jnp.float32).reshape(nb, block)
        scale_bounds = (rs_blocked.max(axis=1), rs_blocked.min(axis=1))
    bmax3, gmax = block_maxima_grouped(
        queries, corpus, block=block, group=group, tile_q=tile_q,
        sub_chunks=sub_chunks, scales=scales, scale_bounds=scale_bounds,
        interpret=interpret,
    )

    static_aligned = isinstance(n_valid, int) and n_valid == n
    if not static_aligned:
        # mask blocks that lie entirely past n_valid; rescore the straddler
        block_ids = (
            jnp.arange(cg, dtype=jnp.int32)[:, None, None] * group
            + jnp.arange(group, dtype=jnp.int32)[None, None, :]
        )                                                   # [CG, 1, G]
        bmax3 = jnp.where(block_ids * block >= n_valid, NEG_INF, bmax3)
        if not (isinstance(n_valid, int) and n_valid % block == 0):
            sb = jnp.minimum(jnp.asarray(n_valid, jnp.int32) // block, nb - 1)
            blk = jax.lax.dynamic_slice_in_dim(corpus, sb * block, block, axis=0)
            s = jnp.einsum(
                "bd,qd->qb", blk.astype(queries.dtype), queries,
                preferred_element_type=jnp.float32,
                precision=_precision(queries.dtype),
            )                                               # [Q, block]
            if scales is not None:
                s = s * jax.lax.dynamic_slice_in_dim(scales, sb, 1, axis=0)
            elif row_scales is not None:
                s = s * jax.lax.dynamic_slice_in_dim(
                    row_scales, sb * block, block
                )[None, :]
            row_valid = (sb * block + jnp.arange(block)) < n_valid
            patched = jnp.max(
                jnp.where(row_valid[None, :], s, NEG_INF), axis=1
            )                                               # [Q]
            bmax3 = jax.lax.dynamic_update_slice(
                bmax3, patched[None, :, None], (sb // group, 0, sb % group)
            )
        gmax = jnp.max(bmax3, axis=-1)[:, None, :]          # recompute masked

    if not isinstance(fast_select, tuple):
        fast_select = (fast_select,) * 3                    # per-stage ablation
    _sels = [exact_topk if f else jax.lax.top_k for f in fast_select]
    _, top_groups = _sels[0](gmax.reshape(cg, q).T, kb_g)   # [Q, kb_g]
    top_groups = top_groups.astype(jnp.int32)

    # block refine: contiguous-row gather of each query's candidate groups
    q_iota = jnp.arange(q, dtype=jnp.int32)[:, None]
    cand = bmax3[top_groups, q_iota]                        # [Q, kb_g, G]
    _, sel = _sels[1](cand.reshape(q, kb_g * group), kb_b)
    gsel = jnp.take_along_axis(top_groups, sel // group, axis=1)
    top_blocks = gsel * group + sel % group                 # [Q, kb_b]

    # rescore: exact top-k among the kb_b * block candidate rows
    corpus_blocks = corpus.reshape(nb, block, d)

    def chunk_topk(args):
        q_emb, blocks_ids = args
        return rescore_block_candidates(
            q_emb, blocks_ids, corpus_blocks, k=k, block=block,
            n_valid=n_valid, select_fn=_sels[2], impl=rescore_impl,
            block_scales=scales, row_scales=row_scales, interpret=interpret,
        )

    if q_chunk is None or q <= q_chunk:
        return chunk_topk((queries, top_blocks))
    assert q % q_chunk == 0
    qr = queries.reshape(q // q_chunk, q_chunk, d)
    br = top_blocks.reshape(q // q_chunk, q_chunk, kb_b)
    vals, idx = jax.lax.map(chunk_topk, (qr, br))
    return vals.reshape(q, k), idx.reshape(q, k)


@functools.partial(
    jax.jit,
    static_argnames=("k", "block", "kb", "q_chunk", "tile_n", "tile_q", "interpret"),
)
def mips_topk_pallas(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    *,
    block: int = 256,
    kb: int = 128,
    q_chunk: int = 256,
    tile_n: int = 2048,
    tile_q: int = 256,
    n_valid: int | None = None,
    interpret: bool = False,
):
    """Exact MIPS top-k: fused phase-1 kernel + exact phase-2 rescoring of
    each query's top-kb blocks (same guarantee as ops.mips.mips_topk_blockmax;
    see its docstring for the exactness argument).

    Requires Q % tile_q == 0 (pad queries) and kb >= k.
    """
    from proqa_tpu.ops.mips import _precision

    q, d = queries.shape
    n0 = corpus.shape[0]
    if n_valid is None:
        n_valid = n0
    pad = (-n0) % tile_n
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    n = corpus.shape[0]
    nb = n // block
    kb = min(kb, nb)
    assert kb >= min(k, nb)

    bmax = block_maxima(
        queries, corpus, block=block, tile_n=tile_n, tile_q=tile_q, interpret=interpret
    )                                                     # [NB, Q]
    # blocks entirely past n_valid can never contain results
    full_pad_block = (jnp.arange(nb) * block) >= n_valid
    bmax = jnp.where(full_pad_block[:, None], NEG_INF, bmax)
    # The block STRADDLING n_valid still has pad rows (score 0) inside its
    # max; with negative true scores that inflated max can evict the block
    # holding a real top-k row. Recompute that one block's maxima with pads
    # masked (one cheap [Q, block] rescore). Statically skippable only when
    # the valid/pad boundary is block-aligned.
    if not (isinstance(n_valid, int) and n_valid % block == 0):
        from proqa_tpu.ops.mips import _precision

        sb = jnp.minimum(jnp.asarray(n_valid, jnp.int32) // block, nb - 1)
        blk = jax.lax.dynamic_slice_in_dim(corpus, sb * block, block, axis=0)
        s = jnp.einsum(
            "bd,qd->bq", blk.astype(queries.dtype), queries,
            preferred_element_type=jnp.float32, precision=_precision(queries.dtype),
        )                                                 # [block, Q]
        row_valid = (sb * block + jnp.arange(block)) < n_valid
        s = jnp.where(row_valid[:, None], s, NEG_INF)
        bmax = jax.lax.dynamic_update_slice(bmax, jnp.max(s, axis=0)[None, :], (sb, 0))

    _, top_blocks = exact_topk(bmax.T, kb)                # [Q, kb]
    top_blocks = top_blocks.astype(jnp.int32)

    corpus_blocks = corpus.reshape(nb, block, d)

    def chunk_topk(args):
        q_emb, blocks_ids = args
        cand = jnp.take(corpus_blocks, blocks_ids, axis=0)       # [QC, kb, B, D]
        s = jnp.einsum(
            "qkbd,qd->qkb", cand.astype(q_emb.dtype), q_emb,
            preferred_element_type=jnp.float32, precision=_precision(q_emb.dtype),
        ).reshape(q_emb.shape[0], kb * block)
        base = (blocks_ids * block)[:, :, None] + jnp.arange(block)[None, None, :]
        flat_idx = base.reshape(q_emb.shape[0], kb * block)
        s = jnp.where(flat_idx < n_valid, s, NEG_INF)
        vals, sel = exact_topk(s, k)
        idx = jnp.take_along_axis(flat_idx, sel, axis=1)
        return vals, idx.astype(jnp.int32)

    if q <= q_chunk:
        return chunk_topk((queries, top_blocks))
    assert q % q_chunk == 0
    qr = queries.reshape(q // q_chunk, q_chunk, d)
    br = top_blocks.reshape(q // q_chunk, q_chunk, kb)
    vals, idx = jax.lax.map(chunk_topk, (qr, br))
    return vals.reshape(q, k), idx.reshape(q, k)
