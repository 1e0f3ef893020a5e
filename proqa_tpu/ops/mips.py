"""Exact maximum-inner-product search (MIPS) top-k on TPU.

Replaces FAISS `IndexFlatIP.search` (/root/reference/retrieval/eval_retrieval.py:102-104,
/root/reference/qa/online_sampler.py:75-79) with device-resident search. The
corpus lives in HBM as a [N, D] bf16 matrix; queries are scored on the MXU.

Design (measured on v5e, see bench.py):
* The scoring matmul runs at speed-of-light through XLA — no custom kernel
  needed there. XLA also fuses row-block max-reductions into the dot's
  epilogue, so block maxima come out at matmul cost without materializing the
  [Q, N] score matrix.
* XLA's exact `lax.top_k` is O(seconds) at [Q, millions] and is the real
  bottleneck; `lax.approx_max_k` (TPU PartialReduce) is fast at ~0.998 recall.
* We therefore select exactly via a two-phase block-max hierarchy:
    phase 1: block maxima bmax[Q, N/B] fused into the scoring matmul;
    phase 2: visit each query's top `kb >= k` blocks (gather + small matmul)
             and take the exact top-k among those candidates.
  Exactness: if row r is among the true top-k, its block's max >= score(r)
  >= v_k (k-th best). Any block ranked above r's block has max > score(r) and
  so contributes at least one element >= score(r); with kb >= k, r's block is
  always visited (ties can swap equal-valued results, never lose recall).

`mips_topk` picks the strategy from (k, N); all variants return
(values [Q, k] f32, indices [Q, k] i32) sorted descending.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalar, NOT jnp: a module-level jnp constant allocates a device
# buffer at import, forcing backend init before callers can pick a platform
# (and hanging every import when the tunneled TPU is unreachable)
NEG_INF = np.float32(-3.0e38)  # also finite in bf16


def _precision(dtype) -> jax.lax.Precision:
    # f32 inputs: force true-f32 scoring so rankings are reproducible across
    # backends (TPU DEFAULT would silently drop to bf16 passes). bf16 corpus
    # (the production layout) keeps the fast path.
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def _scores(queries: jax.Array, corpus: jax.Array) -> jax.Array:
    return jnp.einsum(
        "qd,nd->qn", queries, corpus.astype(queries.dtype),
        preferred_element_type=jnp.float32, precision=_precision(queries.dtype),
    )


def _pad_rows(corpus: jax.Array, multiple: int) -> tuple[jax.Array, int]:
    n = corpus.shape[0]
    n_pad = (-n) % multiple
    if n_pad:
        corpus = jnp.pad(corpus, ((0, n_pad), (0, 0)))
    return corpus, n


def _mask_padding(scores: jax.Array, n_valid) -> jax.Array:
    """Mask trailing padded rows. n_valid may be a static int or a traced
    scalar (the sharded search passes per-shard valid counts derived from
    axis_index)."""
    n = scores.shape[-1]
    if isinstance(n_valid, int) and n_valid >= n:
        return scores
    valid = jnp.arange(n) < n_valid
    return jnp.where(valid[None, :], scores, NEG_INF)


def exact_topk(scores: jax.Array, k: int, *, group: int | None = None,
               direct_width: int = 1024):
    """Exact top-k along the last axis via a recursive group-max hierarchy:
    group maxima -> (recursively) top-k groups -> top-k within the selected
    groups' elements. Every individual lax.top_k call stays narrow.

    Why (measured IN-PIPELINE on v5e, tools/topk_cost_model.py — standalone
    micro-benches are floored by the tunnel's fixed dispatch cost and
    misled round 2's "~7 ms flat" model): indexed lax.top_k marginal cost at
    Q=2048 is ~0 ms up to width 512, 0.4 ms @ 1024, 0.9 ms @ 2048, then
    cliffs to 7.6 ms @ 5120 (VMEM tiling limit; values-only costs the SAME,
    so the round-2 "the indices are the cost" theory is dead). Max-reductions
    and row gathers are ~free, so recursing with a small group keeps every
    sort under the cliff: [Q, 131072] resolves as widths 2048->256->640->...

    Exactness (each level): any row r in the true top-k has its group's max
    >= score(r) >= v_k; any group ranked above r's group has max > score(r),
    hence holds an element >= score(r); at most k such groups exist, so r's
    group is among the top-k groups (ties can swap equal values only).

    scores: [..., C]; returns (values [..., k], indices [..., k] int32).
    """
    c = scores.shape[-1]
    if group is None:
        group = 8
    # direct when narrow enough, or when grouping cannot shrink the problem
    # (c <= group*k: top-k groups already cover everything — also the
    # recursion terminator: the gathered-candidates width is exactly group*k)
    if c <= max(4 * k, direct_width) or c <= group * k:
        vals, idx = jax.lax.top_k(scores, k)
        return vals, idx.astype(jnp.int32)
    pad = (-c) % group
    if pad:
        scores = jnp.pad(scores, [(0, 0)] * (scores.ndim - 1) + [(0, pad)],
                         constant_values=NEG_INF)
    cg = scores.shape[-1] // group
    lead = scores.shape[:-1]
    grouped = scores.reshape(*lead, cg, group)
    gmax = jnp.max(grouped, axis=-1)                       # [..., CG]
    _, top_groups = exact_topk(                            # recursive: narrow
        gmax, min(k, cg), group=group, direct_width=direct_width
    )
    top_groups = top_groups.astype(jnp.int32)
    cand = jnp.take_along_axis(grouped, top_groups[..., None], axis=-2)
    cand = cand.reshape(*lead, -1)                         # [..., k*group]
    vals, sel = exact_topk(cand, k, group=group, direct_width=direct_width)
    base = top_groups * group                              # [..., k]
    idx = jnp.take_along_axis(
        (base[..., None] + jnp.arange(group)).reshape(*lead, -1),
        sel.astype(jnp.int32), axis=-1,
    )
    return vals, idx.astype(jnp.int32)


def rescore_block_candidates(
    q_emb: jax.Array, blocks_ids: jax.Array, corpus_blocks: jax.Array, *,
    k: int, block: int, n_valid, select_fn=None, impl: str = "take",
    block_scales: jax.Array | None = None,
    row_scales: jax.Array | None = None, interpret: bool = False,
):
    """Phase-2 exact rescore shared by the XLA block-max path and the Pallas
    pipeline (ONE home for the gather/score/pad-mask/select semantics so a
    fix cannot silently miss one copy).

    q_emb [QC, D]; blocks_ids [QC, kb] candidate block ids; corpus_blocks
    [NB, block, D]. Returns (values [QC, k] f32, row indices [QC, k] i32).

    impl: "take" = XLA gather + einsum (materializes [QC, kb, B, D] in HBM);
    "stream" = Pallas DMA-streaming scorer (ops/pallas_rescore.py — no
    materialized gather; requires 128 % block == 0, kb % (128//block) == 0,
    QC % 8 == 0, TPU backend).

    block_scales: per-block f32 [NB] for an int8 corpus (ops/quant.py) —
    candidate scores are multiplied by their block's scale before selection.
    row_scales: per-row f32 [NB*block] alternative (block=1 quantization,
    used by the XLA fallback paths whose search block is unrelated to the
    quantization granularity).
    """
    if select_fn is None:
        select_fn = exact_topk
    qc, kb = q_emb.shape[0], blocks_ids.shape[1]
    assert block_scales is None or row_scales is None
    if impl == "stream":
        assert block_scales is None and row_scales is None, (
            "stream rescore does not support int8"
        )
        from proqa_tpu.ops.pallas_rescore import gather_rescore

        s = gather_rescore(
            q_emb, corpus_blocks, blocks_ids, block=block, interpret=interpret
        )
    else:
        cand = jnp.take(corpus_blocks, blocks_ids, axis=0)   # [QC, kb, B, D]
        s = jnp.einsum(
            "qkbd,qd->qkb", cand.astype(q_emb.dtype), q_emb,
            preferred_element_type=jnp.float32, precision=_precision(q_emb.dtype),
        ).reshape(qc, kb * block)
    if block_scales is not None:
        sc = jnp.take(block_scales, blocks_ids, axis=0)      # [QC, kb]
        s = (s.reshape(qc, kb, block) * sc[:, :, None]).reshape(qc, kb * block)
    elif row_scales is not None:
        nb = corpus_blocks.shape[0]
        sc = jnp.take(row_scales.reshape(nb, block), blocks_ids, axis=0)
        s = s * sc.reshape(qc, kb * block)
    base = (blocks_ids * block)[:, :, None] + jnp.arange(block)[None, None, :]
    flat_idx = base.reshape(qc, kb * block)
    s = jnp.where(flat_idx < n_valid, s, NEG_INF)
    vals, sel = select_fn(s, k)
    idx = jnp.take_along_axis(flat_idx, sel, axis=1)
    return vals, idx.astype(jnp.int32)


def sanitize_padding(vals: jax.Array, idx: jax.Array):
    """Degenerate-tail contract: slots whose score is the padding sentinel
    (masked pre-padded rows, k > real rows) come back as (NEG_INF, row 0) —
    never a padded row's index, which IdMap lookups would map to a wrong or
    out-of-range document. Real inner products can't reach NEG_INF."""
    invalid = vals <= jnp.float32(NEG_INF)
    return jnp.where(invalid, NEG_INF, vals), jnp.where(invalid, 0, idx)


def mips_topk_reference(queries: jax.Array, corpus: jax.Array, k: int, *,
                        n_valid: int | None = None,
                        scales: jax.Array | None = None):
    """Naive full-score top-k. Ground truth for tests; fine for small N.
    n_valid: true row count when the corpus is pre-padded (padded rows are
    never returned: k > n_valid tails follow the (NEG_INF, row 0) degenerate
    contract). scales: per-row f32 for an int8 corpus (ops/quant.py)."""
    scores = _scores(queries, corpus)
    if scales is not None:
        scores = scores * scales[None, :]
    if n_valid is not None:
        scores = _mask_padding(scores, n_valid)
        vals, idx = jax.lax.top_k(scores, k)
        vals, idx = sanitize_padding(vals, idx)
    else:
        vals, idx = jax.lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("k", "block", "kb", "q_chunk", "exact_blocks")
)
def mips_topk_blockmax(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    *,
    block: int = 256,
    kb: int | None = None,
    q_chunk: int = 256,
    exact_blocks: bool = True,
    n_valid: int | None = None,
    scales: jax.Array | None = None,
):
    """Exact two-phase block-max MIPS top-k (the default search path).

    block:        rows per block (B); bmax has N/B columns.
    kb:           blocks visited per query in phase 2 (>= k for exactness).
    q_chunk:      queries per phase-2 chunk (bounds the gather working set).
    exact_blocks: select top-kb blocks with exact lax.top_k over [Q, N/B]
                  (guaranteed); False uses approx_max_k (faster at large N/B,
                  recall ~0.998 at the block level).
    scales:       per-row f32 [N] for an int8 corpus (ops/quant.py).
    """
    q, d = queries.shape
    corpus, n_unpadded = _pad_rows(corpus, block)
    if n_valid is None:
        n_valid = n_unpadded
    n = corpus.shape[0]
    if scales is not None and scales.shape[0] < n:
        scales = jnp.pad(scales, ((0, n - scales.shape[0]),), constant_values=1.0)
    nb = n // block
    if kb is None:
        kb = max(k, min(128, nb))
    kb = min(kb, nb)
    assert kb >= min(k, nb), "kb < k breaks the exactness guarantee"

    # ---- phase 1: block maxima, fused into the scoring matmul ----
    scores = _scores(queries, corpus)              # [Q, N] (not materialized:
    if scales is not None:                         #  reduced in the epilogue)
        scores = scores * scales[None, :]
    scores = _mask_padding(scores, n_valid)
    bmax = jnp.max(scores.reshape(q, nb, block), axis=-1)

    if exact_blocks:
        _, top_blocks = exact_topk(bmax, kb)       # [Q, kb]
    else:
        _, top_blocks = jax.lax.approx_max_k(bmax, kb)
        top_blocks = top_blocks.astype(jnp.int32)
    top_blocks = top_blocks.astype(jnp.int32)

    # ---- phase 2: exact top-k within each query's candidate blocks ----
    corpus_blocks = corpus.reshape(nb, block, d)

    def chunk_topk(args):
        q_emb, blocks_ids = args                   # [QC, D], [QC, kb]
        return rescore_block_candidates(
            q_emb, blocks_ids, corpus_blocks, k=k, block=block,
            n_valid=n_valid, row_scales=scales,
        )

    if q <= q_chunk:
        return chunk_topk((queries, top_blocks))
    assert q % q_chunk == 0, f"Q={q} must be a multiple of q_chunk={q_chunk}"
    qr = queries.reshape(q // q_chunk, q_chunk, d)
    br = top_blocks.reshape(q // q_chunk, q_chunk, kb)
    vals, idx = jax.lax.map(chunk_topk, (qr, br))
    return vals.reshape(q, k), idx.reshape(q, k)


@functools.partial(jax.jit, static_argnames=("k", "chunk", "recall_target"))
def mips_topk_chunked_approx(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    *,
    chunk: int = 1 << 19,
    recall_target: float = 0.99,
    n_valid: int | None = None,
    scales: jax.Array | None = None,
):
    """Streaming approximate top-k for large k (e.g. the QA trainer's top-5000
    candidate retrieval, reference qa/online_sampler.py:113 — which itself uses
    IVF nprobe=20, i.e. far lower recall than this).

    Scans corpus chunks; per chunk `approx_max_k` collects candidates, ONE
    exact hierarchical top-k merges them at the end (a per-chunk running
    merge paid a [Q, 2k]-wide indexed top_k EVERY chunk — at k=5000 that is
    8 sorts past the ~5k-width VMEM cliff; measured 196 ms at [32, 4.2M]).
    Memory: O(Q * (chunk + nchunk*k)); never materializes [Q, N].
    scales: per-row f32 [N] for an int8 corpus, applied per chunk.
    """
    q, d = queries.shape
    # don't pad small corpora up to a huge chunk
    chunk = min(chunk, 1 << max(corpus.shape[0] - 1, 1).bit_length())
    corpus, n_unpadded = _pad_rows(corpus, chunk)
    if n_valid is None:
        n_valid = n_unpadded
    n = corpus.shape[0]
    if scales is not None and scales.shape[0] < n:
        scales = jnp.pad(scales, ((0, n - scales.shape[0]),), constant_values=1.0)
    nchunk = n // chunk
    corpus_chunks = corpus.reshape(nchunk, chunk, d)
    scale_chunks = (jnp.zeros((nchunk, 0), jnp.float32) if scales is None
                    else scales.astype(jnp.float32).reshape(nchunk, chunk))
    k_local = min(k, chunk)

    def body(_, inp):
        blk, sc, off = inp
        s = _scores(queries, blk)
        if scales is not None:
            s = s * sc[None, :]
        s = jnp.where((off + jnp.arange(chunk))[None, :] < n_valid, s, NEG_INF)
        v, i = jax.lax.approx_max_k(s, k_local, recall_target=recall_target)
        return None, (v, i.astype(jnp.int32) + off)

    offs = (jnp.arange(nchunk, dtype=jnp.int32)) * chunk
    _, (cv, ci) = jax.lax.scan(body, None, (corpus_chunks, scale_chunks, offs))
    cv = jnp.moveaxis(cv, 0, 1).reshape(q, nchunk * k_local)
    ci = jnp.moveaxis(ci, 0, 1).reshape(q, nchunk * k_local)
    if cv.shape[1] < k:  # degenerate small-corpus call: keep k output cols
        pad = k - cv.shape[1]
        cv = jnp.pad(cv, ((0, 0), (0, pad)), constant_values=NEG_INF)
        ci = jnp.pad(ci, ((0, 0), (0, pad)))
    vals, sel = exact_topk(cv, k)
    idx = jnp.take_along_axis(ci, sel.astype(jnp.int32), axis=1)
    return vals, idx


def envelope_block(n: int, qp: int = 2048) -> int:
    """Stage-1 reduce-block size for the Pallas kernel at corpus size n:
    block=16 halves the rescore gather, but bmax3 is N/block * Qpad * 4 B —
    grow block until it fits ~4.5 GB of HBM alongside the index. Shared by
    the search dispatcher and DenseIndex's int8 quantization (whose block
    must EQUAL the kernel block; quantization happens at build time, so it
    pins qp at the worst-case padded query count)."""
    block = 16
    while block < 256 and (n / block) * qp * 4 > 4.5e9:
        block *= 2
    return block


def mips_topk(
    queries: jax.Array, corpus: jax.Array, k: int, *,
    exact: bool = True, n_valid: int | None = None,
    scales: jax.Array | None = None, quant_block: int = 1, **kw,
):
    """Dispatch to the right search strategy for (k, N).

    exact top-k is supported up to k<=512: on TPU with MXU-aligned shapes the
    fused Pallas kernel (ops/pallas_mips.py) runs phase 1; otherwise the XLA
    block-max path. Larger k (QA top-5000) uses the streaming approx path
    (recall >= ~0.99, cf. the reference's IVF nprobe=20) — requesting
    exact=True with k > 512 warns, since the flag cannot be honored. n_valid
    masks pre-padded corpus rows; it may be a traced scalar (per-shard counts
    in the sharded search).

    scales: f32 [ceil(N/quant_block)] for an int8-quantized corpus
    (ops/quant.py) — results are exact w.r.t. the scaled quantized scores.
    The fused kernel requires quant_block == envelope_block(N) (DenseIndex
    pins this at build); other granularities fall back to the XLA path with
    row-expanded scales.
    """
    n = corpus.shape[0]

    # int8 kernel path guard: DenseIndex pins quant_block at build with
    # envelope_block(n, qp=2048). A query batch padding past 2048 would grow
    # the envelope beyond quant_block and silently drop to the XLA fallback
    # with row-expanded scales (268 MB HBM at 67M rows — likely OOM at the
    # capacity point the int8 index exists for). envelope_block is monotonic
    # in qp, so chunking to <=2048 queries keeps quant_block >= block and the
    # kernel path always holds.
    if (exact and k <= 512 and scales is not None and queries.shape[0] > 2048
            and n > 4096 and n > 4 * k):
        parts = [
            mips_topk(queries[s:s + 2048], corpus, k, exact=True,
                      n_valid=n_valid, scales=scales, quant_block=quant_block,
                      **kw)
            for s in range(0, queries.shape[0], 2048)
        ]
        return (jnp.concatenate([v for v, _ in parts]),
                jnp.concatenate([i for _, i in parts]))

    def row_scales():
        # lazy: only the XLA fallback paths score per row (the Pallas branch
        # consumes the per-block array directly — expanding 67M f32 scales
        # there would waste 268 MB of HBM)
        if scales is None:
            return None
        from proqa_tpu.ops.quant import expand_scales

        rs = expand_scales(scales, quant_block, n)
        if rs.shape[0] < n:
            rs = jnp.pad(rs, ((0, n - rs.shape[0]),), constant_values=1.0)
        return rs

    if exact and k > 512 and n > 4096 and n > 4 * k:
        import warnings

        warnings.warn(
            f"mips_topk(exact=True, k={k}): exact search supports k<=512; "
            "falling back to the streaming approx path (recall ~0.99). "
            "Pass exact=False to silence.",
            stacklevel=2,
        )
    # naive path only while a full [Q, N] top_k is cheap (XLA TopK degrades
    # fast: ~56ms at [2048, 65536] on v5e)
    if n <= 4096 or n <= 4 * k:
        return mips_topk_reference(
            queries, corpus, min(k, n), n_valid=n_valid, scales=row_scales()
        )
    if exact and k <= 512:
        q = queries.shape[0]
        d = queries.shape[1]
        use_pallas = (
            jax.default_backend() == "tpu" and d % 128 == 0 and not kw
        )
        if use_pallas:
            from proqa_tpu.ops.pallas_mips import mips_topk_pallas_v2

            # round-3 tuning (tools/kernel_tile_sweep.py, mips_final_sweep.py,
            # sub-chunk sweep on v5e at 4.2M x 128): tile_q=2048 amortizes
            # per-grid-step overhead (-3 ms), block=16 halves the rescore
            # gather, sub_chunks=4 overlaps the VPU max-reduce with the next
            # MXU dot (-1.5 ms) -> 38.4 (round 2) -> ~32 ms amortized
            tile_q = min(2048, max(256, 1 << (q - 1).bit_length()))
            q_pad = (-q) % tile_q
            if q_pad:
                queries = jnp.pad(queries, ((0, q_pad), (0, 0)))
            qp = queries.shape[0]
            # block=16 halves the rescore gather but doubles bmax3
            # (N/block * Qpad * 4 bytes); grow block until bmax3 fits ~4.5 GB
            # group is PINNED at 128: bmax3's [CG, Q, G] output has G on the
            # lane axis, and G < 128 lane-pads the whole buffer in HBM
            # (measured: G=16 inflated 4.3 GB of maxima to 34 GB -> OOM).
            # sub_chunks scales with block to keep each dot+reduce chain at
            # ~512 rows (the round-3-tuned chunk at block=16).
            block = envelope_block(n, qp)
            if scales is not None:
                # the kernel must reduce at the quantization granularity;
                # any quant_block >= the envelope minimum is memory-safe
                # (larger block shrinks bmax3)
                if (quant_block >= block and quant_block <= 256
                        and quant_block % 16 == 0):
                    vals, idx = mips_topk_pallas_v2(
                        queries, corpus, k, block=quant_block, group=128,
                        tile_q=tile_q, sub_chunks=max(4, quant_block // 4),
                        n_valid=n_valid, scales=scales,
                    )
                else:
                    # quantization granularity doesn't match the kernel's
                    # reduce block at this (n, qp) — XLA fallback
                    vals, idx = mips_topk_blockmax(
                        queries, corpus, k, n_valid=n_valid,
                        scales=row_scales(),
                    )
                    vals, idx = vals[:q], idx[:q]
                    if n_valid is not None:
                        vals, idx = sanitize_padding(vals, idx)
                    return vals, idx
            else:
                vals, idx = mips_topk_pallas_v2(
                    queries, corpus, k, block=block, group=128,
                    tile_q=tile_q, sub_chunks=max(4, block // 4),
                    n_valid=n_valid,
                )
            vals, idx = vals[:q], idx[:q]
            if n_valid is not None:
                vals, idx = sanitize_padding(vals, idx)
            return vals, idx
        vals, idx = mips_topk_blockmax(
            queries, corpus, k, n_valid=n_valid, scales=row_scales(), **kw
        )
    else:
        vals, idx = mips_topk_chunked_approx(
            queries, corpus, k, n_valid=n_valid, scales=row_scales(), **kw
        )
    if n_valid is not None:
        vals, idx = sanitize_padding(vals, idx)
    return vals, idx


def pad_queries(queries: jax.Array, multiple: int) -> tuple[jax.Array, int]:
    """Pad the query batch to a multiple (for fixed-shape jit); returns
    (padded, original_count)."""
    qn = queries.shape[0]
    pad = (-qn) % multiple
    if pad:
        queries = jnp.pad(queries, ((0, pad), (0, 0)))
    return queries, qn
