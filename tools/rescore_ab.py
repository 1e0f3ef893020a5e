"""Round-4 rescore A/B (VERDICT r3 task #2): the phase-2 gather+rescore is
~10 ms of the ~32 ms exact-MIPS pipeline at the headline point. Candidates:

  base        jnp.take + einsum (current rescore_block_candidates)
  sorted      same, candidate block ids sorted ascending per query first
              (DRAM row-buffer locality; top-k is order-invariant)
  msum        gather + multiply+sum instead of einsum (a reduce the XLA
              fusion pass can sink the gather into, skipping the [Q,kb,B,D]
              materialization the dot_general path forces)
  sorted_msum both
  qchunk      base at q_chunk=256 (smaller materialized gather)

All variants run INTERLEAVED in one process (CLAUDE.md: cross-process
timings drift 40%+), amortized over back-to-back dispatches, medians of 3
interleaved rounds. kernel+select (no rescore) pins the phase split.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/rescore_ab.py
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np

N, D, Q, K = 4_194_304, 128, 2048, 80
BLOCK, GROUP, TILE_Q, SUB = 16, 128, 2048, 4
DEPTH = 8


def main():
    import jax
    import jax.numpy as jnp

    from proqa_tpu.ops.mips import NEG_INF, _precision
    from proqa_tpu.ops.pallas_mips import block_maxima_grouped, mips_topk_pallas_v2

    rng = np.random.default_rng(0)
    xb = rng.standard_normal((N, D), dtype=np.float32)
    corpus = jax.device_put(jnp.asarray(xb, jnp.bfloat16))
    del xb
    queries = jax.device_put(jnp.asarray(
        rng.standard_normal((Q, D), dtype=np.float32), jnp.bfloat16
    ))

    def select_blocks(queries, corpus, block, group, tile_q, sub):
        """Phases 1+2 of v2: kernel + two selects -> [Q, K] block ids."""
        b3, g = block_maxima_grouped(
            queries, corpus, block=block, group=group, tile_q=tile_q,
            sub_chunks=sub,
        )
        cg = b3.shape[0]
        _, tg = jax.lax.top_k(g.reshape(cg, Q).T, K)
        tg = tg.astype(jnp.int32)
        q_iota = jnp.arange(Q, dtype=jnp.int32)[:, None]
        cand = b3[tg, q_iota]
        _, sel = jax.lax.top_k(cand.reshape(Q, K * group), K)
        gsel = jnp.take_along_axis(tg, sel // group, axis=1)
        return gsel * group + sel % group                   # [Q, K]

    def rescore_einsum(q_emb, blocks_ids, corpus_blocks, block):
        cand = jnp.take(corpus_blocks, blocks_ids, axis=0)
        s = jnp.einsum(
            "qkbd,qd->qkb", cand.astype(q_emb.dtype), q_emb,
            preferred_element_type=jnp.float32, precision=_precision(q_emb.dtype),
        ).reshape(q_emb.shape[0], -1)
        return s

    def rescore_msum(q_emb, blocks_ids, corpus_blocks, block):
        cand = jnp.take(corpus_blocks, blocks_ids, axis=0)   # [Q, kb, B, D]
        prod = cand.astype(jnp.float32) * q_emb.astype(jnp.float32)[:, None, None, :]
        return prod.sum(-1).reshape(q_emb.shape[0], -1)

    def rescore_dma(q_emb, blocks_ids, corpus_blocks, block):
        from proqa_tpu.ops.pallas_rescore import gather_rescore

        return gather_rescore(q_emb, corpus_blocks, blocks_ids, block=block)

    def full(queries, corpus, *, sort_ids, rescore, block=BLOCK, group=GROUP):
        top_blocks = select_blocks(queries, corpus, block, group, TILE_Q, SUB)
        if sort_ids:
            top_blocks = jnp.sort(top_blocks, axis=1)
        nb = corpus.shape[0] // block
        corpus_blocks = corpus.reshape(nb, block, D)
        s = rescore(queries, top_blocks, corpus_blocks, block)
        base = (top_blocks * block)[:, :, None] + jnp.arange(block)[None, None, :]
        flat_idx = base.reshape(Q, -1)
        vals, sel = jax.lax.top_k(s, K)
        idx = jnp.take_along_axis(flat_idx, sel, axis=1)
        return vals, idx

    variants = {
        "ksel_only": jax.jit(functools.partial(
            select_blocks, block=BLOCK, group=GROUP, tile_q=TILE_Q, sub=SUB)),
        "full_base": jax.jit(functools.partial(
            full, sort_ids=False, rescore=rescore_einsum)),
        "full_sorted": jax.jit(functools.partial(
            full, sort_ids=True, rescore=rescore_einsum)),
        "full_msum": jax.jit(functools.partial(
            full, sort_ids=False, rescore=rescore_msum)),
        "full_sorted_msum": jax.jit(functools.partial(
            full, sort_ids=True, rescore=rescore_msum)),
        "full_dma": jax.jit(functools.partial(
            full, sort_ids=False, rescore=rescore_dma)),
        "full_sorted_dma": jax.jit(functools.partial(
            full, sort_ids=True, rescore=rescore_dma)),
        "full_v2_dispatch": lambda q_, c_: mips_topk_pallas_v2(
            q_, c_, K, block=BLOCK, group=GROUP, tile_q=TILE_Q, sub_chunks=SUB),
        "full_v2_qchunk256": lambda q_, c_: mips_topk_pallas_v2(
            q_, c_, K, block=BLOCK, group=GROUP, tile_q=TILE_Q, sub_chunks=SUB,
            q_chunk=256),
    }

    res = {}
    # compile + one throwaway amortized round each (first loop reads high)
    for name, fn in variants.items():
        t0 = time.perf_counter()
        try:
            out = fn(queries, corpus)
            np.asarray(jax.tree.leaves(out)[-1][:1])
            for _ in range(4):
                out = fn(queries, corpus)
            np.asarray(jax.tree.leaves(out)[-1])
            res[name + "_compile_s"] = round(time.perf_counter() - t0, 1)
        except Exception as e:
            res[name] = f"{type(e).__name__}: {e}"[:140]
            variants[name] = None
        print(json.dumps(res), flush=True)

    rounds = {name: [] for name in variants}
    for _ in range(3):
        for name, fn in variants.items():
            if fn is None:
                continue
            t0 = time.perf_counter()
            for _ in range(DEPTH):
                out = fn(queries, corpus)
            np.asarray(jax.tree.leaves(out)[-1])
            rounds[name].append((time.perf_counter() - t0) / DEPTH * 1e3)
    for name, ts in rounds.items():
        if ts:
            res[name] = round(float(np.median(ts)), 2)
            res[name + "_all"] = [round(t, 1) for t in ts]
    print(json.dumps(res), flush=True)

    # correctness spot-check of the sorted variant vs the dispatcher
    v1, i1 = variants["full_v2_dispatch"](queries, corpus)
    v2, i2 = variants["full_sorted_msum"](queries, corpus)
    res["sorted_msum_matches"] = bool(
        np.array_equal(np.asarray(v1), np.asarray(v2))
        and np.array_equal(np.asarray(i1), np.asarray(i2))
    )
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
