"""Probe the redesigned MIPS select/phase-2 pipeline with fused jits BEFORE
kernel surgery. Isolated per-op timings through the axon tunnel proved
untrustworthy (tools/select_decomp.py); only full-pipeline-segment jits with
amortized timing are comparable.

Pipeline v2 under test (block=B rows, groups of G blocks):
  phase 1 (kernel, simulated here in XLA): bmax3 [CG, Q, G] + gmax [CG, Q]
  select A: top-kb groups per query from gmax.T           (topk over CG cols)
  select B: gather bmax3[g, q, :] rows -> [Q, kb, G];
            refine to top-kb blocks                        (topk over kb*G)
  phase 2: gather kb blocks x B rows, rescore, exact top-k

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/mips_v2_probe.py
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np

N, D, Q, K = 4_194_304, 128, 2048, 80


def _force(out):
    """block_until_ready alone LIES through the axon tunnel (see CLAUDE.md);
    a tiny device->host transfer forces true completion."""
    import jax

    for leaf in jax.tree.leaves(out):
        np.asarray(leaf[:1])
        leaf.block_until_ready()


def amortized_ms(fn, *args, depth: int = 8) -> float:
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(depth):
        out = fn(*args)
    _force(out)
    return round((time.perf_counter() - t0) / depth * 1e3, 2)


def main():
    import jax
    import jax.numpy as jnp

    from proqa_tpu.ops.mips import NEG_INF, exact_topk

    rng = np.random.default_rng(0)
    corpus = jax.device_put(
        jnp.asarray(rng.standard_normal((N, D)).astype(np.float32), jnp.bfloat16)
    )
    queries = jax.device_put(
        jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32), jnp.bfloat16)
    )

    results = {}

    for block, group in [(64, 128), (32, 128)]:
        nb = N // block
        cg = nb // (group)
        kb = K

        # ---- simulate the v2 phase-1 outputs (NOT timed) ----
        @jax.jit
        def make_bmax3(corpus, queries):
            s = jnp.einsum(
                "nd,qd->qn", corpus.astype(queries.dtype), queries,
                preferred_element_type=jnp.float32,
            )                                         # [Q, N] (big; one-off)
            bm = jnp.max(s.reshape(Q, nb, block), axis=-1)   # [Q, NB]
            bmax3 = bm.reshape(Q, cg, group).transpose(1, 0, 2)  # [CG, Q, G]
            gmax = jnp.max(bmax3, axis=-1).T          # -> [CG, Q] after .T? no:
            return bmax3, jnp.max(bmax3, axis=-1)     # gmax [CG, Q]

        # chunk to avoid the [Q, N] materialization: do it in 8 query slices
        bmax3_parts, gmax_parts = [], []
        for i in range(8):
            qs = queries[i * (Q // 8):(i + 1) * (Q // 8)]

            @jax.jit
            def mk(corpus, qs):
                s = jnp.einsum(
                    "nd,qd->qn", corpus.astype(qs.dtype), qs,
                    preferred_element_type=jnp.float32,
                )
                bm = jnp.max(s.reshape(qs.shape[0], nb, block), axis=-1)
                b3 = bm.reshape(qs.shape[0], cg, group).transpose(1, 0, 2)
                return b3, jnp.max(b3, axis=-1)

            b3, gm = mk(corpus, qs)
            bmax3_parts.append(b3)
            gmax_parts.append(gm)
        bmax3 = jnp.concatenate(bmax3_parts, axis=1)  # [CG, Q, G]
        gmax = jnp.concatenate(gmax_parts, axis=1)    # [CG, Q]
        bmax3.block_until_ready()
        del bmax3_parts, gmax_parts

        # ---- select v2 (timed as ONE jit) ----
        @jax.jit
        def select_v2(bmax3, gmax):
            _, tg = jax.lax.top_k(gmax.T, kb)             # [Q, kb] groups
            tg = tg.astype(jnp.int32)
            q_iota = jnp.arange(Q, dtype=jnp.int32)[:, None]
            cand = bmax3[tg, q_iota]                      # [Q, kb, G]
            vals, sel = exact_topk(cand.reshape(Q, kb * group), K)
            gsel = jnp.take_along_axis(tg, sel // group, axis=1)
            top_blocks = gsel * group + sel % group       # block ids [Q, K]
            return vals, top_blocks

        t = amortized_ms(select_v2, bmax3, gmax)
        results[f"select_v2_b{block}_g{group}"] = t

        # same but refine with plain lax.top_k
        @jax.jit
        def select_v2_lax(bmax3, gmax):
            _, tg = jax.lax.top_k(gmax.T, kb)
            tg = tg.astype(jnp.int32)
            q_iota = jnp.arange(Q, dtype=jnp.int32)[:, None]
            cand = bmax3[tg, q_iota]
            vals, sel = jax.lax.top_k(cand.reshape(Q, kb * group), K)
            gsel = jnp.take_along_axis(tg, sel // group, axis=1)
            return vals, gsel * group + sel % group

        results[f"select_v2lax_b{block}_g{group}"] = amortized_ms(
            select_v2_lax, bmax3, gmax
        )

        _, top_blocks = select_v2(bmax3, gmax)
        top_blocks = jnp.asarray(top_blocks.astype(jnp.int32))  # [Q, K]
        del bmax3, gmax

        # ---- phase 2 (timed as ONE jit over all chunks) ----
        q_chunk = 512

        @jax.jit
        def phase2(corpus, queries, top_blocks):
            corpus_blocks = corpus.reshape(nb, block, D)

            def chunk_topk(a):
                q_emb, ids = a
                cand = jnp.take(corpus_blocks, ids, axis=0)
                s = jnp.einsum(
                    "qkbd,qd->qkb", cand, q_emb, preferred_element_type=jnp.float32
                ).reshape(q_emb.shape[0], K * block)
                base = (ids * block)[:, :, None] + jnp.arange(block)[None, None, :]
                flat = base.reshape(q_emb.shape[0], K * block)
                vals, sel = jax.lax.top_k(s, K)
                return vals, jnp.take_along_axis(flat, sel, axis=1)

            qr = queries.reshape(Q // q_chunk, q_chunk, D)
            br = top_blocks.reshape(Q // q_chunk, q_chunk, K)
            vals, idx = jax.lax.map(chunk_topk, (qr, br))
            return vals.reshape(Q, K), idx.reshape(Q, K)

        results[f"phase2_b{block}"] = amortized_ms(phase2, corpus, queries, top_blocks)

        # correctness spot check vs reference on 64 queries
        from proqa_tpu.ops.mips import mips_topk_reference

        vals, idx = phase2(corpus, queries, top_blocks)
        rv, ri = mips_topk_reference(queries[:64], corpus, K)
        got, want = np.asarray(idx[:64]), np.asarray(ri)
        overlap = np.mean([len(set(got[i]) & set(want[i])) / K for i in range(64)])
        results[f"recall_b{block}"] = round(float(overlap), 4)
        print(json.dumps(results), flush=True)

    print("FINAL", json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
