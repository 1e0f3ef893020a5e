"""Finer decomposition of the exact-MIPS block-select + phase-2 costs.

mips_decomp.py showed (amortized, v5e): phase1 ~12.6 ms (at SOL),
block-select ~19.5 ms, phase-2 ~25.6 ms. This script breaks those two down
to locate the actual bottleneck (transpose? lax.top_k? gather? einsum?).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/select_decomp.py
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np


def amortized_ms(fn, *args, depth: int = 8) -> float:
    import jax

    out = fn(*args)  # compile
    for leaf in jax.tree.leaves(out):
        leaf.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(depth):
        out = fn(*args)
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf[:1])
        leaf.block_until_ready()
    return round((time.perf_counter() - t0) / depth * 1e3, 2)


def main():
    import jax
    import jax.numpy as jnp

    from proqa_tpu.ops.mips import exact_topk
    from proqa_tpu.ops.pallas_mips import block_maxima

    N, D, Q, K, BLOCK, KB = 4_194_304, 128, 2048, 80, 64, 80
    NB = N // BLOCK          # 65536
    GROUP = 32               # exact_topk's auto group at this size
    CG = NB // GROUP         # 2048

    rng = np.random.default_rng(0)
    corpus = jax.device_put(
        jnp.asarray(rng.standard_normal((N, D)).astype(np.float32), jnp.bfloat16)
    )
    queries = jax.device_put(
        jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32), jnp.bfloat16)
    )

    class Res(dict):  # print incrementally: partial results survive crashes
        def __setitem__(self, k, v):
            super().__setitem__(k, v)
            print(f"{k}: {v}", flush=True)

    res = Res()

    bmax = block_maxima(queries, corpus, block=BLOCK, tile_n=2048, tile_q=512)
    bmax = jnp.asarray(bmax)                       # [NB, Q] f32, materialized
    bmax_t = jnp.asarray(bmax.T)                   # [Q, NB]

    # --- select sub-steps ---
    res["transpose_bmax"] = amortized_ms(jax.jit(lambda b: b.T + 0.0), bmax)
    res["gmax_on_T"] = amortized_ms(
        jax.jit(lambda b: jnp.max(b.reshape(Q, CG, GROUP), axis=-1)), bmax_t
    )
    # group-reduce in the native [NB, Q] layout (no transpose)
    res["gmax_native"] = amortized_ms(
        jax.jit(lambda b: jnp.max(b.reshape(CG, GROUP, Q), axis=1)), bmax
    )
    gmax = jnp.asarray(jnp.max(bmax_t.reshape(Q, CG, GROUP), axis=-1))  # [Q, CG]
    res["topk_gmax_2048x2048_k80"] = amortized_ms(
        jax.jit(lambda g: jax.lax.top_k(g, KB)), gmax
    )
    _, top_groups = jax.lax.top_k(gmax, KB)
    top_groups = jnp.asarray(top_groups.astype(jnp.int32))
    grouped_t = bmax_t.reshape(Q, CG, GROUP)

    def gather_cand(gt, tg):
        return jnp.take_along_axis(gt, tg[..., None], axis=-2).reshape(Q, KB * GROUP)

    res["gather_cand_2048x2560"] = amortized_ms(jax.jit(gather_cand), grouped_t, top_groups)
    cand = jnp.asarray(gather_cand(grouped_t, top_groups))
    res["topk_cand_2048x2560_k80"] = amortized_ms(
        jax.jit(lambda c: jax.lax.top_k(c, K)), cand
    )
    res["exact_topk_fused(select)"] = amortized_ms(
        jax.jit(lambda b: exact_topk(b.T, KB)), bmax
    )

    # --- phase-2 sub-steps (one q-chunk of 512) ---
    QC = 512
    corpus_blocks = corpus.reshape(NB, BLOCK, D)
    _, tb_full = exact_topk(bmax_t, KB)
    tb = jnp.asarray(tb_full[:QC].astype(jnp.int32))      # [QC, KB]
    qc = jnp.asarray(queries[:QC])

    # NB: corpus must be an ARGUMENT — a closure would bake the 1 GB array
    # into the compile payload (the axon remote-compile rejects it, HTTP 413)
    res["p2_gather_512"] = amortized_ms(
        jax.jit(lambda cb, ids: jnp.take(cb, ids, axis=0)), corpus_blocks, tb
    )
    cand_blocks = jnp.asarray(jnp.take(corpus_blocks, tb, axis=0))  # [QC,KB,B,D]

    def p2_score(cb, q_emb):
        return jnp.einsum(
            "qkbd,qd->qkb", cb, q_emb, preferred_element_type=jnp.float32
        ).reshape(QC, KB * BLOCK)

    res["p2_einsum_512"] = amortized_ms(jax.jit(p2_score), cand_blocks, qc)
    s = jnp.asarray(p2_score(cand_blocks, qc))            # [QC, 5120]
    res["p2_topk_512x5120_k80"] = amortized_ms(
        jax.jit(functools.partial(exact_topk, k=K)), s
    )
    res["p2_laxtopk_512x5120_k80"] = amortized_ms(
        jax.jit(lambda x: jax.lax.top_k(x, K)), s
    )

    # a dot-general formulation of the rescore: scores via [QC*KB, B, D] x
    # batched... vs matmul against a [D, QC] replicated — compare einsum orders
    def p2_score_mm(cb, q_emb):
        # [QC, KB*B, D] @ [QC, D, 1]
        return jax.lax.batch_matmul(
            cb.reshape(QC, KB * BLOCK, D), q_emb[:, :, None],
            preferred_element_type=jnp.float32,
        )[..., 0]

    res["p2_batchmm_512"] = amortized_ms(jax.jit(p2_score_mm), cand_blocks, qc)

    res["null"] = amortized_ms(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
