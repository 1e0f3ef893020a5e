"""int8 representation recall on TRAINED-encoder embeddings (round-4 VERDICT
missing #4 / round-5 task 3).

Round 4 measured the int8 index's top-80 recall vs the bf16 representation
only on worst-case iid-normal vectors (0.983-0.986); "real encoder
embeddings are friendlier" was asserted, not measured. This probe:

1. trains a small two-tower retriever (contrastive in-batch negatives, the
   reference recipe /root/reference/retrieval/train_retriever.py:198-231)
   on synthetic pairs where the query is a subsequence of its paragraph;
2. encodes 2^20 synthetic paragraphs with the TRAINED context tower (CLS ->
   128-d projection — the production embedding geometry: anisotropic,
   norm-clustered, nothing like iid normal);
3. quantizes per-block int8 (block == the search kernel's envelope block at
   this N, as DenseIndex pins it) and searches top-80 with the bf16 and the
   int8 Pallas pipelines, reporting int8-vs-bf16 recall over all queries;
4. ALSO quantizes per-ROW (block=1) and searches via the XLA blockmax path
   with row-expanded scales — the recall CEILING any per-row refinement of
   the kernel (round-4 VERDICT weak #3) could reach. If per-row ~= per-block
   on these embeddings, the sign-aware-bound kernel rework buys nothing and
   is recorded as a disproof.

Timing is interleaved in ONE process (CLAUDE.md: cross-process drift).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/int8_real_probe.py
(TINY=1 for a CPU smoke run.)
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

TINY = bool(os.environ.get("TINY"))
N = 1 << (14 if TINY else 20)     # corpus rows
Q = 256 if TINY else 2048
K = 80
D = 128
SEQ_C, SEQ_Q = 48, 12
VOCAB = 8192
TRAIN_STEPS = 2 if TINY else 300
TRAIN_BATCH = 16 if TINY else 256
ENC_BATCH = 256 if TINY else 4096
DEPTH = 8


def _make_tokens(rng: np.random.Generator, n: int, seq: int) -> np.ndarray:
    """Zipf-ish token ids (real corpora are heavy-tailed; uniform ids give
    the encoder nothing to specialize on)."""
    r = rng.pareto(1.2, (n, seq))
    ids = np.clip((r * 40).astype(np.int64), 0, VOCAB - 6) + 5
    return ids.astype(np.int32)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.retriever import encode_context, encode_query, \
        init_retriever_params
    from proqa_tpu.ops.mips import envelope_block, mips_topk_blockmax, \
        mips_topk_reference
    from proqa_tpu.ops.pallas_mips import mips_topk_pallas_v2
    from proqa_tpu.ops.quant import quantize_rows
    from proqa_tpu.train.optim import init_train_state, make_optimizer
    from proqa_tpu.train.retriever_trainer import make_train_step

    if TINY:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_prng_impl", "rbg")
    on_tpu = jax.default_backend() == "tpu"
    res: dict = {"n": N, "q": Q, "tiny": TINY}

    cfg = BertConfig(
        vocab_size=VOCAB, hidden_size=128, num_layers=4, num_heads=4,
        intermediate_size=512, max_position_embeddings=64,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        flash_attention=False,  # seq 48 < 128 falls back anyway
    )
    params = init_retriever_params(jax.random.PRNGKey(0), cfg)

    # ---- 1. contrastive training on (subsequence-query, paragraph) pairs
    rng = np.random.default_rng(0)
    tx = make_optimizer(2e-4, max_grad_norm=2.0)
    state = init_train_state(params, tx)
    step = jax.jit(make_train_step(cfg, tx), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    loss0 = loss1 = None
    for i in range(TRAIN_STEPS):
        ids_c = _make_tokens(rng, TRAIN_BATCH, SEQ_C)
        starts = rng.integers(0, SEQ_C - SEQ_Q, TRAIN_BATCH)
        ids_q = np.stack([ids_c[b, s:s + SEQ_Q] for b, s in enumerate(starts)])
        batch = {
            "input_ids_q": jnp.asarray(ids_q),
            "input_mask_q": jnp.ones((TRAIN_BATCH, SEQ_Q), jnp.int32),
            "input_ids_c": jnp.asarray(ids_c),
            "input_mask_c": jnp.ones((TRAIN_BATCH, SEQ_C), jnp.int32),
        }
        state, m = step(state, batch, jax.random.fold_in(key, i))
        if i == 0:
            loss0 = float(m["loss"])
        loss1 = float(m["loss"])
    res["train_s"] = round(time.perf_counter() - t0, 1)
    res["train_loss_first_last"] = [round(loss0, 3), round(loss1, 3)]
    params = state.params
    print(json.dumps(res), flush=True)

    # ---- 2. encode the corpus + queries with the trained towers
    enc_c = jax.jit(lambda p, i, m: encode_context(p, cfg, i, m))
    enc_q = jax.jit(lambda p, i, m: encode_query(p, cfg, i, m))
    mask_c = jnp.ones((ENC_BATCH, SEQ_C), jnp.int32)
    t0 = time.perf_counter()
    parts = []
    corpus_ids = _make_tokens(rng, N, SEQ_C)
    for s in range(0, N, ENC_BATCH):
        parts.append(enc_c(params, jnp.asarray(corpus_ids[s:s + ENC_BATCH]),
                           mask_c))
    emb = np.asarray(jnp.concatenate(parts), np.float32)   # [N, 128] f32
    del parts
    # queries = trained query tower over subsequences of random corpus rows
    # (correlated with the corpus, like real questions over real paragraphs)
    rows = rng.integers(0, N, Q)
    starts = rng.integers(0, SEQ_C - SEQ_Q, Q)
    q_ids = np.stack([corpus_ids[r, s:s + SEQ_Q] for r, s in zip(rows, starts)])
    q_emb = np.asarray(
        enc_q(params, jnp.asarray(q_ids), jnp.ones((Q, SEQ_Q), jnp.int32)),
        np.float32,
    )
    del corpus_ids
    res["encode_s"] = round(time.perf_counter() - t0, 1)
    # embedding geometry diagnostics: how far from iid normal is this?
    norms = np.linalg.norm(emb, axis=1)
    cov_eig = np.linalg.eigvalsh(np.cov(emb[:65536].T))
    res["emb_norm_p10_p50_p90"] = [round(float(v), 2) for v in
                                   np.percentile(norms, [10, 50, 90])]
    res["emb_eff_rank"] = round(float(cov_eig.sum() ** 2 / (cov_eig ** 2).sum()), 1)
    print(json.dumps(res), flush=True)

    # ---- 3. quantize + search: bf16 vs per-block int8 (the production pair)
    qb = envelope_block(N)       # what DenseIndex(dtype="int8") would pin
    res["quant_block"] = qb
    codes, scales = quantize_rows(emb, block=qb)
    codes_row, scales_row = quantize_rows(emb, block=1)
    corpus_bf16 = jax.device_put(jnp.asarray(emb, jnp.bfloat16))
    corpus_i8 = jax.device_put(jnp.asarray(codes))
    d_scales = jax.device_put(jnp.asarray(scales))
    queries = jax.device_put(jnp.asarray(q_emb, jnp.bfloat16))
    del codes

    if on_tpu:
        sub = max(4, qb // 4)
        variants = {
            "bf16": lambda: mips_topk_pallas_v2(
                queries, corpus_bf16, K, block=qb, group=128, tile_q=2048,
                sub_chunks=sub,
            ),
            "int8": lambda: mips_topk_pallas_v2(
                queries, corpus_i8, K, block=qb, group=128, tile_q=2048,
                sub_chunks=sub, scales=d_scales,
            ),
        }
    else:
        variants = {
            "bf16": lambda: mips_topk_reference(queries, corpus_bf16, K),
            "int8": lambda: mips_topk_blockmax(
                queries, corpus_i8, K,
                scales=jnp.repeat(d_scales, qb)[:N],
            ),
        }

    outs = {}
    for name, fn in variants.items():
        t0 = time.perf_counter()
        v, i = fn()
        np.asarray(i[:1])
        res[name + "_compile_s"] = round(time.perf_counter() - t0, 1)
        for _ in range(2):
            v, i = fn()
        np.asarray(i)
        outs[name] = np.asarray(i)
        print(json.dumps(res), flush=True)

    rounds = {name: [] for name in variants}
    for _ in range(3):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            for _ in range(DEPTH):
                v, i = fn()
            np.asarray(i)
            rounds[name].append((time.perf_counter() - t0) / DEPTH * 1e3)
    for name, ts in rounds.items():
        res[name + "_ms"] = round(float(np.median(ts)), 2)

    res["int8_vs_bf16_recall_trained"] = round(float(np.mean(
        [len(set(outs["int8"][r]) & set(outs["bf16"][r])) / K for r in range(Q)]
    )), 4)

    # ---- 4. per-ROW quantization ceiling (XLA path, row scales): the best
    # any per-row kernel refinement could do on these embeddings
    row_i8 = jax.device_put(jnp.asarray(codes_row))
    row_sc = jax.device_put(jnp.asarray(scales_row))
    del codes_row
    vr, ir = mips_topk_blockmax(queries, row_i8, K, scales=row_sc)
    ir = np.asarray(ir)
    res["int8_perrow_vs_bf16_recall_trained"] = round(float(np.mean(
        [len(set(ir[r]) & set(outs["bf16"][r])) / K for r in range(Q)]
    )), 4)

    print("FINAL", json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
