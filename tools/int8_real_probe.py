"""int8 representation recall on TRAINED-ENCODER embeddings (round-5 VERDICT
task 3): round 4 measured the per-block int8 index's 0.983-0.986 top-80
recall on worst-case iid-normal data and ASSERTED "real encoder embeddings
are friendlier" — this probe turns that into a number, at >=1M rows.

It also A/Bs two representation refinements against the production per-block
scheme, interleaved in ONE process (CLAUDE.md: cross-process drift 40%+):

  bf16         production bf16 index (the recall ground truth)
  int8_block   per-block scales, exact selection (production int8 scheme)
  int8_sorted  per-block scales over rows PRE-SORTED by per-row absmax —
               block-mates then share similar scales, recovering most of the
               per-row representation at ZERO kernel/search cost (the sort is
               a build-time permutation; results map back through it)
  int8_row     per-ROW scales + sign-aware per-block bound selection
               (_bmax3_kernel_bounded) at kb = k / 4k / 16k — the VERDICT-
               sketched refinement; CPU-scale data says bound selection
               scrambles tightly-packed block maxima (recall 0.22-0.36 at
               kb=k), so this is expected to be the recorded disproof

World: 1,048,576 synthetic paragraphs (20 words, 2000-word vocab) encoded by
a 4L/256 retriever contrastively trained IN THIS PROCESS for 2000 steps in
true f32 (snippet->paragraph pairs; see the collapse notes below) — real
encoder geometry, no external data (HF_HUB_OFFLINE; no released checkpoints
in the image). Alongside recall vs the production bf16 index, it computes
the f32-truth CONTROL (bf16 is itself an 8-bit-mantissa representation —
int8's loss is only meaningful relative to what bf16 already loses on the
same geometry) and a tie-tolerant score-mass metric.

Run: cd /root/repo && python tools/int8_real_probe.py
CPU smoke: TINY=1 python tools/int8_real_probe.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 80
DEPTH = 6


def main() -> None:
    import jax
    import jax.numpy as jnp

    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.retriever import init_retriever_params
    from proqa_tpu.ops.pallas_mips import mips_topk_pallas_v2
    from proqa_tpu.ops.quant import quantize_rows
    from proqa_tpu.text.wordpiece import BertTokenizer
    from proqa_tpu.train.optim import init_train_state, make_optimizer
    from proqa_tpu.train.retriever_trainer import make_train_step

    tiny = bool(os.environ.get("TINY"))
    if tiny:
        # env vars are too late under the axon sitecustomize (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_prng_impl", "rbg")
    # TPU matmuls default to fast (bf16-input) MXU passes even for f32
    # operands — from-scratch contrastive training collapses there exactly
    # like the bf16 runs (content signal at init is below the mantissa),
    # while true-f32 CPU learns. Pin full precision for this probe's small
    # encoder; production finetunes start from pretrained weights and keep
    # the fast path.
    jax.config.update("jax_default_matmul_precision", "highest")
    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu
    n = 8192 if tiny else 1_048_576
    q_n = 256 if tiny else 2048
    steps = 10 if tiny else 2000
    res: dict = {"n": n, "queries": q_n, "backend": jax.default_backend()}

    def emit():
        print(json.dumps(res), flush=True)

    # Crash insurance for the expensive stages: ~18 min of f32 training +
    # ~70 s of encode on the tunneled chip (round-5 run 1 lost both to a
    # Mosaic compile failure in the SEARCH stage). Cache the trained-encoder
    # embeddings; a rerun skips straight to quantize/search.
    cache = os.environ.get("EMB_CACHE", "" if tiny else "/tmp/int8_real_cache.npz")
    cached = None
    if cache and os.path.exists(cache):
        z = np.load(cache)
        if z["emb"].shape == (n, 128) and z["qf32"].shape == (q_n, 128):
            cached = (np.ascontiguousarray(z["emb"]),
                      np.ascontiguousarray(z["qf32"]))
            res["emb_cache"] = cache

    if cached is not None:
        emb, qf32 = cached
        emit()
    else:
        # ---- synthetic text world (numpy-vectorized: 1M python joins only) ----
        t0 = time.monotonic()
        rng = np.random.default_rng(0)
        words = np.array([f"tok{i}" for i in range(2000)])
        import tempfile
        root = tempfile.mkdtemp(prefix="int8_real_")
        vocab_path = os.path.join(root, "vocab.txt")
        with open(vocab_path, "w") as f:
            f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                              + list(words)))
        tok = BertTokenizer.from_vocab_file(vocab_path)
        word_ids = np.array(tok.convert_tokens_to_ids(list(words)), np.int32)

        para_words = rng.integers(0, len(words), (n, 20))
        res["gen_s"] = round(time.monotonic() - t0, 1)
        emit()

        # token ids derive directly from word indices (single-wordpiece vocab):
        # paragraphs [CLS] w*20 [SEP] = 22 tokens, queries 6-word snippets
        cls_id, sep_id = tok.cls_id, tok.sep_id
        para_ids = np.concatenate([
            np.full((n, 1), cls_id, np.int32),
            word_ids[para_words],
            np.full((n, 1), sep_id, np.int32),
        ], axis=1)                                               # [n, 22]

        def snippet_ids(rows: np.ndarray, seed: int) -> np.ndarray:
            r = np.random.default_rng(seed)
            starts = r.integers(0, 20 - 6, len(rows))
            sel = para_words[rows]
            snips = np.stack([sel[i, s:s + 6] for i, s in enumerate(starts)])
            return np.concatenate([
                np.full((len(rows), 1), cls_id, np.int32),
                word_ids[snips],
                np.full((len(rows), 1), sep_id, np.int32),
            ], axis=1)                                           # [m, 8]

        # ---- train a retriever on snippet->paragraph pairs ----
        t0 = time.monotonic()
        # From-scratch BERT-BASE collapses to the uniform plateau here (two runs:
        # constant 1e-4 AND warmup->6e-4 both end at loss = ln(80) = 4.382,
        # acc = 1/80, row-norm p5..p95 = 15.650..15.653 over 1M rows — identical
        # embeddings, so recall-vs-bf16 is tie-order noise, 0.0). A from-scratch
        # base model needs real-pretraining budgets to escape that attractor;
        # what this probe needs is a retriever that actually RANKS, so it trains
        # a 4-layer/256-hidden encoder to high in-batch acc instead — trained,
        # non-degenerate geometry (the output space is the same 128-dim).
        cfg = (BertConfig.tiny(dtype=jnp.float32, hidden_dropout=0.0,
                               attention_dropout=0.0, initializer_range=0.1,
                               vocab_size=2005)
               if tiny else
               # recipe CPU-swept in tools/collapse_sweep{,2}.py: f32, init 0.05,
               # lr 3e-4 + 100-step warmup is the config that LEARNS (acc 13x
               # chance by step 700 at 2L/128; init 0.1 or lr>=1e-3 or a 0.1x
               # projection init all collapse or stall)
               BertConfig(dtype=jnp.float32, vocab_size=2005,
                          hidden_size=256, num_layers=4, num_heads=4,
                          intermediate_size=1024, max_position_embeddings=64,
                          initializer_range=0.05, hidden_dropout=0.0,
                          attention_dropout=0.0))
        params = init_retriever_params(jax.random.PRNGKey(0), cfg)
        tx = (make_optimizer(1e-3) if tiny else
              make_optimizer(3e-4, warmup_steps=100, total_steps=steps))
        state = init_train_state(params, tx)
        step_fn = jax.jit(make_train_step(cfg, tx))
        key = jax.random.PRNGKey(1)
        bsz = 16 if tiny else 80
        loss0 = loss1 = acc1 = None
        for i in range(steps):
            rows = rng.integers(0, n, bsz)
            batch = {
                "input_ids_q": jnp.asarray(snippet_ids(rows, 1000 + i)),
                "input_ids_c": jnp.asarray(para_ids[rows]),
            }
            batch["input_mask_q"] = (batch["input_ids_q"] != 0).astype(jnp.int32)
            batch["input_mask_c"] = (batch["input_ids_c"] != 0).astype(jnp.int32)
            state, m = step_fn(state, batch, jax.random.fold_in(key, i))
            if i == 0:
                loss0 = float(m["loss"])
            if i % 100 == 0 or i == steps - 1:
                print(f"step {i} loss {float(m['loss']):.3f} "
                      f"acc {float(m['acc']):.3f}", flush=True)
            loss1, acc1 = float(m["loss"]), float(m["acc"])
        res.update(train_s=round(time.monotonic() - t0, 1),
                   loss_first=round(loss0, 3), loss_last=round(loss1, 3),
                   acc_last=round(acc1, 3))
        emit()

        # ---- encode the corpus with the trained context tower ----
        from proqa_tpu.models.retriever import encode_context, encode_query
        t0 = time.monotonic()
        enc_c = jax.jit(lambda p, i, m: encode_context(p, cfg, i, m))
        ebs = 512 if tiny else 4096
        emb = np.empty((n, 128), np.float32)
        ids_all = jnp.asarray(para_ids)
        for s in range(0, n, ebs):
            chunk = ids_all[s:s + ebs]
            emb[s:s + ebs] = np.asarray(
                enc_c(state.params, chunk, (chunk != 0).astype(jnp.int32)),
                np.float32,
            )
        q_rows = rng.integers(0, n, q_n)
        q_ids = jnp.asarray(snippet_ids(q_rows, 77))
        enc_q = jax.jit(lambda p, i, m: encode_query(p, cfg, i, m))
        qf32 = np.asarray(
            enc_q(state.params, q_ids, (q_ids != 0).astype(jnp.int32)),
            np.float32,
        )
        res["encode_s"] = round(time.monotonic() - t0, 1)
        if cache:
            np.savez(cache, emb=emb, qf32=qf32)
            res["emb_cache_saved"] = cache
    queries = jnp.asarray(qf32, jnp.bfloat16)
    # embedding geometry (how far from iid-normal the real thing is)
    rn = np.linalg.norm(emb, axis=1)
    res["row_norm_p5_p50_p95"] = [round(float(np.percentile(rn, p)), 3)
                                  for p in (5, 50, 95)]
    am = np.abs(emb).max(axis=1)
    res["row_absmax_p5_p50_p95"] = [round(float(np.percentile(am, p)), 4)
                                    for p in (5, 50, 95)]
    emit()

    # ---- quantize the three ways ----
    block = 16
    q8b, scb = quantize_rows(emb, block=block)
    perm = np.argsort(np.abs(emb).max(axis=1), kind="stable").astype(np.int32)
    q8s, scs = quantize_rows(emb[perm], block=block)
    q8r, scr = quantize_rows(emb, block=1)

    # ---- f32 ground truth + per-query score stats (the CONTROL) ----
    # The recall target below ("bf16") is itself an 8-bit-mantissa
    # representation. Whether int8's recall loss is real or representation-
    # parity depends on what bf16 loses vs TRUE f32 scores on the same
    # geometry — compute exact f32 top-K on device (chunked: [256, n] f32
    # score slabs), plus the score-mass each variant retrieves.
    t0 = time.monotonic()
    # HOST numpy truth: the device version (einsum + recursive exact_topk at
    # width 1M) hit a pathological >15-min remote compile (CLAUDE.md: keep
    # tunnel programs structurally small). 2048 x 1M x 128 f32 is ~0.5
    # TFLOP — seconds on host BLAS — and argpartition gives exact top-K.
    f32_idx = np.empty((q_n, K), np.int64)
    for st in range(0, q_n, 256):
        sc = qf32[st:st + 256] @ emb.T                       # [256, n] f32
        part = np.argpartition(sc, -K, axis=1)[:, -K:]
        ordv = np.take_along_axis(sc, part, 1)
        f32_idx[st:st + 256] = np.take_along_axis(
            part, np.argsort(-ordv, axis=1), 1)
    truth_f32_scores = np.einsum(
        "qkd,qd->qk", emb[f32_idx], qf32)            # [Q, K] true top-K mass
    truth_mass = truth_f32_scores.sum(-1)
    res["f32_truth_s"] = round(time.monotonic() - t0, 1)
    res["top1_top80_gap_rel_p50"] = round(float(np.median(
        (truth_f32_scores[:, 0] - truth_f32_scores[:, -1])
        / np.abs(truth_f32_scores[:, 0]).clip(1e-9))), 4)
    emit()

    corpus_bf16 = jnp.asarray(emb, jnp.bfloat16)
    dq8r, dscr = jnp.asarray(q8r), jnp.asarray(scr)
    dev = dict(
        bf16=(corpus_bf16, {}),
        int8_block=(jnp.asarray(q8b), dict(scales=jnp.asarray(scb))),
        int8_sorted=(jnp.asarray(q8s), dict(scales=jnp.asarray(scs))),
        int8_row_kb1x=(dq8r, dict(row_scales=dscr)),
        int8_row_kb4x=(dq8r, dict(row_scales=dscr, kb=4 * K, q_chunk=256)),
        int8_row_kb16x=(dq8r, dict(row_scales=dscr, kb=16 * K, q_chunk=256)),
    )
    del q8b, q8s, q8r

    kw = dict(block=block, group=128 if not tiny else 16,
              tile_q=2048 if not tiny else 256,
              sub_chunks=4 if not tiny else 2, interpret=interp)

    outs, compile_s = {}, {}
    for name, (corpus, extra) in dev.items():
        t0 = time.monotonic()
        v, i = mips_topk_pallas_v2(queries, corpus, K, **kw, **extra)
        got = np.asarray(i)
        if name == "int8_sorted":
            got = perm[got]
        outs[name] = got
        compile_s[name] = round(time.monotonic() - t0, 1)
        res[name + "_compile_s"] = compile_s[name]
        emit()

    truth = outs["bf16"]
    truth_f32_sets = [set(f32_idx[r]) for r in range(q_n)]
    for name, got in outs.items():
        if name != "bf16":
            res[name + "_recall_vs_bf16"] = round(float(np.mean(
                [len(set(got[r]) & set(truth[r])) / K for r in range(q_n)]
            )), 4)
        # vs TRUE f32 ranking (bf16 included: the production baseline's own
        # representation loss on this geometry)
        res[name + "_recall_vs_f32"] = round(float(np.mean(
            [len(set(got[r]) & truth_f32_sets[r]) / K for r in range(q_n)]
        )), 4)
        # tie-tolerant quality: true score mass retrieved / true top-K mass
        # (a swap among near-equal scores costs ~nothing here, as it costs
        # ~nothing downstream)
        got_mass = np.einsum("qkd,qd->qk", emb[got], qf32).sum(-1)
        res[name + "_score_frac"] = round(float(
            np.mean(got_mass / truth_mass)), 5)
    emit()

    # ---- interleaved timing (3 rounds, amortized over DEPTH) ----
    if on_tpu:
        rounds = {name: [] for name in dev}
        for _ in range(3):
            for name, (corpus, extra) in dev.items():
                t0 = time.perf_counter()
                for _ in range(DEPTH):
                    v, i = mips_topk_pallas_v2(queries, corpus, K, **kw,
                                               **extra)
                np.asarray(i)
                rounds[name].append((time.perf_counter() - t0) / DEPTH * 1e3)
        for name, ts in rounds.items():
            res[name + "_ms"] = round(float(np.median(ts)), 2)
    print("FINAL", json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
