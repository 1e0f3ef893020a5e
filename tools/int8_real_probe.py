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
a BERT-base retriever contrastively trained IN THIS PROCESS for 150 steps
(snippet->paragraph pairs) — real encoder geometry, no external data
(HF_HUB_OFFLINE; no released checkpoints in the image).

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

    jax.config.update("jax_default_prng_impl", "rbg")
    tiny = bool(os.environ.get("TINY"))
    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu
    n = 8192 if tiny else 1_048_576
    q_n = 256 if tiny else 2048
    steps = 10 if tiny else 150
    res: dict = {"n": n, "queries": q_n}

    def emit():
        print(json.dumps(res), flush=True)

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
    cfg = (BertConfig.tiny(dtype=jnp.float32, hidden_dropout=0.0,
                           attention_dropout=0.0, initializer_range=0.1)
           if tiny else
           BertConfig(dtype=jnp.bfloat16, remat=True, vocab_size=2005,
                      initializer_range=0.05))
    params = init_retriever_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-4 if not tiny else 1e-3)
    state = init_train_state(params, tx)
    step_fn = jax.jit(make_train_step(cfg, tx))
    key = jax.random.PRNGKey(1)
    bsz = 16 if tiny else 80
    loss0 = loss1 = None
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
        loss1 = float(m["loss"])
    res.update(train_s=round(time.monotonic() - t0, 1),
               loss_first=round(loss0, 3), loss_last=round(loss1, 3))
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
    queries = jnp.asarray(np.asarray(
        enc_q(state.params, q_ids, (q_ids != 0).astype(jnp.int32)),
        np.float32,
    ), jnp.bfloat16)
    res["encode_s"] = round(time.monotonic() - t0, 1)
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

    corpus_bf16 = jnp.asarray(emb, jnp.bfloat16)
    del emb
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
    for name, got in outs.items():
        if name == "bf16":
            continue
        res[name + "_recall_vs_bf16"] = round(float(np.mean(
            [len(set(got[r]) & set(truth[r])) / K for r in range(q_n)]
        )), 4)
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
