"""Headline benchmark: exact MIPS top-80 throughput on real TPU, plus the
reference's other hot workloads as driver-verifiable sub-benches in `detail`:

* exact MIPS (headline metric): the reference's retrieval-eval operating
  point (/root/reference/retrieval/eval_retrieval.py:98-104: FAISS
  IndexFlatIP, 128-d, top-80, ~2032 WebQuestions-test queries; BASELINE.md
  north star: >10k queries/sec on a v5e-8) at production corpus scale.
* exact MIPS at 16.8M / 33.6M rows (4 / 8.6 GiB bf16 index) and 67.1M rows
  int8 — regression-track sub-linear scaling up to the single-chip capacity
  points (the reference's whole-Wikipedia corpus is ~21M paragraphs).
* corpus encode tok/s (workload #1, /root/reference/retrieval/get_embed.py:
  138-172): BERT-base context-tower inference, bf16 + flash attention, at
  the fixed 256x512 point AND length-bucketed over a realistic paragraph
  length distribution (the production build path; round-2 VERDICT weak #5).
* retriever train step ms (/root/reference/retrieval/train_retriever.py:
  198-231): 80-pair two-tower step (32-tok queries, 512-tok paragraphs),
  remat + tuned flash attention — the round-1 500 ms headline.
* QA joint train step (4 q x 5 paras x 512, M=5000), QA wall-clock per step
  with online retrieval + prefetch, and warm serving p50/p95 + load probe
  (the reference's third workload, /root/reference/qa/train_retrieve_qa.py:
  184-217; round-2 VERDICT miss #3, round-3 weak #4).

Failure envelope (round-4 VERDICT #1 — the r04 run hit the driver timeout
and recorded NOTHING):
* The full result JSON line is printed after the headline and re-printed
  after EVERY sub-bench with the detail accumulated so far — whatever kills
  the process, the tail's last JSON line carries everything measured.
* An internal wall-clock budget (BENCH_BUDGET_S, default 1500) skips
  remaining sub-benches once exceeded, recording "<name>": "skipped_budget".
* Synthetic corpora are generated ON DEVICE (jax.random.normal chunks into a
  donated dynamic_update_slice buffer) — the r04 design host-generated
  ~21 GiB and pushed it through the ~105 MB/s tunnel.
* Sub-benches run cheap -> giant so a timeout eats the giants last, and the
  two qa_world consumers share ONE world build.

Correctness of the exact search is pinned by tests/test_mips.py; here we
verify a sample against naive device search and measure throughput.

Baseline for `vs_baseline`: the reference's CPU exact search modeled as
numpy `dot + argpartition` (BASELINE.json's description of eval_retrieval),
measured on a corpus slice on this host and scaled linearly to full N.

Prints the JSON line {"metric", "value", "unit", "vs_baseline", "detail"}
(re-printed cumulatively; parse the LAST one). Set BENCH_FAST=1 to skip
everything but the headline MIPS bench.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

N = 4_194_304       # 2^22 corpus rows (bf16 index: 1 GiB HBM)
D = 128
Q = 2048            # ~WebQuestions-test (2032) padded to a power of two
K = 80
ITERS = 8
BASELINE_SLICE = 131_072

_T0 = time.monotonic()


def _elapsed() -> float:
    return time.monotonic() - _T0


def _budget_s() -> float:
    return float(os.environ.get("BENCH_BUDGET_S", "1500"))


def _device_corpus(n: int, seed: int, chunks: int = 8, dtype=None):
    """Generate an [n, D] random corpus ON DEVICE: per-chunk
    jax.random.normal into a donated dynamic_update_slice buffer. Replaces
    r04's host-side generation + ~105 MB/s tunnel upload (multi-GiB, minutes
    per giant sub) with pure device work (sub-second)."""
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.bfloat16
    assert n % chunks == 0
    chunk = n // chunks
    place = jax.jit(
        lambda c, p, i: jax.lax.dynamic_update_slice(c, p, (i, jnp.int32(0))),
        donate_argnums=0,
    )
    gen = jax.jit(lambda k: jax.random.normal(k, (chunk, D), dtype))
    corpus = jnp.zeros((n, D), dtype)
    key = jax.random.PRNGKey(seed)
    for i in range(chunks):
        corpus = place(corpus, gen(jax.random.fold_in(key, i)),
                       jnp.int32(i * chunk))
    return corpus


def _device_corpus_int8(n: int, qb: int, seed: int, chunks: int = 32):
    """On-device generate + per-block int8 quantize (ops/quant.py scheme:
    symmetric absmax over blocks of qb consecutive rows). Returns
    (codes int8 [n, D], scales f32 [n // qb])."""
    import jax
    import jax.numpy as jnp

    assert n % chunks == 0
    chunk = n // chunks
    assert chunk % qb == 0  # blocks never straddle chunk boundaries

    place = jax.jit(
        lambda c, p, i: jax.lax.dynamic_update_slice(c, p, (i, jnp.int32(0))),
        donate_argnums=0,
    )
    place_s = jax.jit(
        lambda c, p, i: jax.lax.dynamic_update_slice(c, p, (i,)),
        donate_argnums=0,
    )

    @jax.jit
    def gen_quant(k):
        part = jax.random.normal(k, (chunk, D), jnp.float32)
        amax = jnp.max(jnp.abs(part.reshape(chunk // qb, qb * D)), axis=1)
        sc = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
        codes = jnp.clip(
            jnp.round(part / jnp.repeat(sc, qb)[:, None]), -127, 127
        ).astype(jnp.int8)
        return codes, sc

    corpus = jnp.zeros((n, D), jnp.int8)
    scales = jnp.zeros((n // qb,), jnp.float32)
    key = jax.random.PRNGKey(seed)
    for i in range(chunks):
        codes, sc = gen_quant(jax.random.fold_in(key, i))
        corpus = place(corpus, codes, jnp.int32(i * chunk))
        scales = place_s(scales, sc, jnp.int32(i * chunk // qb))
    return corpus, scales


def _numpy_baseline_qps(xq: np.ndarray, xb_slice: np.ndarray) -> float:
    """CPU exact search on a slice; scaled to full N outside."""
    t0 = time.perf_counter()
    scores = xq @ xb_slice.T
    part = np.argpartition(-scores, K, axis=1)[:, :K]
    _ = np.take_along_axis(scores, part, axis=1)
    dt = time.perf_counter() - t0
    # scale: full-N time ~ dt * (N / slice)
    full_time = dt * (N / xb_slice.shape[0])
    return Q / full_time


def _bench_encode() -> dict:
    """Corpus-encode throughput (workload #1): BERT-base context tower,
    bf16 + flash attention (the exact-inference default), batch 256 x 512."""
    import jax
    import jax.numpy as jnp

    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.retriever import encode_context, init_retriever_params

    on_tpu = jax.default_backend() == "tpu"
    cfg = BertConfig(
        dtype=jnp.bfloat16, hidden_dropout=0.0, attention_dropout=0.0,
        flash_attention=on_tpu,
    )
    params = init_retriever_params(jax.random.PRNGKey(0), cfg)
    b, t = 256, 512
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(5, cfg.vocab_size, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), jnp.int32)
    fn = jax.jit(lambda p, i, m: encode_context(p, cfg, i, m))
    np.asarray(fn(params, ids, mask))  # compile
    for _ in range(4):  # warm-up round (see _bench_train_step)
        np.asarray(fn(params, ids, mask))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(fn(params, ids, mask))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {"encode_tok_s": round(b * t / dt, 0), "encode_ms": round(dt * 1e3, 1),
            "encode_shape": f"{b}x{t}"}


def _bench_encode_bucketed() -> dict:
    """Length-bucketed corpus encode (the production index-build path,
    index/build.py buckets) over a realistic paragraph length distribution;
    reports USEFUL token throughput (sum of true lengths / wall)."""
    import jax
    import jax.numpy as jnp

    from proqa_tpu.index.build import encode_corpus
    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.retriever import init_retriever_params

    on_tpu = jax.default_backend() == "tpu"
    cfg = BertConfig(
        dtype=jnp.bfloat16, hidden_dropout=0.0, attention_dropout=0.0,
        flash_attention=on_tpu,
    )
    params = init_retriever_params(jax.random.PRNGKey(0), cfg)

    n, bsz = 4096, 256
    rng = np.random.default_rng(3)
    # Wikipedia-paragraph-ish wordpiece lengths: lognormal, clipped to [32, 512]
    lens = np.clip(rng.lognormal(5.2, 0.55, n).astype(np.int64), 32, 512)
    # pre-generate token ids: this bench tracks the DEVICE bucketing win, not
    # host id generation (tokenization is the C++ path's business)
    rows = [rng.integers(5, cfg.vocab_size, int(l)).tolist() for l in lens]

    class _Rows:
        max_len = 512

        def __len__(self):
            return n

        def __getitem__(self, i):
            return rows[i]

    ds = _Rows()
    buckets = (128, 256, 512)   # 3 compiled signatures
    encode_corpus(params, cfg, ds, batch_size=bsz, buckets=buckets)  # compile
    t0 = time.perf_counter()
    emb = encode_corpus(params, cfg, ds, batch_size=bsz, buckets=buckets)
    dt = time.perf_counter() - t0
    assert emb.shape[0] == n
    return {
        "encode_bucketed_tok_s": round(float(lens.sum()) / dt, 0),
        "encode_bucketed_paras_s": round(n / dt, 1),
        "encode_mean_len": round(float(lens.mean()), 1),
    }


def _bench_qa_step() -> dict:
    """QA joint train step at the production operating point: 4 questions x
    5 paragraphs x 512 tokens, M=5000 rank candidates (reference
    qa/train_retrieve_qa.py:184-217, train_dense_qa.sh)."""
    import jax
    import jax.numpy as jnp

    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.reader import QAConfig, init_qa_params
    from proqa_tpu.train.qa_trainer import QATrainer, QATrainerConfig

    jax.config.update("jax_default_prng_impl", "rbg")
    on_tpu = jax.default_backend() == "tpu"
    cfg = BertConfig(dtype=jnp.bfloat16, remat=True, flash_attention=on_tpu)
    qcfg = QAConfig(shared_norm=True)
    tcfg = QATrainerConfig(learning_rate=1e-5)
    params = init_qa_params(jax.random.PRNGKey(0), cfg, qcfg)
    trainer = QATrainer(cfg, qcfg, tcfg, params=params)

    b, k, l, tq, m = 4, 5, 512, 30, 5000
    rng = np.random.default_rng(0)
    segs = np.zeros((b, k, l), np.int32)
    segs[:, :, tq:] = 1
    net = {
        "input_ids": rng.integers(5, cfg.vocab_size, (b, k, l)).astype(np.int32),
        "input_mask": np.ones((b, k, l), np.int32),
        "segment_ids": segs,
        "paragraph_mask": segs,
        "input_ids_q": rng.integers(5, cfg.vocab_size, (b, tq)).astype(np.int32),
        "input_mask_q": np.ones((b, tq), np.int32),
        "para_embed": rng.standard_normal((b, m, 128)).astype(np.float32),
        "start_positions": rng.integers(tq + 1, l - 10, (b, k, 3)).astype(np.int32),
        "end_positions": rng.integers(tq + 1, l - 1, (b, k, 3)).astype(np.int32),
        "para_targets": rng.integers(0, 2, (b, k)).astype(np.int32),
        "top5000_labels": rng.integers(0, 2, (b, m)).astype(np.int32),
        "question_mask": np.ones((b,), np.int32),
    }
    dev = trainer._device_batch(net)
    key = jax.random.PRNGKey(5)
    trainer.state, comp = trainer._train_step(trainer.state, dev, key)
    float(comp["loss"])
    for i in range(6):  # warm-up round (first timed loop reads high)
        trainer.state, comp = trainer._train_step(
            trainer.state, dev, jax.random.fold_in(key, i)
        )
    float(comp["loss"])
    t0 = time.perf_counter()
    for i in range(6):
        trainer.state, comp = trainer._train_step(
            trainer.state, dev, jax.random.fold_in(key, 100 + i)
        )
    float(comp["loss"])
    return {"qa_step_ms": round((time.perf_counter() - t0) / 6 * 1e3, 1)}


def _bench_qa_wall(w) -> dict:
    """QA wall-clock per training step with ONLINE retrieval: real sampler
    (6k-para world so the top-5000 candidate shape is the production one),
    span matching on the host, prefetch thread on (default). The reference's
    per-question CPU<->GPU ping-pong workload, batched (SURVEY.md §3.4).
    `w` is the shared qa_world (built once per bench run; _bench_serve
    reuses it)."""
    import jax
    import jax.numpy as jnp

    from proqa_tpu.data.collate import batch_pad
    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.reader import QAConfig
    from proqa_tpu.qa.sampler import OnlineSampler, OnlineSamplerConfig
    from proqa_tpu.train.qa_trainer import QATrainer, QATrainerConfig

    jax.config.update("jax_default_prng_impl", "rbg")

    root, index = w["root"], w["index"]

    on_tpu = jax.default_backend() == "tpu"
    cfg = BertConfig(dtype=jnp.bfloat16, remat=True, flash_attention=on_tpu)
    scfg = OnlineSamplerConfig(
        max_query_length=30, max_length=512, candidates=5000,
        question_batch=4, num_workers=0,
        # production config: one fused retrieval dispatch serves 4 train
        # batches (candidates <=4 steps stale; identical batches under a
        # fixed encoder — test_retrieval_batch_grouping_same_batches)
        retrieval_batch=16,
    )
    tcfg = QATrainerConfig(
        learning_rate=1e-5, questions_per_batch=4, train_k=5,
        num_train_epochs=1, eval_period=-1, prefetch_batches=2,
        output_dir=os.path.join(root, "run"),
    )
    trainer = QATrainer(cfg, QAConfig(shared_norm=True), tcfg)
    trainer.set_corpus(index)
    sampler = OnlineSampler(w["qa_path"], w["tok"], w["db"], index, scfg)

    times, t_prev, nsteps = [], None, 0
    for batch in trainer._prefetched(sampler.load(trainer.query_encoder(), 5, 4)):
        net, rows = batch_pad(batch["net_input"], 4)
        net["question_mask"] = (np.arange(4) < rows).astype(np.int32)
        trainer.rng, step_rng = jax.random.split(trainer.rng)
        with trainer._state_lock:
            # raw host net: _train_step packs it into one device transfer
            trainer.state, comp = trainer._train_step(trainer.state, net, step_rng)
        float(comp["loss"])
        now = time.perf_counter()
        if t_prev is not None and nsteps >= 4:
            times.append(now - t_prev)
        t_prev = now
        nsteps += 1
    sampler.close()
    return {
        "qa_wall_ms_per_step": round(float(np.median(times)) * 1e3, 1),
        "qa_wall_steps": nsteps,
    }


def _bench_serve(w) -> dict:
    """Warm QA serving on the shared qa_world — the `proqa serve`
    steady-state path (round-3 VERDICT weak #4: driver-track serving so the
    /answer path can't silently regress). Two sub-measurements over ONE
    world: per-request p50/p95 latency (question_batch=1), and loaded
    throughput — 16 questions dispatched one-by-one (serial) vs as one
    MicroBatcher-style drain (batch16, pad_buckets sampler)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
    import serve_latency
    import serve_load_probe

    out = serve_latency.measure(w)
    out.update(serve_load_probe.measure(w, rounds=3, http=False))
    return out


def _bench_mips_16m() -> dict:
    """Exact MIPS at 16.8M x 128 (4 GiB bf16 index): regression-tracks the
    sub-linear scaling claim at ~Wikipedia corpus scale."""
    import jax
    import jax.numpy as jnp

    from proqa_tpu.ops.mips import mips_topk_reference
    from proqa_tpu.ops.pallas_mips import mips_topk_pallas_v2

    n16 = 4 * N
    corpus = _device_corpus(n16, seed=7, chunks=8)
    queries = jax.random.normal(jax.random.PRNGKey(70), (Q, D), jnp.bfloat16)

    def search():
        # block=32 here (not the 4.2M-tuned 16): bmax3 is N/block*Q*4 bytes
        # = 4.3 GiB at 16.8M — block=16 would need 8.6 GiB on top of the
        # 4 GiB corpus and overflow HBM. group=128: G=64 lane-pads the whole
        # bmax3 buffer AND measures ~20% slower in-process; sub_chunks=4
        # (1024-row dot+reduce chains) beat 8 by ~2.5%
        # (tools/big_mips_ab.py round 4: g128_s4 89.4 / g128_s8 91.7 /
        # g64_s4 109.6 / g64_s8 107.5 — round-3's 75.8 with g64_s4 was a
        # faster SESSION, not a better config)
        return mips_topk_pallas_v2(
            queries, corpus, K, block=32, group=128, tile_q=2048, sub_chunks=4
        )

    vals, idx = search()
    np.asarray(idx[:1])
    depth = 12
    t0 = time.perf_counter()
    for _ in range(depth):
        vals, idx = search()
    np.asarray(idx)
    ms = (time.perf_counter() - t0) / depth * 1e3

    sub = 32
    rv, ri = mips_topk_reference(queries[:sub], corpus, K)
    got, want = np.asarray(idx[:sub]), np.asarray(ri)
    recall = float(np.mean(
        [len(set(got[i]) & set(want[i])) / K for i in range(sub)]
    ))
    return {
        "mips16M_ms_amortized": round(ms, 2),
        "mips16M_qps": round(Q / ms * 1e3, 1),
        "mips16M_self_recall": round(recall, 4),
    }


def _bench_mips_33m() -> dict:
    """Exact MIPS at 33.6M x 128 (8.6 GiB bf16 index — the supported
    single-chip max, ~1.6x the reference's whole-Wikipedia corpus of ~21M
    paragraphs which /root/reference/retrieval/eval_retrieval.py:99-104
    searches exactly). block=64 keeps the stage-1 block-maxima buffer
    (N/block * Qpad * 4 B) at 4.3 GiB so index + buffer fit 16 GiB HBM.
    q_chunk=256 bounds the stage-3 rescore gather: unchunked it would
    materialize [2048, 80, 64, 128] bf16 = 2.7 GiB on top of the 12.9 GiB
    corpus+bmax3 — the r05-run1 RESOURCE_EXHAUSTED."""
    import jax
    import jax.numpy as jnp

    from proqa_tpu.ops.mips import mips_topk_reference
    from proqa_tpu.ops.pallas_mips import mips_topk_pallas_v2

    n33 = 8 * N
    corpus = _device_corpus(n33, seed=11, chunks=16)
    queries = jax.random.normal(jax.random.PRNGKey(71), (Q, D), jnp.bfloat16)

    def search():
        return mips_topk_pallas_v2(
            queries, corpus, K, block=64, group=128, tile_q=2048,
            sub_chunks=16, q_chunk=256,
        )

    vals, idx = search()
    np.asarray(idx[:1])
    depth = 8
    t0 = time.perf_counter()
    for _ in range(depth):
        vals, idx = search()
    np.asarray(idx)
    ms = (time.perf_counter() - t0) / depth * 1e3

    sub = 32
    rv, ri = mips_topk_reference(queries[:sub], corpus, K)
    got, want = np.asarray(idx[:sub]), np.asarray(ri)
    recall = float(np.mean(
        [len(set(got[i]) & set(want[i])) / K for i in range(sub)]
    ))
    return {
        "mips33M_ms_amortized": round(ms, 2),
        "mips33M_qps": round(Q / ms * 1e3, 1),
        "mips33M_self_recall": round(recall, 4),
    }


def _bench_mips_67m_int8() -> dict:
    """Exact-in-quantized-scores MIPS at 67.1M x 128 int8 (8.6 GiB index +
    268 MB scales — the int8 single-chip max, 3.2x the reference's
    whole-Wikipedia corpus). Per-block scales multiply in-kernel before the
    block max-reduce (ops/quant.py, --int8-index). block=128 keeps bmax3 at
    4.3 GiB; q_chunk=256 bounds the rescore gather; ~14.5 GiB total HBM.
    recall here is vs the same int8 representation searched naively (the
    exactness contract); int8-vs-bf16 representation recall is measured at
    4.2M by tools/int8_probe.py where both fit."""
    import jax
    import jax.numpy as jnp

    from proqa_tpu.ops.mips import mips_topk_reference
    from proqa_tpu.ops.pallas_mips import mips_topk_pallas_v2
    from proqa_tpu.ops.quant import expand_scales

    n67 = 16 * N
    qb = 128                     # quantization block == kernel reduce block
    corpus, scales = _device_corpus_int8(n67, qb, seed=13, chunks=32)
    queries = jax.random.normal(jax.random.PRNGKey(72), (Q, D), jnp.bfloat16)

    def search():
        return mips_topk_pallas_v2(
            queries, corpus, K, block=qb, group=128, tile_q=2048,
            sub_chunks=32, q_chunk=256, scales=scales,
        )

    vals, idx = search()
    np.asarray(idx[:1])
    depth = 6
    t0 = time.perf_counter()
    for _ in range(depth):
        vals, idx = search()
    np.asarray(idx)
    ms = (time.perf_counter() - t0) / depth * 1e3

    # exact reference, chunked: a whole-corpus [32, 67M] f32 score matrix
    # would be 8.6 GiB on top of the index — merge per-chunk exact top-Ks
    # (global top-K is the top-K of the per-chunk top-Ks)
    sub = 32
    chunk = n67 // 16
    cv, ci = [], []
    for i in range(16):
        sc_chunk = jax.lax.dynamic_slice_in_dim(
            scales, i * chunk // qb, chunk // qb
        )
        v, ix = mips_topk_reference(
            queries[:sub], jax.lax.dynamic_slice_in_dim(corpus, i * chunk, chunk),
            K, scales=expand_scales(sc_chunk, qb, chunk),
        )
        cv.append(np.asarray(v))
        ci.append(np.asarray(ix) + i * chunk)
    cat_v, cat_i = np.concatenate(cv, 1), np.concatenate(ci, 1)
    sel = np.argsort(-cat_v, axis=1)[:, :K]
    want = np.take_along_axis(cat_i, sel, axis=1)
    got = np.asarray(idx[:sub])
    recall = float(np.mean(
        [len(set(got[i]) & set(want[i])) / K for i in range(sub)]
    ))
    return {
        "mips67M_int8_ms_amortized": round(ms, 2),
        "mips67M_int8_qps": round(Q / ms * 1e3, 1),
        "mips67M_int8_self_recall": round(recall, 4),
    }


def _bench_train_step() -> dict:
    """Retriever contrastive train step at the round-1 headline operating
    point: 80 pairs, 32-tok queries / 512-tok paragraphs, remat + flash."""
    import jax
    import jax.numpy as jnp

    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.retriever import init_retriever_params
    from proqa_tpu.train.optim import init_train_state, make_optimizer
    from proqa_tpu.train.retriever_trainer import make_train_step

    jax.config.update("jax_default_prng_impl", "rbg")
    on_tpu = jax.default_backend() == "tpu"
    cfg = BertConfig(dtype=jnp.bfloat16, remat=True, flash_attention=on_tpu)
    params = init_retriever_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-5, max_grad_norm=2.0)
    state = init_train_state(params, tx)
    step = jax.jit(make_train_step(cfg, tx), donate_argnums=(0,))

    b, tq, tc = 80, 32, 512
    rng = np.random.default_rng(2)
    batch = {
        "input_ids_q": jnp.asarray(rng.integers(5, cfg.vocab_size, (b, tq)), jnp.int32),
        "input_mask_q": jnp.ones((b, tq), jnp.int32),
        "input_ids_c": jnp.asarray(rng.integers(5, cfg.vocab_size, (b, tc)), jnp.int32),
        "input_mask_c": jnp.ones((b, tc), jnp.int32),
    }
    key = jax.random.PRNGKey(3)
    state, m = step(state, batch, key)  # compile
    float(m["loss"])
    # full warm-up round: the first timed loop after compilation reads ~50%
    # high on this stack (tools/train_decomp4.py: 575 -> 375 ms for identical
    # steps) — discard it before measuring
    for i in range(12):
        state, m = step(state, batch, jax.random.fold_in(key, 100 + i))
    float(m["loss"])
    times = []
    for i in range(6):
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.fold_in(key, i))
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    # amortized: back-to-back dispatches, force only the last — separates
    # compute from the tunnel's per-dispatch sync the way the MIPS headline
    # does (round-3 VERDICT weak #3: don't mix dispatch overhead into a
    # compute metric). Real training overlaps dispatch with the next host
    # step, so this is also the deployed-throughput number.
    depth = 12
    t0 = time.perf_counter()
    for i in range(depth):
        state, m = step(state, batch, jax.random.fold_in(key, 200 + i))
    float(m["loss"])
    amortized = (time.perf_counter() - t0) / depth
    return {"train_step_ms": round(float(np.median(times)) * 1e3, 1),
            "train_step_ms_amortized": round(amortized * 1e3, 1),
            "train_shape": f"{b}x({tq}q+{tc}c)"}


_SUB_FNS = {
    "mips33m": lambda: _bench_mips_33m(),
    "mips67m_int8": lambda: _bench_mips_67m_int8(),
}


def _isolated(sub_name: str, timeout_s: float) -> dict:
    """Run a giant sub-bench in a FRESH subprocess (python bench.py --sub X).

    Total HBM isolation: r05-run2 showed the 33M/67M subs RESOURCE_EXHAUSTED
    in-process — earlier subs' residue (the shared qa_world trainer/serve
    state plus allocator fragmentation) shaved the ~13-15 GiB they need —
    while the identical code passed standalone (tools/bigmem_probe.py,
    logs/bigmem_probe.log). A subprocess also contains any crash: the parent
    records the error string and keeps emitting the cumulative JSON line."""
    import subprocess
    import sys

    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--sub", sub_name],
        capture_output=True, text=True, timeout=timeout_s,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    for line in reversed(p.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except ValueError:
            continue
    raise RuntimeError(
        f"--sub {sub_name}: rc={p.returncode} "
        f"stderr={p.stderr.strip()[-180:]}"
    )


def _wait_for_backend(tries: int = 8, delay_s: float = 45.0) -> None:
    """The tunneled TPU backend has transient multi-minute outages; a bench
    run that lands in one should wait it out, not crash with no JSON line."""
    import jax

    for i in range(tries):
        try:
            jax.devices()
            return
        except RuntimeError as e:
            if i == tries - 1:
                raise
            print(f"# backend unavailable (try {i + 1}/{tries}): "
                  f"{str(e)[:120]}", flush=True)
            time.sleep(delay_s)


def main() -> None:
    import sys

    if len(sys.argv) == 3 and sys.argv[1] == "--sub":
        _wait_for_backend()
        print(json.dumps(_SUB_FNS[sys.argv[2]]()), flush=True)
        return

    import jax
    import jax.numpy as jnp

    from proqa_tpu.ops.mips import mips_topk_reference
    from proqa_tpu.ops.pallas_mips import mips_topk_pallas_v2

    _wait_for_backend()

    # host slice for the numpy CPU baseline only; the device corpus is
    # generated on device (different rows — both are iid normal, and the
    # baseline is a throughput model, not a correctness comparison)
    rng = np.random.default_rng(0)
    xq = rng.standard_normal((Q, D), dtype=np.float32)
    xb_slice = rng.standard_normal((BASELINE_SLICE, D), dtype=np.float32)

    corpus = _device_corpus(N, seed=0, chunks=4)
    queries = jax.device_put(jnp.asarray(xq, jnp.bfloat16))

    def search():
        # round-3 tuning: tile_q=2048, block=16, sub_chunks=4 (see
        # ops/mips.py dispatch comment; tools/*sweep*.py)
        return mips_topk_pallas_v2(
            queries, corpus, K, block=16, group=128, tile_q=2048, sub_chunks=4
        )

    # warmup/compile
    vals, idx = search()
    np.asarray(idx[:1])

    # single-dispatch latency (dominated by the tunnel's fixed per-dispatch
    # overhead, 26-52 ms depending on the day — recorded for reference)
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        vals, idx = search()
        np.asarray(idx)  # force full completion through the transfer
        times.append(time.perf_counter() - t0)
    dt_single = float(np.min(times))

    # throughput: back-to-back dispatches, force only the last — how a real
    # retrieval service drives the chip; amortizes the tunnel's fixed
    # per-dispatch overhead that single-dispatch timing cannot separate
    depth = 2 * ITERS
    t0 = time.perf_counter()
    for _ in range(depth):
        vals, idx = search()
    np.asarray(idx)
    dt = (time.perf_counter() - t0) / depth
    qps = Q / dt

    # correctness spot check on a subsample of queries vs naive device search
    sub = 64
    rv, ri = mips_topk_reference(queries[:sub], corpus, K)
    got, want = np.asarray(idx[:sub]), np.asarray(ri)
    overlap = np.mean([
        len(set(got[i]) & set(want[i])) / K for i in range(sub)
    ])

    baseline_qps = _numpy_baseline_qps(xq, xb_slice)

    detail = {
        "search_ms_amortized": round(dt * 1e3, 2),
        "search_ms_single_dispatch": round(dt_single * 1e3, 2),
        "self_recall": round(float(overlap), 4),
        "numpy_cpu_qps_scaled": round(baseline_qps, 2),
        "corpus": f"{N}x{D} bf16",
    }

    result = {
        "metric": f"exact_mips_top{K}_qps_{N}x{D}",
        "value": round(qps, 1),
        "unit": "queries/sec/chip",
        "vs_baseline": round(qps / baseline_qps, 1),
        "detail": detail,
    }

    def emit():
        # re-printed cumulatively after every sub-bench: whatever kills the
        # process, the tail's LAST JSON line carries everything measured
        detail["elapsed_s"] = round(_elapsed(), 1)
        print(json.dumps(result), flush=True)

    emit()

    # free the 1 GiB corpus before the scale/BERT sub-benches
    del corpus, queries, vals, idx

    if not os.environ.get("BENCH_FAST"):
        budget = _budget_s()
        qa_world = {}

        def _shared_world():
            # ONE qa_world build shared by qa_wall and serve (r04 built two)
            if "w" not in qa_world:
                import sys

                sys.path.insert(
                    0, os.path.join(os.path.dirname(__file__), "tools")
                )
                from qa_world import build_qa_world

                qa_world["w"] = build_qa_world()
            return qa_world["w"]

        # (fn, conservative worst-case seconds incl. fresh remote compiles),
        # ordered cheap -> giant so a driver timeout eats the giants last
        subs = (
            (_bench_encode, 90),
            (_bench_encode_bucketed, 90),
            (_bench_train_step, 150),
            (_bench_qa_step, 150),
            (lambda: _bench_qa_wall(_shared_world()), 180, "_bench_qa_wall"),
            (lambda: _bench_serve(_shared_world()), 150, "_bench_serve"),
            (_bench_mips_16m, 240),
            # giants run subprocess-isolated (see _isolated); drop the shared
            # qa_world first so even the parent's residue is minimal
            (lambda: (qa_world.clear(),
                      _isolated("mips33m", 420))[1], 300, "_bench_mips_33m"),
            (lambda: _isolated("mips67m_int8", 540), 420,
             "_bench_mips_67m_int8"),
        )
        for entry in subs:
            fn, est = entry[0], entry[1]
            name = entry[2] if len(entry) > 2 else fn.__name__
            if _elapsed() + est > budget:
                detail[name] = "skipped_budget"
                emit()
                continue
            try:
                detail.update(fn())
            except Exception as e:  # a sub-bench failure must not hide the headline
                detail[name + "_error"] = f"{type(e).__name__}: {e}"[:200]
            emit()


if __name__ == "__main__":
    main()
