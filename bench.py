"""Headline benchmark: exact MIPS top-80 throughput on real TPU, plus the
two other hot workloads as driver-verifiable sub-benches in `detail`:

* exact MIPS (headline metric): the reference's retrieval-eval operating
  point (/root/reference/retrieval/eval_retrieval.py:98-104: FAISS
  IndexFlatIP, 128-d, top-80, ~2032 WebQuestions-test queries; BASELINE.md
  north star: >10k queries/sec on a v5e-8) at production corpus scale.
* corpus encode tok/s (workload #1, /root/reference/retrieval/get_embed.py:
  138-172): BERT-base context-tower inference, bf16 + flash attention.
* retriever train step ms (/root/reference/retrieval/train_retriever.py:
  198-231): 80-pair two-tower step (32-tok queries, 512-tok paragraphs),
  remat + tuned flash attention — the round-1 500 ms headline.

Correctness of the exact search is pinned by tests/test_mips.py; here we
verify a sample against naive device search and measure throughput.

Baseline for `vs_baseline`: the reference's CPU exact search modeled as
numpy `dot + argpartition` (BASELINE.json's description of eval_retrieval),
measured on a corpus slice on this host and scaled linearly to full N.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
Set BENCH_FAST=1 to skip the BERT sub-benches (MIPS only).
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
    return {"train_step_ms": round(float(np.median(times)) * 1e3, 1),
            "train_shape": f"{b}x({tq}q+{tc}c)"}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from proqa_tpu.ops.mips import mips_topk_reference
    from proqa_tpu.ops.pallas_mips import mips_topk_pallas_v2

    rng = np.random.default_rng(0)
    # generate f32 directly: float64 gen + cast costs ~2x RAM and wall on
    # this 1-core host (the driver's bench run shares it)
    xb = rng.standard_normal((N, D), dtype=np.float32)
    xq = rng.standard_normal((Q, D), dtype=np.float32)

    corpus = jax.device_put(jnp.asarray(xb, jnp.bfloat16))
    queries = jax.device_put(jnp.asarray(xq, jnp.bfloat16))

    def search():
        # round-2 pipeline, block/group tuned on v5e (tools/mips_v2_bench.py)
        return mips_topk_pallas_v2(
            queries, corpus, K, block=32, group=64, tile_q=512
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

    baseline_qps = _numpy_baseline_qps(xq, xb[:BASELINE_SLICE])

    detail = {
        "search_ms_amortized": round(dt * 1e3, 2),
        "search_ms_single_dispatch": round(dt_single * 1e3, 2),
        "self_recall": round(float(overlap), 4),
        "numpy_cpu_qps_scaled": round(baseline_qps, 2),
        "corpus": f"{N}x{D} bf16",
    }

    # free the 1 GiB corpus before the BERT sub-benches
    del corpus, queries, vals, idx

    if not os.environ.get("BENCH_FAST"):
        for sub in (_bench_encode, _bench_train_step):
            try:
                detail.update(sub())
            except Exception as e:  # a sub-bench failure must not hide the headline
                detail[sub.__name__ + "_error"] = f"{type(e).__name__}: {e}"[:200]

    result = {
        "metric": f"exact_mips_top{K}_qps_{N}x{D}",
        "value": round(qps, 1),
        "unit": "queries/sec/chip",
        "vs_baseline": round(qps / baseline_qps, 1),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
