"""Warm QA serving latency: per-question wall time of the answer path
(encode -> top-eval_k search -> read eval_k paras -> span decode) on the
shared 6k-para qa_world, after compiles. This is the `proqa serve` /
`answer --stdin` steady-state cost per request on one chip.

NOTE: trainer.answer rides eval_load, which retrieves only k=eval_k
candidates (reference predict semantics, online_sampler.py:274) — the
sampler cfg's `candidates` budget applies to the TRAIN path only, so these
p50/p95 are top-5-retrieval numbers, not top-5000.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/serve_latency.py
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))


def measure(w=None, tiny: bool = False, n_questions: int = 24) -> dict:
    """Warm per-question /answer latency dict (p50/p95/mean) on qa_world.
    Importable by bench.py so the driver-tracked serving numbers and this
    tool measure the identical workload."""
    import jax
    import jax.numpy as jnp

    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.reader import QAConfig
    from proqa_tpu.qa.sampler import OnlineSampler, OnlineSamplerConfig
    from proqa_tpu.train.qa_trainer import QATrainer, QATrainerConfig
    from qa_world import build_qa_world

    jax.config.update("jax_default_prng_impl", "rbg")
    if w is None:
        w = build_qa_world()

    on_tpu = jax.default_backend() == "tpu"
    cfg = BertConfig(dtype=jnp.bfloat16, remat=True, flash_attention=on_tpu)
    L, qL, cand = 512, 30, 5000
    if tiny:  # CPU smoke: TINY=1 python tools/serve_latency.py
        cfg = BertConfig.tiny(dtype=jnp.float32)
        L, qL, cand = 64, 12, 64
    scfg = OnlineSamplerConfig(
        max_query_length=qL, max_length=L, candidates=cand,
        question_batch=1, num_workers=0,
    )
    tcfg = QATrainerConfig(
        learning_rate=1e-5, questions_per_batch=1, train_k=5, eval_k=5,
        num_train_epochs=1, eval_period=-1, prefetch_batches=0,
        output_dir=os.path.join(w["root"], "serve_run"),
    )
    trainer = QATrainer(cfg, QAConfig(shared_norm=True), tcfg)
    trainer.set_corpus(w["index"])

    def ask(q: str):
        sampler = OnlineSampler(
            [{"question": q}], w["tok"], w["db"], w["index"], scfg
        )
        return trainer.answer(sampler, topn=1)

    qs = [f"what is tok{i} about tok{i+1}" for i in range(n_questions)]
    ask(qs[0])  # compiles
    ask(qs[1])  # first warm loop reads high — throw away
    lat = []
    for q in qs[2:]:
        t0 = time.perf_counter()
        rows = ask(q)
        lat.append((time.perf_counter() - t0) * 1e3)
        assert rows and rows[0]["answer"] is not None
    lat = np.asarray(lat)
    return {
        "serve_p50_ms": round(float(np.percentile(lat, 50)), 1),
        "serve_p95_ms": round(float(np.percentile(lat, 95)), 1),
        "serve_mean_ms": round(float(lat.mean()), 1),
        "n": len(lat),
    }


def main():
    import jax

    if os.environ.get("TINY"):
        # env vars are too late (axon sitecustomize imports jax first) —
        # force the local CPU before any backend query or TINY still pays
        # remote TPU compiles through the tunnel
        jax.config.update("jax_platforms", "cpu")
    print("FINAL", json.dumps(measure(tiny=bool(os.environ.get("TINY")))))


if __name__ == "__main__":
    main()
