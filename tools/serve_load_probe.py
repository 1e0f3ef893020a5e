"""Serving throughput under load: micro-batched vs one-at-a-time dispatch.

Measures, on the shared 6k-para qa_world (tools/qa_world.py — identical
workload to serve_latency.py's p50/p95):

  serial_qps   — 16 questions answered one answer() call each (what round-3
                 serving did under its device lock: every request pays a full
                 encode+search + reader dispatch);
  batch16_qps  — the same 16 questions in ONE answer() call over a
                 pad_buckets sampler with question_batch=16 (what a loaded
                 `proqa serve` does after one MicroBatcher drain: one
                 encode+search + one 16-row reader forward);
  http_qps     — end-to-end: a real make_qa_server + 16 concurrent HTTP
                 clients x R rounds through the MicroBatcher (includes the
                 1-core host's thread scheduling, so it's a lower bound).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/serve_load_probe.py
CPU smoke: TINY=1 python tools/serve_load_probe.py
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

N_LOAD = 16


def measure(w=None, tiny: bool = False, rounds: int = 4,
            http: bool = True) -> dict:
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
    if tiny:
        cfg = BertConfig.tiny(dtype=jnp.float32)
        L, qL, cand = 64, 12, 64
    scfg = OnlineSamplerConfig(
        max_query_length=qL, max_length=L, candidates=cand,
        question_batch=N_LOAD, pad_buckets=True, num_workers=0,
    )
    tcfg = QATrainerConfig(
        learning_rate=1e-5, questions_per_batch=1, train_k=5, eval_k=5,
        num_train_epochs=1, eval_period=-1, prefetch_batches=0,
        output_dir=os.path.join(w["root"], "serve_load_run"),
    )
    trainer = QATrainer(cfg, QAConfig(shared_norm=True), tcfg)
    trainer.set_corpus(w["index"])

    def sampler_for(qs: list[str]):
        return OnlineSampler(
            [{"question": q} for q in qs], w["tok"], w["db"], w["index"], scfg
        )

    qs = [f"what is tok{i} about tok{i+1}" for i in range(N_LOAD)]
    # warm both signatures (bucket 1 and bucket N_LOAD)
    trainer.answer(sampler_for(qs[:1]), topn=1)
    trainer.answer(sampler_for(qs), topn=1)
    trainer.answer(sampler_for(qs), topn=1)  # first timed loop reads high

    t0 = time.perf_counter()
    for _ in range(rounds):
        for q in qs:
            trainer.answer(sampler_for([q]), topn=1)
    serial_s = (time.perf_counter() - t0) / rounds

    t0 = time.perf_counter()
    for _ in range(rounds):
        rows = trainer.answer(sampler_for(qs), topn=1)
    batch_s = (time.perf_counter() - t0) / rounds
    assert len(rows) == N_LOAD and all(r["answer"] is not None for r in rows)

    out = {
        "serve_serial_qps": round(N_LOAD / serial_s, 2),
        "serve_batch16_qps": round(N_LOAD / batch_s, 2),
        "serve_batch_speedup": round(serial_s / batch_s, 2),
        "n_load": N_LOAD,
        "rounds": rounds,
    }
    if not http:
        return out

    # end-to-end HTTP through the MicroBatcher
    import urllib.request

    from proqa_tpu.serving import make_qa_server

    server = make_qa_server(
        trainer, lambda raw: OnlineSampler(
            raw, w["tok"], w["db"], w["index"], scfg),
        host="127.0.0.1", port=0, max_batch=N_LOAD,
    )
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()
    host, port = server.server_address[:2]

    def client(q: str, out: list):
        body = json.dumps({"question": q, "topn": 1}).encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/answer", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            out.append(json.loads(r.read()))

    results: list = []
    client(qs[0], results)  # warm the HTTP path
    t0 = time.perf_counter()
    for _ in range(rounds):
        threads = [
            threading.Thread(target=client, args=(q, results)) for q in qs
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    http_s = (time.perf_counter() - t0) / rounds
    stats = json.loads(urllib.request.urlopen(
        f"http://{host}:{port}/stats", timeout=60).read())
    server.shutdown()
    server.server_close()
    assert len(results) == 1 + rounds * N_LOAD

    out["serve_http_load_qps"] = round(N_LOAD / http_s, 2)
    out["microbatcher_stats"] = stats
    return out


def main():
    import jax

    if os.environ.get("TINY"):
        jax.config.update("jax_platforms", "cpu")
    print("FINAL", json.dumps(measure(tiny=bool(os.environ.get("TINY")))))


if __name__ == "__main__":
    main()
