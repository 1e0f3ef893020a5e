"""Production QA candidate retrieval (top-5000 of 4.2M, the reference's IVF
nlist=100/nprobe=20 operating point — online_sampler.py:75-79,113): cost and
recall of mips_topk_chunked_approx at sampler batch sizes.

Why not slab IVF here: at the reference's 20% scan fraction the on-device
slab gather materializes scan_fraction x corpus per query batch (~34 GB at
4.2M) — the streaming full-scan approx path reads the corpus once at full
HBM bandwidth instead and is exact-ish (recall measured below); IVF pays
only at ~1-2% scan fractions.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/qa_retrieval_probe.py
"""
from __future__ import annotations

import json
import time

import numpy as np

N, D, M = 4_194_304, 128, 5000


def main():
    import jax
    import jax.numpy as jnp

    from proqa_tpu.ops.mips import mips_topk_chunked_approx

    rng = np.random.default_rng(0)
    xb = rng.standard_normal((N, D), dtype=np.float32)
    corpus = jax.device_put(jnp.asarray(xb, jnp.bfloat16))
    res = {}

    for B in (8, 32):
        xq = rng.standard_normal((B, D), dtype=np.float32)
        queries = jax.device_put(jnp.asarray(xq, jnp.bfloat16))
        fn = lambda: mips_topk_chunked_approx(queries, corpus, M)
        vals, idx = fn()
        np.asarray(idx[:1])
        t0 = time.perf_counter()
        for _ in range(8):
            vals, idx = fn()
        np.asarray(idx)
        ms = (time.perf_counter() - t0) / 8 * 1e3
        res[f"top5000_B{B}_ms"] = round(ms, 1)
        res[f"top5000_B{B}_qps"] = round(B / ms * 1e3, 1)

        # exact recall on host (bf16-rounded scoring to match device inputs)
        xb16 = np.asarray(corpus[: N], np.float32)  # device bf16 -> f32
        sc = np.asarray(queries, np.float32) @ xb16.T
        exact = np.argpartition(-sc, M, axis=1)[:, :M]
        got = np.asarray(idx)
        rec = np.mean([
            len(set(got[i].tolist()) & set(exact[i].tolist())) / M
            for i in range(B)
        ])
        res[f"top5000_B{B}_recall"] = round(float(rec), 4)
        del xb16, sc
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
