"""int8-index hardware probe (round 4): does the scaled kernel
(_bmax3_kernel_scaled: int8 rows -> bf16 convert + per-row scale multiply
before the block max-reduce) compile on v5e, what does it cost vs the bf16
pipeline at the headline point, and what recall does the int8 representation
deliver against the bf16 index's ground truth?

Variants interleaved in ONE process (CLAUDE.md: cross-process drift 40%+),
amortized over back-to-back dispatches:

  bf16    mips_topk_pallas_v2 on the bf16 corpus (production headline)
  int8    mips_topk_pallas_v2(scales=...) on the quantized corpus

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/int8_probe.py
"""
from __future__ import annotations

import json
import time

import numpy as np

N, D, Q, K = 4_194_304, 128, 2048, 80
BLOCK, GROUP, TILE_Q, SUB = 16, 128, 2048, 4
DEPTH = 8


def main():
    import jax
    import jax.numpy as jnp

    from proqa_tpu.ops.mips import mips_topk_reference
    from proqa_tpu.ops.pallas_mips import mips_topk_pallas_v2
    from proqa_tpu.ops.quant import quantize_rows

    rng = np.random.default_rng(0)
    xb = rng.standard_normal((N, D), dtype=np.float32)
    q8, sc = quantize_rows(xb, block=BLOCK)   # per-block == kernel block
    corpus_bf16 = jax.device_put(jnp.asarray(xb, jnp.bfloat16))
    corpus_i8 = jax.device_put(jnp.asarray(q8))
    scales = jax.device_put(jnp.asarray(sc))
    del xb, q8
    queries = jax.device_put(jnp.asarray(
        rng.standard_normal((Q, D), dtype=np.float32), jnp.bfloat16
    ))

    variants = {
        "bf16": lambda: mips_topk_pallas_v2(
            queries, corpus_bf16, K, block=BLOCK, group=GROUP,
            tile_q=TILE_Q, sub_chunks=SUB,
        ),
        "int8": lambda: mips_topk_pallas_v2(
            queries, corpus_i8, K, block=BLOCK, group=GROUP,
            tile_q=TILE_Q, sub_chunks=SUB, scales=scales,
        ),
    }

    res = {}
    outs = {}
    for name, fn in variants.items():
        t0 = time.perf_counter()
        try:
            v, i = fn()
            np.asarray(i[:1])
            res[name + "_compile_s"] = round(time.perf_counter() - t0, 1)
            for _ in range(4):   # throwaway warm round (first loop reads high)
                v, i = fn()
            np.asarray(i)
            outs[name] = (np.asarray(v), np.asarray(i))
        except Exception as e:
            res[name] = f"{type(e).__name__}: {e}"[:300]
            variants[name] = None
        print(json.dumps(res), flush=True)

    rounds = {name: [] for name in variants}
    for _ in range(3):
        for name, fn in variants.items():
            if fn is None:
                continue
            t0 = time.perf_counter()
            for _ in range(DEPTH):
                v, i = fn()
            np.asarray(i)
            rounds[name].append((time.perf_counter() - t0) / DEPTH * 1e3)
    for name, ts in rounds.items():
        if ts:
            res[name + "_ms"] = round(float(np.median(ts)), 2)
            res[name + "_all"] = [round(t, 1) for t in ts]

    # recall of int8 vs the bf16 pipeline's own results, and both vs an
    # exact bf16 reference on a query subset
    if all(v is not None for v in variants.values()):
        bi, ii = outs["bf16"][1], outs["int8"][1]
        res["int8_vs_bf16_recall"] = round(float(np.mean(
            [len(set(ii[r]) & set(bi[r])) / K for r in range(Q)]
        )), 4)
        sub = 64
        _, ri = mips_topk_reference(queries[:sub], corpus_bf16, K)
        ri = np.asarray(ri)
        for name in ("bf16", "int8"):
            gi = outs[name][1]
            res[name + "_self_recall"] = round(float(np.mean(
                [len(set(gi[r]) & set(ri[r])) / K for r in range(sub)]
            )), 4)
    print("FINAL", json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
