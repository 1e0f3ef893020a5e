"""A/B the round-3 recursive narrow-width hierarchical selection
(ops.mips.exact_topk, fast_select=True) against the round-2 flat
lax.top_k selection inside mips_topk_pallas_v2, interleaved in one process
(per CLAUDE.md: cross-process timings drift; first timed loop reads high).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/fast_select_probe.py
"""
from __future__ import annotations

import json
import time

import numpy as np

N, D, Q, K = 4_194_304, 128, 2048, 80


def amortized_ms(fn, depth=12) -> float:
    out = fn()
    np.asarray(out[1][:1])
    t0 = time.perf_counter()
    for _ in range(depth):
        out = fn()
    np.asarray(out[1])
    return round((time.perf_counter() - t0) / depth * 1e3, 2)


def main():
    import jax
    import jax.numpy as jnp

    from proqa_tpu.ops.mips import mips_topk_reference
    from proqa_tpu.ops.pallas_mips import mips_topk_pallas_v2

    rng = np.random.default_rng(0)
    xb = rng.standard_normal((N, D), dtype=np.float32)
    xq = rng.standard_normal((Q, D), dtype=np.float32)
    corpus = jax.device_put(jnp.asarray(xb, jnp.bfloat16))
    queries = jax.device_put(jnp.asarray(xq, jnp.bfloat16))
    del xb

    def run(fast):
        return mips_topk_pallas_v2(
            queries, corpus, K, block=32, group=64, tile_q=512,
            fast_select=fast,
        )

    res = {}
    # compile both first
    for fast in (True, False):
        t0 = time.perf_counter()
        np.asarray(run(fast)[1][:1])
        res[f"compile_s_fast{int(fast)}"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(res), flush=True)
    # throwaway warm round (first timed loop reads ~50% high)
    amortized_ms(lambda: run(True), depth=4)
    # interleaved A/B, 3 rounds
    for r in range(3):
        res[f"fast_ms_r{r}"] = amortized_ms(lambda: run(True))
        res[f"old_ms_r{r}"] = amortized_ms(lambda: run(False))
        print(json.dumps(res), flush=True)

    # recall check on a subsample
    sub = 64
    rv, ri = mips_topk_reference(queries[:sub], corpus, K)
    got = np.asarray(run(True)[1][:sub])
    want = np.asarray(ri)
    res["self_recall_fast"] = round(float(np.mean(
        [len(set(got[i]) & set(want[i])) / K for i in range(sub)]
    )), 5)
    vals_got = np.asarray(run(True)[0][:sub])
    np.testing.assert_allclose(vals_got, np.asarray(rv), rtol=1e-5, atol=1e-5)
    res["vals_match"] = True
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
