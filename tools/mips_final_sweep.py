"""Final round-3 MIPS config sweep: tile_q=2048 established (-3 ms);
now block size trades rescore gather volume (kb*block rows/query) against
bmax3 write traffic ([N/(G*B), Q, G] f32). rows_per_group pinned at 2048.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/mips_final_sweep.py
"""
from __future__ import annotations

import json
import time

import numpy as np

N, D, Q, K = 4_194_304, 128, 2048, 80


def main():
    import jax
    import jax.numpy as jnp

    from proqa_tpu.ops.mips import mips_topk_reference
    from proqa_tpu.ops.pallas_mips import mips_topk_pallas_v2

    rng = np.random.default_rng(0)
    xb = rng.standard_normal((N, D), dtype=np.float32)
    corpus = jax.device_put(jnp.asarray(xb, jnp.bfloat16))
    del xb
    queries = jax.device_put(jnp.asarray(
        rng.standard_normal((Q, D), dtype=np.float32), jnp.bfloat16
    ))
    res = {}

    def full(q_, c_, blk, grp):
        return mips_topk_pallas_v2(
            q_, c_, K, block=blk, group=grp, tile_q=2048, fast_select=False,
        )

    best = None
    for blk, grp in [(32, 64), (16, 128), (8, 256), (16, 64)]:
        name = f"full_b{blk}g{grp}t2048"
        try:
            out = full(queries, corpus, blk, grp)
            np.asarray(out[1][:1])
            for r in range(2):
                t0 = time.perf_counter()
                for _ in range(10):
                    out = full(queries, corpus, blk, grp)
                np.asarray(out[1])
                res[f"{name}_r{r}"] = round((time.perf_counter() - t0) / 10 * 1e3, 2)
            ms = res[f"{name}_r1"]
            if best is None or ms < best[1]:
                best = ((blk, grp), ms, out)
        except Exception as e:
            res[name] = f"{type(e).__name__}: {e}"[:120]
        print(json.dumps(res), flush=True)

    # exactness spot check at the best config
    (blk, grp), ms, out = best
    sub = 64
    rv, ri = mips_topk_reference(queries[:sub], corpus, K)
    got, want = np.asarray(out[1][:sub]), np.asarray(ri)
    res["best"] = f"b{blk}g{grp}"
    res["best_ms"] = ms
    res["best_qps"] = round(Q / ms * 1e3, 0)
    res["self_recall"] = round(float(np.mean(
        [len(set(got[i]) & set(want[i])) / K for i in range(sub)]
    )), 5)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
