"""Per-stage selection ablation of mips_topk_pallas_v2 on hardware: for each
of the three selection stages independently, flat lax.top_k (F) vs recursive
narrow-width exact_topk (H). Also a no-select floor variant (static slices)
to isolate kernel+gather+rescore cost.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/select_ablation.py
"""
from __future__ import annotations

import itertools
import json
import time

import numpy as np

N, D, Q, K = 4_194_304, 128, 2048, 80


def amortized_ms(fn, depth=10) -> float:
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

    from proqa_tpu.ops.pallas_mips import block_maxima_grouped, mips_topk_pallas_v2

    rng = np.random.default_rng(0)
    xb = rng.standard_normal((N, D), dtype=np.float32)
    corpus = jax.device_put(jnp.asarray(xb, jnp.bfloat16))
    del xb
    queries = jax.device_put(jnp.asarray(
        rng.standard_normal((Q, D), dtype=np.float32), jnp.bfloat16
    ))

    res = {}

    combos = [
        (False, False, False), (False, True, False), (False, False, True),
        (True, False, False), (True, True, True), (False, True, True),
        (True, True, False), (True, False, True),
    ]
    for combo in combos:
        name = "".join("H" if c else "F" for c in combo)
        fn = lambda: mips_topk_pallas_v2(
            queries, corpus, K, block=32, group=64, tile_q=512,
            fast_select=combo,
        )
        t0 = time.perf_counter()
        np.asarray(fn()[1][:1])
        compile_s = round(time.perf_counter() - t0, 1)
        res[name] = amortized_ms(fn)
        res[name + "_c"] = compile_s
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
