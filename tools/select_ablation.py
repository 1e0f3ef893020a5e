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

    # floor: kernel + fixed gathers + rescore, selections replaced by slices
    @jax.jit
    def floor():
        b3, g = block_maxima_grouped(queries, corpus, block=32, group=64, tile_q=512)
        cg = b3.shape[0]
        top_groups = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None], (Q, K))
        q_iota = jnp.arange(Q, dtype=jnp.int32)[:, None]
        cand = b3[top_groups, q_iota]
        sel = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None], (Q, K))
        gsel = jnp.take_along_axis(top_groups, sel // 64, axis=1)
        top_blocks = gsel * 64 + sel % 64
        nb = corpus.shape[0] // 32
        cb = corpus.reshape(nb, 32, D)
        candr = jnp.take(cb, top_blocks, axis=0)
        s = jnp.einsum("qkbd,qd->qkb", candr.astype(queries.dtype), queries,
                       preferred_element_type=jnp.float32).reshape(Q, K * 32)
        vals = jax.lax.top_k(s, K)[0]
        return vals, (s[:, :1] + cand[:, 0, :1] + g.reshape(cg, Q).T[:, :1])

    t0 = time.perf_counter()
    res["floor_ms"] = amortized_ms(floor)
    res["floor_compile_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(res), flush=True)

    for combo in itertools.product([False, True], repeat=3):
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
