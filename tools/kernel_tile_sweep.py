"""Sweep mips kernel tiling: the phase ablation showed the scoring kernel
itself is ~27 ms (2.2 TFLOP -> ~11 ms at peak), suggesting per-grid-step
overhead at 8192 small steps. Bigger (group, tile_q) tiles amortize it;
VMEM bound: s[G*B, TQ] f32 must fit (~<= 64 MB).

Measured kernel+select (ksel) style to avoid the 1 GiB-output
materialization artifact seen in select_ablation2.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/kernel_tile_sweep.py
"""
from __future__ import annotations

import json
import time

import numpy as np

N, D, Q, K = 4_194_304, 128, 2048, 80


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

    def ksel_fn(blk, grp, tq):
        @jax.jit
        def ksel(queries, corpus):
            b3, g = block_maxima_grouped(
                queries, corpus, block=blk, group=grp, tile_q=tq
            )
            cg = b3.shape[0]
            _, tg = jax.lax.top_k(g.reshape(cg, Q).T, K)
            tg = tg.astype(jnp.int32)
            q_iota = jnp.arange(Q, dtype=jnp.int32)[:, None]
            cand = b3[tg, q_iota]
            _, sel = jax.lax.top_k(cand.reshape(Q, K * grp), K)
            return jnp.take_along_axis(tg, sel // grp, axis=1) * grp + sel % grp

        return ksel

    def amortized(fn, depth=10):
        out = fn(queries, corpus)
        np.asarray(out[:1])
        t0 = time.perf_counter()
        for _ in range(depth):
            out = fn(queries, corpus)
        np.asarray(out)
        return round((time.perf_counter() - t0) / depth * 1e3, 2)

    configs = [
        (32, 64, 512),     # current default (baseline)
        (32, 64, 2048),
        (32, 128, 1024),
        (32, 128, 2048),
        (32, 256, 1024),
        (32, 256, 2048),
        (32, 512, 512),
        (32, 512, 1024),
    ]
    for blk, grp, tq in configs:
        name = f"ksel_b{blk}g{grp}t{tq}"
        smem = grp * blk * tq * 4 / 1e6
        t0 = time.perf_counter()
        try:
            res[name] = amortized(ksel_fn(blk, grp, tq))
            res[name + "_c"] = round(time.perf_counter() - t0, 1)
        except Exception as e:
            res[name] = f"{type(e).__name__}: {e}"[:120]
        res[name + "_sMB"] = round(smem, 1)
        print(json.dumps(res), flush=True)

    # full pipeline at the best-looking configs
    for blk, grp, tq in [(32, 64, 2048), (32, 128, 2048), (32, 256, 2048)]:
        name = f"full_b{blk}g{grp}t{tq}"
        fn = lambda q_, c_: mips_topk_pallas_v2(
            q_, c_, K, block=blk, group=grp, tile_q=tq, fast_select=False,
        )
        try:
            out = fn(queries, corpus)
            np.asarray(out[1][:1])
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(queries, corpus)
            np.asarray(out[1])
            res[name] = round((time.perf_counter() - t0) / 10 * 1e3, 2)
        except Exception as e:
            res[name] = f"{type(e).__name__}: {e}"[:120]
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
