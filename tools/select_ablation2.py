"""Phase-level decomposition of mips_topk_pallas_v2 at the headline point:
kernel-only vs kernel+select vs full, plus block/group variants. The
stage-level ablation (select_ablation.py) showed the three top_ks are ~free
in situ — find where the other ~25 ms actually goes.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/select_ablation2.py
"""
from __future__ import annotations

import json
import time

import numpy as np

N, D, Q, K = 4_194_304, 128, 2048, 80


def amortized_ms(fn, *args, depth=10) -> float:
    out = fn(*args)
    np.asarray(jax_leaf(out)[:1])
    t0 = time.perf_counter()
    for _ in range(depth):
        out = fn(*args)
    np.asarray(jax_leaf(out))
    return round((time.perf_counter() - t0) / depth * 1e3, 2)


def jax_leaf(out):
    import jax

    return jax.tree.leaves(out)[-1]


def main():
    import functools

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

    def run(name, fn, *args):
        t0 = time.perf_counter()
        try:
            res[name] = amortized_ms(fn, *args)
            res[name + "_c"] = round(time.perf_counter() - t0, 1)
        except Exception as e:
            res[name] = f"{type(e).__name__}: {e}"[:140]
        print(json.dumps(res), flush=True)

    # kernel only (arrays as ARGS — baking them in ships the 1 GiB corpus
    # in the compile payload, CLAUDE.md)
    for blk, grp in [(32, 64), (32, 128), (64, 64), (128, 32)]:
        run(
            f"kernel_b{blk}g{grp}",
            jax.jit(functools.partial(
                block_maxima_grouped, block=blk, group=grp, tile_q=512,
            )),
            queries, corpus,
        )

    # kernel + select stages (no rescore): replicate v2 up to top_blocks
    @jax.jit
    def ksel(queries, corpus):
        b3, g = block_maxima_grouped(queries, corpus, block=32, group=64, tile_q=512)
        cg = b3.shape[0]
        _, tg = jax.lax.top_k(g.reshape(cg, Q).T, K)
        tg = tg.astype(jnp.int32)
        q_iota = jnp.arange(Q, dtype=jnp.int32)[:, None]
        cand = b3[tg, q_iota]
        _, sel = jax.lax.top_k(cand.reshape(Q, K * 64), K)
        gsel = jnp.take_along_axis(tg, sel // 64, axis=1)
        return gsel * 64 + sel % 64

    run("kernel_sel", ksel, queries, corpus)

    # full pipeline variants
    for blk, grp in [(32, 64), (64, 64), (128, 32)]:
        run(
            f"full_b{blk}g{grp}",
            lambda q_, c_, blk=blk, grp=grp: mips_topk_pallas_v2(
                q_, c_, K, block=blk, group=grp, tile_q=512, fast_select=False,
            ),
            queries, corpus,
        )


if __name__ == "__main__":
    main()
