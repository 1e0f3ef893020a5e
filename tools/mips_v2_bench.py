"""A/B the v1 vs v2 exact-MIPS pipelines at the headline operating point on
the real chip (amortized timing; single-dispatch numbers are tunnel-dominated).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/mips_v2_bench.py
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np

N, D, Q, K = 4_194_304, 128, 2048, 80


def _force(out):
    import jax

    for leaf in jax.tree.leaves(out):
        np.asarray(leaf[:1])
        leaf.block_until_ready()


def amortized_ms(fn, *args, depth: int = 16) -> float:
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(depth):
        out = fn(*args)
    _force(out)
    return round((time.perf_counter() - t0) / depth * 1e3, 2)


def main():
    import jax
    import jax.numpy as jnp

    from proqa_tpu.ops.mips import mips_topk_reference
    from proqa_tpu.ops.pallas_mips import mips_topk_pallas, mips_topk_pallas_v2

    rng = np.random.default_rng(0)
    corpus = jax.device_put(
        jnp.asarray(rng.standard_normal((N, D)).astype(np.float32), jnp.bfloat16)
    )
    queries = jax.device_put(
        jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32), jnp.bfloat16)
    )
    res = {}
    res["null"] = amortized_ms(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))

    v1 = functools.partial(
        mips_topk_pallas, k=K, block=64, kb=80, q_chunk=512, tile_q=512
    )
    res["v1_b64_kb80"] = amortized_ms(v1, queries, corpus)

    variants = [
        ("v2_b32_g128", dict(block=32, group=128)),
        ("v2_b32_g64", dict(block=32, group=64)),
        ("v2_b64_g64", dict(block=64, group=64)),
        ("v2_b32_g128_tq256", dict(block=32, group=128, tile_q=256)),
    ]
    for name, kw in variants:
        fn = functools.partial(
            mips_topk_pallas_v2, k=K, **({"tile_q": 512} | kw)
        )
        res[name] = amortized_ms(fn, queries, corpus)
        print(json.dumps(res), flush=True)

    # correctness spot check for the default v2 config
    vals, idx = mips_topk_pallas_v2(queries, corpus, K, block=32, group=128, tile_q=512)
    rv, ri = mips_topk_reference(queries[:64], corpus, K)
    got, want = np.asarray(idx[:64]), np.asarray(ri)
    res["v2_recall"] = round(
        float(np.mean([len(set(got[i]) & set(want[i])) / K for i in range(64)])), 4
    )
    print("FINAL", json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
