"""Exact-MIPS scaling probe at 8x the headline corpus: 33.6M x 128 bf16
(8.6 GiB HBM index — half the v5e's HBM in the index alone). Extends the
4.2M -> 16.8M scaling curve one more doubling; block must be >=64 here so
the stage-1 block-maxima buffer (N/block * Qpad * 4 B) stays ~4.3 GiB.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/mips_33m_probe.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from proqa_tpu.ops.mips import mips_topk_reference
    from proqa_tpu.ops.pallas_mips import mips_topk_pallas_v2

    N, D, Q, K = 33_554_432, 128, 2048, 80
    rng = np.random.default_rng(0)
    # Assemble by donated in-place slice updates into ONE preallocated
    # [N, D] buffer: a jnp.concatenate of 16 live parts would need
    # parts (8.6 GiB) + output (8.6 GiB) simultaneously — over the v5e's
    # 16 GiB HBM. Donation keeps peak at buffer + one 0.54 GiB part.
    place = jax.jit(  # traced start index: ONE compile for all 16 slices
        lambda c, p, i: jax.lax.dynamic_update_slice(c, p, (i, jnp.int32(0))),
        donate_argnums=0,
    )
    corpus = jnp.zeros((N, D), jnp.bfloat16)
    chunk = N // 16  # slice the host->device build to bound host RAM too
    for i in range(16):
        part = jnp.asarray(
            rng.standard_normal((chunk, D)).astype(np.float32), jnp.bfloat16
        )
        corpus = place(corpus, part, jnp.int32(i * chunk))
        del part
    queries = jax.device_put(jnp.asarray(
        rng.standard_normal((Q, D)).astype(np.float32), jnp.bfloat16
    ))

    fn = lambda: mips_topk_pallas_v2(queries, corpus, K, block=64, group=64, tile_q=512)
    vals, idx = fn()
    np.asarray(idx.reshape(-1)[:1])
    t0 = time.perf_counter()
    for _ in range(12):
        vals, idx = fn()
    np.asarray(idx.reshape(-1)[:1])
    idx.block_until_ready()
    ms = (time.perf_counter() - t0) / 12 * 1e3

    rv, ri = mips_topk_reference(queries[:32], corpus, K)
    got, want = np.asarray(idx[:32]), np.asarray(ri)
    recall = float(np.mean([len(set(got[i]) & set(want[i])) / K for i in range(32)]))
    print("FINAL", json.dumps({
        "mips33M_ms": round(ms, 2),
        "mips33M_qps": round(Q / ms * 1e3, 0),
        "mips33M_recall": round(recall, 4),
    }))


if __name__ == "__main__":
    main()
