"""Interleaved A/B of 16.8M-row MIPS kernel configs (round 4).

The per-block-int8 batch unified group=128 across the big-MIPS benches for
HBM-envelope reasons and the 16M number moved 75.8 -> 95.7 ms — but that
was across sessions (tunnel drift is +-15-20%). This probe times the four
(group, sub_chunks) combos chained-repeat interleaved IN ONE PROCESS, the
only timing methodology that has held up on this stack (CLAUDE.md).

Memory check: at block=32 / N=16.8M, bmax3 is [CG, Q, G]; G=64 lane-pads to
128 -> 8.6 GiB + 4.3 GiB corpus = 12.9 GiB, fits. (33.6M cannot afford the
G=64 padding; this question only exists at the 16M point.)
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from proqa_tpu.ops.pallas_mips import mips_topk_pallas_v2

N, D, Q, K = 4 * 4_194_304, 128, 2048, 80
REPS, ROUNDS = 4, 3

rng = np.random.default_rng(7)
parts = [
    jax.device_put(jnp.asarray(
        rng.standard_normal((N // 8, D), dtype=np.float32), jnp.bfloat16
    ))
    for _ in range(8)
]
corpus = jnp.concatenate(parts)
del parts
queries = jax.device_put(jnp.asarray(
    rng.standard_normal((Q, D), dtype=np.float32), jnp.bfloat16
))

CFGS = {
    "g64_s4": dict(group=64, sub_chunks=4),
    "g128_s8": dict(group=128, sub_chunks=8),
    "g128_s4": dict(group=128, sub_chunks=4),
    "g64_s8": dict(group=64, sub_chunks=8),
}


def run(cfg):
    return mips_topk_pallas_v2(
        queries, corpus, K, block=32, tile_q=2048, **cfg
    )


# compile + first-loop warm-up (first timed loop reads ~50% high)
for name, cfg in CFGS.items():
    v, i = run(cfg)
    np.asarray(i[:1])
    print(f"compiled {name}", flush=True)
for name, cfg in CFGS.items():
    for _ in range(REPS):
        v, i = run(cfg)
    np.asarray(i[:1])

res = {n: [] for n in CFGS}
for r in range(ROUNDS):
    for name, cfg in CFGS.items():
        t0 = time.perf_counter()
        for _ in range(REPS):
            v, i = run(cfg)
        np.asarray(i)
        res[name].append((time.perf_counter() - t0) / REPS * 1e3)
    print(f"round {r}: " + " ".join(
        f"{n}={res[n][-1]:.1f}" for n in CFGS), flush=True)

for name in CFGS:
    med = float(np.median(res[name]))
    print(f"FINAL {name}: {med:.2f} ms  ({Q / med * 1e3:.0f} qps)", flush=True)
