"""Interleaved sub_chunks A/B at the 33.6M-row MIPS point (block=64,
group=128). The 16M A/B (tools/big_mips_ab.py) showed ~1024-2048-row
dot+reduce chains beat 512-row ones; 33M's sub=16 gives 512-row chains —
check 4 (2048) and 8 (1024)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from proqa_tpu.ops.pallas_mips import mips_topk_pallas_v2

N, D, Q, K = 8 * 4_194_304, 128, 2048, 80
REPS, ROUNDS = 3, 3

rng = np.random.default_rng(7)
# donated in-place slice updates (bench.py's pattern): a concatenate of live
# parts needs 2x 8.6 GiB simultaneously and OOMs the 16 GiB HBM
place = jax.jit(
    lambda c, p, i: jax.lax.dynamic_update_slice(c, p, (i, jnp.int32(0))),
    donate_argnums=0,
)
corpus = jnp.zeros((N, D), jnp.bfloat16)
chunk = N // 16
for pi in range(16):
    part = jnp.asarray(
        rng.standard_normal((chunk, D), dtype=np.float32), jnp.bfloat16
    )
    corpus = place(corpus, part, jnp.int32(pi * chunk))
    del part
queries = jax.device_put(jnp.asarray(
    rng.standard_normal((Q, D), dtype=np.float32), jnp.bfloat16
))

CFGS = {"s4": 4, "s8": 8, "s16": 16}


def run(sub):
    return mips_topk_pallas_v2(
        queries, corpus, K, block=64, group=128, tile_q=2048, sub_chunks=sub
    )


for name, sub in CFGS.items():
    v, i = run(sub)
    np.asarray(i[:1])
    print(f"compiled {name}", flush=True)
for name, sub in CFGS.items():
    for _ in range(REPS):
        v, i = run(sub)
    np.asarray(i[:1])

res = {n: [] for n in CFGS}
for r in range(ROUNDS):
    for name, sub in CFGS.items():
        t0 = time.perf_counter()
        for _ in range(REPS):
            v, i = run(sub)
        np.asarray(i)
        res[name].append((time.perf_counter() - t0) / REPS * 1e3)
    print(f"round {r}: " + " ".join(
        f"{n}={res[n][-1]:.1f}" for n in CFGS), flush=True)

for name in CFGS:
    med = float(np.median(res[name]))
    print(f"FINAL {name}: {med:.2f} ms  ({Q / med * 1e3:.0f} qps)", flush=True)
