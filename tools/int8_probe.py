"""Probe: XLA-fused dot+blockmax vs the pallas MIPS kernel; bf16 vs int8.

The exact-MIPS pallas kernel computes scores + two-level maxima in situ at
~92 TF/s effective. Question 1: can plain XLA (dot fused with a reshape
block-max, never materializing the [Q, N] score matrix) match or beat that?
Question 2: does int8 buy the ~2x the v5e spec sheet promises?

CAUTION (learned here): a probe consuming only s[i,i] gets the whole matmul
elided by the slice-of-dot simplifier and reads the dispatch floor. Every
variant below returns the full [Q, N/block] block-maxima AND a scalar
checksum depending on all of it; the checksum is what's forced.

Run: python tools/int8_probe.py
"""
from __future__ import annotations

import json
import time

import numpy as np

BLOCK = 16


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    Q, D, C, CHUNKS = 2048, 128, 1 << 19, 8  # total N = 4.19M
    rng = np.random.default_rng(0)
    q = rng.standard_normal((Q, D)).astype(np.float32)
    chunks = [rng.standard_normal((C, D)).astype(np.float32) for _ in range(CHUNKS)]

    q_bf = jnp.asarray(q, jnp.bfloat16)
    c_bf = [jnp.asarray(c, jnp.bfloat16) for c in chunks]
    q_i8 = jnp.asarray(np.clip(np.round(q * 40), -127, 127), jnp.int8)
    c_i8 = [jnp.asarray(np.clip(np.round(c * 40), -127, 127), jnp.int8) for c in chunks]

    def blockmax_bf(qx, *cs):
        outs = []
        for cx in cs:
            s = lax.dot_general(
                qx, cx, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Q, C]
            outs.append(s.reshape(Q, C // BLOCK, BLOCK).max(-1))
        bmax = jnp.concatenate(outs, axis=1)          # [Q, N/BLOCK] f32
        return bmax, bmax.max()

    def blockmax_i8(qx, *cs):
        outs = []
        for cx in cs:
            s = lax.dot_general(
                qx, cx, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            outs.append(s.reshape(Q, C // BLOCK, BLOCK).max(-1))
        bmax = jnp.concatenate(outs, axis=1)          # [Q, N/BLOCK] i32
        return bmax, bmax.max()

    fns = {
        "xla_bf16_blockmax": (jax.jit(blockmax_bf), (q_bf, *c_bf)),
        "xla_int8_blockmax": (jax.jit(blockmax_i8), (q_i8, *c_i8)),
    }

    flops = 2 * Q * D * C * CHUNKS
    out = {}
    for name, (fn, args) in fns.items():
        r = fn(*args)
        np.asarray(r[1])  # compile
        r = fn(*args)
        np.asarray(r[1])  # warm
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        np.asarray(r[1])
        dt = (time.perf_counter() - t0) / reps
        out[name] = {"ms": round(dt * 1e3, 2), "tops": round(flops / dt / 1e12, 1)}
        print(name, out[name], flush=True)

    # reference point: the pallas v2 kernel phase at the same operating point
    from proqa_tpu.ops.pallas_mips import mips_topk_pallas_v2

    corpus = jnp.concatenate(c_bf, axis=0)
    fn = jax.jit(lambda qq, cc: mips_topk_pallas_v2(qq, cc, 80)[0])
    r = fn(q_bf, corpus); np.asarray(r)
    r = fn(q_bf, corpus); np.asarray(r)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(q_bf, corpus)
    np.asarray(r)
    out["pallas_v2_full_topk"] = {"ms": round((time.perf_counter() - t0) / reps * 1e3, 2)}
    print("pallas_v2_full_topk", out["pallas_v2_full_topk"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
