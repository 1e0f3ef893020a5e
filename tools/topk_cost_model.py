"""In-pipeline marginal cost of selection primitives vs width.

Standalone micro-benches are floored by the tunnel's fixed dispatch cost
(4-10 ms, CLAUDE.md), so instead: run R chained repeats of the primitive
inside ONE jit (data rolled between repeats to defeat CSE) and report
(t(R=hi) - t(R=lo)) / (hi - lo) — the true marginal cost.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/topk_cost_model.py
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np

Q, K = 2048, 80
LO, HI = 2, 8


def chained(primitive, r):
    """jit(x -> accumulated primitive over r de-CSE'd variants)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fn(x):
        acc = jnp.zeros((Q,), jnp.float32)
        for i in range(r):
            xv = jnp.roll(x, i + 1, axis=1) + acc[:, None]  # serialize chain
            out = primitive(xv)
            acc = acc + out
        return acc

    return fn


def marg_ms(primitive, x, depth=8):
    import numpy as np
    fn_lo, fn_hi = chained(primitive, LO), chained(primitive, HI)
    res = []
    for fn in (fn_lo, fn_hi):
        out = fn(x)
        np.asarray(out[:1])
        t0 = time.perf_counter()
        for _ in range(depth):
            out = fn(x)
        np.asarray(out[:1])
        res.append((time.perf_counter() - t0) / depth * 1e3)
    return round((res[1] - res[0]) / (HI - LO), 2)


def main():
    import jax
    import jax.numpy as jnp

    def p_indexed(xv):
        v, i = jax.lax.top_k(xv, K)
        return v[:, 0] + i[:, -1].astype(jnp.float32)

    def p_valsonly(xv):
        return jax.lax.top_k(xv, K)[0][:, -1]

    def p_approx(xv):
        v, i = jax.lax.approx_max_k(xv, K)
        return v[:, 0] + i[:, -1].astype(jnp.float32)

    def p_approx2k(xv):
        v, i = jax.lax.approx_max_k(xv, 2 * K, recall_target=0.9)
        return v[:, 0] + i[:, -1].astype(jnp.float32)

    def p_scatter_compact(xv):
        # threshold by approx kb-th, compact via cumsum + scatter
        t = jax.lax.approx_max_k(xv, K)[0][:, -1]
        mask = xv >= t[:, None]
        r = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
        r = jnp.where(mask, jnp.minimum(r, 2 * K - 1), 2 * K)
        pos = jnp.broadcast_to(
            jnp.arange(xv.shape[1], dtype=jnp.int32)[None], xv.shape
        )
        out = jnp.zeros((Q, 2 * K + 1), jnp.int32).at[
            jnp.arange(Q)[:, None], r
        ].set(pos, mode="drop")
        return out[:, 0].astype(jnp.float32)

    rng = np.random.default_rng(0)
    res = {}
    prims = {
        "indexed": p_indexed, "valsonly": p_valsonly, "approx": p_approx,
        "approx2k": p_approx2k, "scatcomp": p_scatter_compact,
    }
    for w in (256, 512, 1024, 2048, 5120, 8192):
        x = jax.device_put(jnp.asarray(
            rng.standard_normal((Q, w)), jnp.float32
        ))
        for name, p in prims.items():
            try:
                res[f"{name}_{w}"] = marg_ms(p, x)
            except Exception as e:
                res[f"{name}_{w}"] = f"{type(e).__name__}"[:40]
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
