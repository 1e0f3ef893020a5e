"""Clean amortized costs of the selection primitives on the real chip:
lax.top_k at the shapes the MIPS pipeline uses, sort, approx_max_k, and the
fancy-index gather of the v2 select. Decides whether a custom Pallas
selection kernel is worth building.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/topk_probe.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def _force(out):
    import jax

    for leaf in jax.tree.leaves(out):
        np.asarray(leaf[:1])
        leaf.block_until_ready()


def amortized_ms(fn, *args, depth: int = 8) -> float:
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

    rng = np.random.default_rng(0)
    res = {}
    K = 80

    for rows, cols in [(2048, 512), (2048, 2048), (2048, 2560), (2048, 10240), (512, 5120)]:
        x = jax.device_put(jnp.asarray(rng.standard_normal((rows, cols)), jnp.float32))
        res[f"topk_{rows}x{cols}"] = amortized_ms(
            jax.jit(lambda a: jax.lax.top_k(a, K)), x
        )
        res[f"topk_vals_only_{rows}x{cols}"] = amortized_ms(
            jax.jit(lambda a: jax.lax.top_k(a, K)[0]), x
        )
        if cols <= 2560:
            res[f"sortdesc_{rows}x{cols}"] = amortized_ms(
                jax.jit(lambda a: jax.lax.sort(a)), x
            )
        res[f"approxmax_{rows}x{cols}"] = amortized_ms(
            jax.jit(lambda a: jax.lax.approx_max_k(a, K)), x
        )
        print(json.dumps(res), flush=True)

    # argmax-iteration alternative at the small select-A shape
    x = jax.device_put(jnp.asarray(rng.standard_normal((2048, 512)), jnp.float32))

    @jax.jit
    def iter_topk(a):
        def body(carry, _):
            a = carry
            i = jnp.argmax(a, axis=-1)
            v = jnp.take_along_axis(a, i[:, None], axis=-1)
            a = jnp.where(jnp.arange(a.shape[-1])[None, :] == i[:, None], -3e38, a)
            return a, (v[:, 0], i.astype(jnp.int32))

        _, (vs, isx) = jax.lax.scan(body, a, None, length=K)
        return vs.T, isx.T

    res["itertopk_2048x512"] = amortized_ms(iter_topk, x)

    # v2 fancy gather: bmax3[tg, q_iota] at G=128 and G=32
    for cg, g in [(512, 128), (2048, 32)]:
        bmax3 = jax.device_put(
            jnp.asarray(rng.standard_normal((cg, 2048, g)), jnp.float32)
        )
        tg = jax.device_put(
            jnp.asarray(rng.integers(0, cg, (2048, K)), jnp.int32)
        )

        @jax.jit
        def fgather(b3, tg):
            q_iota = jnp.arange(2048, dtype=jnp.int32)[:, None]
            return b3[tg, q_iota]

        res[f"fancy_gather_cg{cg}_g{g}"] = amortized_ms(fgather, bmax3, tg)
        del bmax3

    # phase-2 style block gather: take(corpus_blocks, ids) at b=32 and b=64
    for block in (32, 64):
        nb = 4_194_304 // block
        cb = jax.device_put(
            jnp.asarray(
                rng.standard_normal((nb, block, 128)).astype(np.float32), jnp.bfloat16
            )
        )
        ids = jax.device_put(jnp.asarray(rng.integers(0, nb, (512, K)), jnp.int32))
        res[f"block_gather_b{block}_512xK"] = amortized_ms(
            jax.jit(lambda cb, ids: jnp.take(cb, ids, axis=0)), cb, ids
        )
        cand = jnp.take(cb, ids, axis=0)
        qc = jax.device_put(
            jnp.asarray(rng.standard_normal((512, 128)).astype(np.float32), jnp.bfloat16)
        )
        res[f"rescore_einsum_b{block}"] = amortized_ms(
            jax.jit(
                lambda c, q: jnp.einsum(
                    "qkbd,qd->qkb", c, q, preferred_element_type=jnp.float32
                )
            ),
            cand, qc,
        )
        del cb, cand

    res["null"] = amortized_ms(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print("FINAL", json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
