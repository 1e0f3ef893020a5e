"""Does Mosaic lower an int8 x int8 MXU dot at the v5e's 2x int8 rate
(394 TOPS vs 197 TFLOPS bf16)? If yes, stage-1 of the exact search can score
quantized queries against the int8 corpus at ~2x, with the exact bf16
rescore (kb widened for slack) keeping end recall ~1.0 — the remaining big
headline lever after the rescore DMA disproof (ROADMAP round 4).

Variants, interleaved in one process, amortized (kernel ONLY — no select/
rescore; this isolates the MXU question):

  bf16      _bmax3 body: bf16 corpus dot bf16 queries (production stage-1)
  i8cvt     int8 corpus converted to bf16 in-kernel + scale multiply
            (the shipped --int8-index kernel)
  i8dot     int8 corpus x int8 queries, preferred_element_type=int32,
            convert + scale multiply pre-max

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/int8_mxu_probe.py
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np

N, D, Q = 4_194_304, 128, 2048
BLOCK, GROUP, TILE_Q, SUB = 16, 128, 2048, 4
DEPTH = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from proqa_tpu.ops.pallas_mips import block_maxima_grouped
    from proqa_tpu.ops.quant import quantize_rows

    rng = np.random.default_rng(0)
    xb = rng.standard_normal((N, D), dtype=np.float32)
    q8, sc = quantize_rows(xb, block=BLOCK)   # per-block == kernel block
    corpus_bf16 = jax.device_put(jnp.asarray(xb, jnp.bfloat16))
    corpus_i8 = jax.device_put(jnp.asarray(q8))
    scales = jax.device_put(jnp.asarray(sc))
    del xb, q8
    qf = rng.standard_normal((Q, D), dtype=np.float32)
    queries = jax.device_put(jnp.asarray(qf, jnp.bfloat16))
    q_q8, q_sc = quantize_rows(qf)            # per-ROW query scales
    queries_i8 = jax.device_put(jnp.asarray(q_q8))

    # --- custom int8-dot kernel (same grid/layout as _bmax3_body; int32
    # accumulate, per-block scale post-max like the shipped scaled kernel;
    # the int32 max-reduce runs BEFORE the f32 convert, so the convert is
    # G*TQ not rows*TQ) ---
    def _i8_kernel(qt_ref, c_ref, sc_ref, b3_ref, g_ref, *, block, tq, group, sub):
        outs = []
        rows = group * block
        step = rows // sub
        for i in range(sub):
            s = jax.lax.dot_general(
                c_ref[i * step:(i + 1) * step], qt_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )                                                  # [step, TQ] i32
            outs.append(jnp.max(s.reshape(step // block, block, tq), axis=1))
        bm = outs[0] if sub == 1 else jnp.concatenate(outs, axis=0)
        bmt = bm.T.astype(jnp.float32) * sc_ref[0]             # [TQ, G]*[1, G]
        b3_ref[0] = bmt
        g_ref[0, 0] = jnp.max(bmt, axis=1)

    @functools.partial(jax.jit, static_argnames=("block", "group", "tile_q", "sub"))
    def i8dot_bmax(queries_i8, corpus_i8, scales, *, block, group, tile_q, sub):
        q, d = queries_i8.shape
        n = corpus_i8.shape[0]
        rows_per_group = group * block
        cg = n // rows_per_group
        qt = queries_i8.T
        kernel = functools.partial(
            _i8_kernel, block=block, tq=tile_q, group=group, sub=sub
        )
        return pl.pallas_call(
            kernel,
            grid=(q // tile_q, cg),
            in_specs=[
                pl.BlockSpec((d, tile_q), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((rows_per_group, d), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, group), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, tile_q, group), lambda i, j: (j, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tile_q), lambda i, j: (j, 0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((cg, q, group), jnp.float32),
                jax.ShapeDtypeStruct((cg, 1, q), jnp.float32),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * q * n * d,
                bytes_accessed=n * d + cg * q * (group + 1) * 4,
                transcendentals=0,
            ),
        )(qt, corpus_i8, scales.reshape(cg, 1, group))

    variants = {
        "bf16": lambda: block_maxima_grouped(
            queries, corpus_bf16, block=BLOCK, group=GROUP, tile_q=TILE_Q,
            sub_chunks=SUB,
        ),
        "i8cvt": lambda: block_maxima_grouped(
            queries, corpus_i8, block=BLOCK, group=GROUP, tile_q=TILE_Q,
            sub_chunks=SUB, scales=scales,
        ),
        "i8dot": lambda: i8dot_bmax(
            queries_i8, corpus_i8, scales, block=BLOCK, group=GROUP,
            tile_q=TILE_Q, sub=SUB,
        ),
    }

    res = {}
    for name, fn in variants.items():
        t0 = time.perf_counter()
        try:
            b3, g = fn()
            np.asarray(g[:1])
            res[name + "_compile_s"] = round(time.perf_counter() - t0, 1)
            for _ in range(4):
                b3, g = fn()
            np.asarray(g[:1, 0, :8])
        except Exception as e:
            res[name] = f"{type(e).__name__}: {e}"[:300]
            variants[name] = None
        print(json.dumps(res), flush=True)

    rounds = {name: [] for name in variants}
    for _ in range(3):
        for name, fn in variants.items():
            if fn is None:
                continue
            t0 = time.perf_counter()
            for _ in range(DEPTH):
                b3, g = fn()
            np.asarray(g[:1, 0, :8])
            rounds[name].append((time.perf_counter() - t0) / DEPTH * 1e3)
    for name, ts in rounds.items():
        if ts:
            res[name + "_ms"] = round(float(np.median(ts)), 2)
            res[name + "_all"] = [round(t, 1) for t in ts]

    # correctness spot check: i8dot block maxima == i8cvt block maxima
    # up to query-scale factor (i8dot scores use quantized queries)
    if variants.get("i8dot") and variants.get("i8cvt"):
        b3d, _ = variants["i8dot"]()
        scaled = np.asarray(b3d[0, :8]) * q_sc[:8, None]      # [8, G]
        b3c, _ = variants["i8cvt"]()
        approx = np.asarray(b3c[0, :8])
        err = np.abs(scaled - approx) / np.maximum(np.abs(approx), 1e-3)
        res["i8dot_rel_err_med"] = round(float(np.median(err)), 4)
    print("FINAL", json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
