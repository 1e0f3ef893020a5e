"""Is the MIPS kernel's ~24 ms at the headline point MXU-bound? (round-4
VERDICT task 8: ">=75k qps or a recorded A/B showing the floor is real").

Three kernels, identical grid/specs/corpus traffic, interleaved in ONE
process at the headline point (4.2M x 128 bf16, Q=2048, block=16, group=128,
tile_q=2048, sub_chunks=4):

  full     the production _bmax3_kernel (dots + block max-reduce + transpose
           + group max, bmax3 [CG, Q, G] + gmax outputs)
  dotonly  the SAME dots, but the only post-processing is one [TQ, G]-shaped
           write derived with a single max over each sub-chunk's first block
           (keeps every dot live; removes ~15/16 of the VPU reduce work and
           the [G, TQ] concat+transpose)
  dotsum   dots reduced with jnp.sum over the block axis instead of max (VPU
           add versus max throughput check -- adds are 8-lane ALU ops too,
           so full==dotsum means the reduce op itself is not the issue)
  notrans  the FULL block max-reduce, but the [G, TQ] result written as-is
           to a [CG, G, Q]-layout output (no [TQ, G] transpose, no gmax) --
           isolates the transpose + second-output cost

Caveat on dotonly: its reduce consumes only the first 16 rows of each
sub-chunk's dot, so Mosaic MAY narrow the matmul (dead-code the other rows).
mxu_peak_ms is printed as the tripwire: dotonly below it means DCE fired and
the number is a lie -- trust notrans/dotsum instead.

If dotonly ~= full, the kernel is MXU/dot-bound and the remaining headline
gap is practical-MXU efficiency (the same ~50%-of-peak this stack delivers
on BERT matmuls) -- record the floor as real. If dotonly is meaningfully
faster, the reduce/transpose path still has headroom worth chasing.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/kernel_floor_probe.py
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np

N = 4_194_304
D = 128
Q = 2048
BLOCK, GROUP, TQ, SUB = 16, 128, 2048, 4
DEPTH = 10


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from proqa_tpu.ops.pallas_mips import block_maxima_grouped

    rows = GROUP * BLOCK
    cg = N // rows
    step = rows // SUB

    def _dot_kernel(qt_ref, c_ref, out_ref, *, reduce_op):
        # same dots as _bmax3_body; post-processing varies per variant
        acc = None
        for i in range(SUB):
            s = jnp.dot(
                c_ref[i * step:(i + 1) * step].astype(qt_ref.dtype), qt_ref[:],
                preferred_element_type=jnp.float32,
            )                                            # [step, TQ]
            if reduce_op == "max1":
                # one block-max per sub-chunk only (1/16 of the reduce work;
                # see the DCE caveat in the module docstring)
                r = jnp.max(s[:BLOCK], axis=0, keepdims=True)   # [1, TQ]
                acc = r if acc is None else jnp.maximum(acc, r)
            else:
                op = jnp.sum if reduce_op == "sum" else jnp.max
                r = op(s.reshape(step // BLOCK, BLOCK, TQ), axis=1)
                acc = r if acc is None else jnp.concatenate([acc, r], axis=0)
        if reduce_op == "notrans":
            out_ref[0] = acc                             # [G, TQ], no transpose
        elif reduce_op == "sum":
            out_ref[0] = acc.T                           # [TQ, G]
        else:
            out_ref[0] = jnp.broadcast_to(acc.T, (TQ, GROUP))

    def variant(reduce_op):
        kernel = functools.partial(_dot_kernel, reduce_op=reduce_op)
        if reduce_op == "notrans":
            out_specs = pl.BlockSpec((1, GROUP, TQ), lambda i, j: (j, 0, i),
                                     memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((cg, GROUP, Q), jnp.float32)
        else:
            out_specs = pl.BlockSpec((1, TQ, GROUP), lambda i, j: (j, i, 0),
                                     memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((cg, Q, GROUP), jnp.float32)

        @jax.jit
        def run(qt, corpus):
            return pl.pallas_call(
                kernel,
                grid=(Q // TQ, cg),
                in_specs=[
                    pl.BlockSpec((D, TQ), lambda i, j: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows, D), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=out_specs,
                out_shape=out_shape,
                cost_estimate=pl.CostEstimate(
                    flops=2 * Q * N * D,
                    bytes_accessed=N * D * 2 + cg * Q * GROUP * 4,
                    transcendentals=0,
                ),
            )(qt, corpus)

        return run

    key = jax.random.PRNGKey(0)
    corpus = jax.random.normal(key, (N, D), jnp.bfloat16)
    queries = jax.random.normal(jax.random.fold_in(key, 1), (Q, D), jnp.bfloat16)
    qt = queries.T

    runs = {
        "full": lambda: block_maxima_grouped(
            queries, corpus, block=BLOCK, group=GROUP, tile_q=TQ,
            sub_chunks=SUB,
        )[0],
        "notrans": (lambda f: lambda: f(qt, corpus))(variant("notrans")),
        "dotsum": (lambda f: lambda: f(qt, corpus))(variant("sum")),
        "dotonly": (lambda f: lambda: f(qt, corpus))(variant("max1")),
    }

    res = {}
    for name, fn in runs.items():
        t0 = time.perf_counter()
        np.asarray(fn()[:1, :1, :1])
        res[name + "_compile_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(res), flush=True)

    # warm-up round (first timed loop reads ~50% high on this stack)
    for fn in runs.values():
        for _ in range(3):
            out = fn()
        np.asarray(out[:1, :1, :1])

    rounds = {name: [] for name in runs}
    for _ in range(3):
        for name, fn in runs.items():
            t0 = time.perf_counter()
            for _ in range(DEPTH):
                out = fn()
            np.asarray(out[:1, :1, :1])
            rounds[name].append((time.perf_counter() - t0) / DEPTH * 1e3)
    for name, ts in rounds.items():
        res[name + "_ms"] = round(float(np.median(ts)), 2)
    res["mxu_peak_ms"] = round(2 * Q * N * D / 197e12 * 1e3, 2)
    res["dot_tf_s"] = round(2 * Q * N * D / (res["dotonly_ms"] / 1e3) / 1e12, 1)
    print("FINAL", json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
