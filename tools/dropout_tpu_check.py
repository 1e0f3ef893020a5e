"""Hardware validation of the fused dropout op (real TPU only; the
interpreter PRNG returns zero bits => keeps everything).

Checks: determinism per seed, drop-rate statistics, exact fwd semantics
(kept elements scaled by 1/(1-rate) in f32, dropped exactly zero), and
exact fwd/bwd mask replay via the linearity identity
<g, D(x+dx) - D(x)> == <VJP(g), dx> (dropout is linear given the mask).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/dropout_tpu_check.py
"""
from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from proqa_tpu.ops.pallas_dropout import pallas_dropout

    assert jax.default_backend() == "tpu"
    RATE = 0.1
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4096, 768)) + 5.0, jnp.float32)  # no zeros
    key = jax.random.PRNGKey(11)

    f = jax.jit(lambda x, k: pallas_dropout(x, k, RATE))
    y = np.asarray(f(x, key))
    assert np.array_equal(y, np.asarray(f(x, key))), "same seed must replay"
    y2 = np.asarray(f(x, jax.random.PRNGKey(12)))
    assert not np.array_equal(y, y2), "different seed must differ"
    print("determinism: ok")

    dropped = y == 0.0
    frac = float(dropped.mean())
    print(f"drop fraction: {frac:.4f} (target {RATE})")
    assert abs(frac - RATE) < 0.01

    want_kept = np.asarray(x, np.float32) * np.float32(1.0 / (1.0 - RATE))
    err = np.max(np.abs(y[~dropped] - want_kept[~dropped]))
    print(f"kept-element scale max err: {err:.2e}")
    assert err < 1e-5

    g = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    dx = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)

    @jax.jit
    def lin(x, dx, g, k):
        lhs = jnp.vdot(g, pallas_dropout(x + dx, k, RATE) - pallas_dropout(x, k, RATE))
        _, vjp = jax.vjp(lambda xx: pallas_dropout(xx, k, RATE), x)
        return lhs, jnp.vdot(vjp(g)[0], dx)

    l, r = map(float, lin(x, dx, g, key))
    rel = abs(l - r) / max(abs(l), 1e-9)
    print(f"VJP linearity identity rel err: {rel:.2e}")
    assert rel < 1e-5, "backward does not replay the forward mask"

    # under jax.checkpoint (remat) the recomputed forward must stay identical
    @jax.jit
    def remat_loss(x, k):
        fn = jax.checkpoint(lambda x: jnp.sum(pallas_dropout(x, k, RATE) ** 2))
        return jax.value_and_grad(fn)(x)

    v, gr = remat_loss(x, key)
    gr = np.asarray(gr)
    # grad = 2*D(D... grad of sum(D(x)^2) = 2 * inv^2 * x on kept, 0 dropped
    inv2 = np.float32(1.0 / (1.0 - RATE)) ** 2
    want = np.where(dropped, 0.0, 2.0 * inv2 * np.asarray(x))
    err = np.max(np.abs(gr - want))
    print(f"remat grad max err: {err:.2e}")
    assert err < 1e-3
    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
