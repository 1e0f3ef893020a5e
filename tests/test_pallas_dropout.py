"""Fused dropout op (ops/pallas_dropout.py) — interpret-mode behavior.

The interpreter's PRNG returns zero bits, so every element is KEPT (the
signed threshold rate*2^32 - 2^31 is negative for rate < 0.5): interpret
output == x / (1-rate) exactly, and the custom VJP must be consistent with
that. Hardware mask statistics are validated by tools/dropout_tpu_check.py
(drop rate 0.1002, exact scale, VJP mask replay, remat-grad parity on v5e).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proqa_tpu.ops.pallas_dropout import pallas_dropout


def test_rate_zero_is_identity():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((16, 128)), jnp.float32)
    out = pallas_dropout(x, jax.random.PRNGKey(0), 0.0, interpret=True)
    assert out is x


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_interpret_keeps_all_scaled(dtype):
    rate = 0.1
    x = jnp.asarray(np.random.default_rng(1).standard_normal((64, 256)), dtype)
    out = pallas_dropout(x, jax.random.PRNGKey(3), rate, interpret=True)
    want = (np.asarray(x, np.float32) * (1.0 / (1.0 - rate))).astype(
        np.asarray(x).dtype
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), want.astype(np.float32), rtol=1e-6
    )


def test_vjp_consistent_with_forward():
    rate = 0.25
    x = jnp.asarray(np.random.default_rng(2).standard_normal((32, 128)), jnp.float32)
    g = jnp.asarray(np.random.default_rng(3).standard_normal((32, 128)), jnp.float32)
    key = jax.random.PRNGKey(5)
    _, vjp = jax.vjp(lambda xx: pallas_dropout(xx, key, rate, interpret=True), x)
    (dx,) = vjp(g)
    # interpret: all kept => grad == g / (1 - rate), exactly forward-consistent
    np.testing.assert_allclose(np.asarray(dx), np.asarray(g) / (1 - rate), rtol=1e-6)


def test_3d_shape_roundtrip():
    x = jnp.asarray(np.random.default_rng(4).standard_normal((4, 16, 128)), jnp.bfloat16)
    out = pallas_dropout(x, jax.random.PRNGKey(7), 0.1, interpret=True)
    assert out.shape == x.shape and out.dtype == x.dtype


def test_under_scan():
    """The op must trace and differentiate under lax.scan (how bert uses it).
    NOTE: the TPU-simulating interpreter implements the PRNG via IO-effect
    callbacks, which jax.checkpoint's partial-eval rejects — so remat
    compatibility cannot be tested interpreted; it is validated COMPILED on
    hardware by tools/dropout_tpu_check.py (remat-grad parity check)."""
    key = jax.random.PRNGKey(9)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((8, 128)), jnp.float32)

    def layer(x, k):
        return pallas_dropout(x * 2.0, k, 0.1, interpret=True), None

    def loss(x):
        keys = jax.random.split(key, 3)
        y, _ = jax.lax.scan(layer, x, keys)
        return jnp.sum(y**2)

    v, g = jax.value_and_grad(loss)(x)
    assert np.isfinite(v) and np.all(np.isfinite(np.asarray(g)))
