"""Fused attention kernel (ops/pallas_attention.py) vs the vanilla path.

Runs the kernel in interpret mode on CPU. Dropout-rate-0 must be *exactly*
the vanilla attention math (same f32 softmax, same masking); gradients must
match autodiff through the reference formulation. The dropout>0 path needs
hardware PRNG (the interpreter returns zero bits) and is validated on the
real chip by tools/attention_tpu_check.py.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proqa_tpu.models.bert import BertConfig, bert_encoder, init_bert_params
from proqa_tpu.ops.pallas_attention import fused_attention


def _ref_attention(q, k, v, mask, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale + jnp.where(mask[:, None, None, :] != 0, 0.0, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(q.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_reference(dtype):
    b, h, t, dh = 2, 3, 128, 64
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, t, dh)), dtype) for _ in range(3)
    )
    mask = jnp.asarray(rng.integers(0, 2, (b, t)) | (np.arange(t) < 4), jnp.int32)
    scale = 1.0 / math.sqrt(dh)
    out = fused_attention(q, k, v, mask, sm_scale=scale, interpret=True)
    want = _ref_attention(q, k, v, mask, scale)
    tol = 0 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32), atol=tol
    )


def test_fused_grads_match_reference():
    b, h, t, dh = 2, 2, 128, 64
    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.float32)
        for _ in range(3)
    )
    mask = jnp.asarray(rng.integers(0, 2, (b, t)) | (np.arange(t) < 4), jnp.int32)
    scale = 1.0 / math.sqrt(dh)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a) * 0.3))

    fused = lambda q, k, v: fused_attention(q, k, v, mask, sm_scale=scale, interpret=True)
    ref = lambda q, k, v: _ref_attention(q, k, v, mask, scale)
    g1 = jax.grad(loss(fused), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(ref), argnums=(0, 1, 2))(q, k, v)
    for a, want in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(want), atol=1e-5)


def test_bert_flash_path_matches_vanilla():
    """Full encoder with flash_attention on a 128-multiple sequence equals the
    vanilla path (deterministic; the masking semantics are identical)."""
    cfg_v = BertConfig.tiny(max_position_embeddings=128, dtype=jnp.float32)
    cfg_f = BertConfig.tiny(
        max_position_embeddings=128, dtype=jnp.float32, flash_attention=True
    )
    params = init_bert_params(jax.random.PRNGKey(0), cfg_v)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(5, cfg_v.vocab_size, (2, 128)), jnp.int32)
    mask = jnp.asarray(
        np.arange(128)[None, :] < np.array([[60], [128]]), jnp.int32
    )
    seq_v, pool_v = bert_encoder(params, cfg_v, ids, mask)
    seq_f, pool_f = bert_encoder(params, cfg_f, ids, mask)
    # only valid positions must agree (pad rows see identical masked softmax
    # in both paths, but compare where it matters)
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(seq_f)[valid], np.asarray(seq_v)[valid], atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(pool_f), np.asarray(pool_v), atol=1e-5)


def test_bert_flash_grads_match_vanilla():
    cfg_v = BertConfig.tiny(max_position_embeddings=128, dtype=jnp.float32)
    cfg_f = BertConfig.tiny(
        max_position_embeddings=128, dtype=jnp.float32, flash_attention=True
    )
    params = init_bert_params(jax.random.PRNGKey(0), cfg_v)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(5, cfg_v.vocab_size, (2, 128)), jnp.int32)
    mask = jnp.ones((2, 128), jnp.int32)

    def loss(cfg):
        def f(p):
            _, pooled = bert_encoder(p, cfg, ids, mask)
            return jnp.sum(pooled**2)
        return f

    g_v = jax.grad(loss(cfg_v))(params)
    g_f = jax.grad(loss(cfg_f))(params)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_v)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fused_dropout_interpret_keeps_everything():
    """Documents the interpreter limitation: its PRNG returns ZERO bits, so
    the signed-threshold keep test (si >= rate*2^32 - 2^31, negative for
    rate < 0.5) keeps every position — output is the no-dropout result
    scaled by 1/(1-rate). Guards the dropout code path end-to-end (fwd+bwd);
    real mask statistics are validated on hardware by
    tools/attention_tpu_check.py."""
    b, h, t, dh = 1, 2, 128, 64
    rate = 0.1
    rng = np.random.default_rng(4)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.float32)
        for _ in range(3)
    )
    mask = jnp.ones((b, t), jnp.int32)
    fn = lambda q: fused_attention(
        q, k, v, mask, sm_scale=0.125, dropout_rate=rate,
        dropout_rng=jax.random.PRNGKey(0), interpret=True,
    )
    out, grads = jax.value_and_grad(lambda q: jnp.sum(fn(q)))(q)
    nodrop = fused_attention(q, k, v, mask, sm_scale=0.125, interpret=True)
    np.testing.assert_allclose(
        float(out), float(jnp.sum(nodrop)) / (1.0 - rate), rtol=1e-5
    )
    assert np.all(np.isfinite(np.asarray(grads)))
