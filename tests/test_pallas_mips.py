"""Pallas fused block-max kernel: interpreter-mode correctness vs numpy and
the exact search path end-to-end."""
import numpy as np
import pytest

import jax.numpy as jnp

from proqa_tpu.ops.mips import mips_topk_reference
from proqa_tpu.ops.pallas_mips import block_maxima, mips_topk_pallas


def test_block_maxima_matches_numpy():
    rng = np.random.default_rng(0)
    q, n, d, block = 256, 4096, 128, 256
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.float32)
    corpus = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    bm = block_maxima(queries, corpus, block=block, tile_n=1024, tile_q=256, interpret=True)
    scores = np.asarray(queries) @ np.asarray(corpus).T            # [Q, N]
    want = scores.reshape(q, n // block, block).max(-1).T          # [NB, Q]
    np.testing.assert_allclose(np.asarray(bm), want, rtol=1e-4, atol=1e-4)


def test_mips_topk_pallas_exact():
    rng = np.random.default_rng(1)
    q, n, d, k = 256, 8192, 128, 37
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.float32)
    corpus = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    rv, ri = mips_topk_reference(queries, corpus, k)
    pv, pi = mips_topk_pallas(
        queries, corpus, k, block=256, kb=64, q_chunk=256,
        tile_n=1024, tile_q=256, interpret=True,
    )
    rv, ri, pv, pi = map(np.asarray, (rv, ri, pv, pi))
    # rankings may flip only where scores are within rounding of each other
    mismatch = ri != pi
    np.testing.assert_allclose(pv, rv, rtol=1e-5, atol=1e-4)
    assert (np.abs(pv[mismatch] - rv[mismatch]) < 1e-3).all()
    assert mismatch.mean() < 0.001


def test_mips_topk_pallas_padding_masked():
    """Corpus not a tile multiple: padded rows/blocks must never surface."""
    rng = np.random.default_rng(2)
    q, n, d, k = 256, 3000, 64, 16
    # strongly negative scores so zero-padding would win if unmasked
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.float32)
    corpus = jnp.asarray(-np.abs(rng.standard_normal((n, d))), jnp.float32)
    queries_pos = jnp.asarray(np.abs(np.asarray(queries)), jnp.float32)
    rv, ri = mips_topk_reference(queries_pos, corpus, k)
    pv, pi = mips_topk_pallas(
        queries_pos, corpus, k, block=128, kb=32, q_chunk=256,
        tile_n=512, tile_q=256, interpret=True,
    )
    assert int(np.max(np.asarray(pi))) < n
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri))
