"""Streaming candidate-block scorer: interpreter-mode correctness vs numpy."""
import numpy as np
import pytest

import jax.numpy as jnp

from proqa_tpu.ops.pallas_gather_score import gather_score


def test_gather_score_matches_numpy():
    rng = np.random.default_rng(0)
    q, d, nb, block, kb = 16, 128, 32, 64, 4
    corpus = rng.standard_normal((nb, block, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    ids = rng.integers(0, nb, size=(q, kb)).astype(np.int32)

    out = np.asarray(gather_score(
        jnp.asarray(queries), jnp.asarray(corpus), jnp.asarray(ids),
        block=block, qb=8, jb=2, interpret=True,
    ))
    want = np.zeros((q, kb * block), np.float32)
    for qi in range(q):
        for j in range(kb):
            want[qi, j * block : (j + 1) * block] = corpus[ids[qi, j]] @ queries[qi]
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
