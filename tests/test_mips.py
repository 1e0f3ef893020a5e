"""MIPS top-k correctness: exact block-max path must match the naive
reference bit-for-bit on the returned index sets; approx path must reach its
recall target. Property-tested per SURVEY.md §4."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from proqa_tpu.ops.mips import (
    NEG_INF,
    mips_topk,
    mips_topk_blockmax,
    mips_topk_chunked_approx,
    mips_topk_reference,
)


def _data(n, q, d=16, seed=0):
    rng = np.random.default_rng(seed)
    # distinct scores with overwhelming probability -> unique top-k sets
    corpus = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.float32)
    return queries, corpus


@pytest.mark.parametrize("n,k,block,kb", [
    (4096, 13, 64, 16),
    (4096, 64, 64, 64),
    (5000, 80, 128, 80),   # non-multiple N exercises padding
    (2048, 100, 256, 100),
])
def test_blockmax_exact(n, k, block, kb):
    queries, corpus = _data(n, 8)
    rv, ri = mips_topk_reference(queries, corpus, k)
    bv, bi = mips_topk_blockmax(queries, corpus, k, block=block, kb=kb, q_chunk=8)
    np.testing.assert_allclose(np.asarray(bv), np.asarray(rv), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(ri))


def test_blockmax_adversarial_sorted_corpus():
    """All the best rows packed into one block: phase-2 must dig k deep."""
    q, d, n, k = 4, 8, 2048, 32
    rng = np.random.default_rng(1)
    direction = rng.standard_normal((d,))
    direction /= np.linalg.norm(direction)
    mags = np.sort(rng.uniform(0.1, 10.0, size=n))[::-1]
    corpus = np.outer(mags, direction) + 1e-3 * rng.standard_normal((n, d))
    queries = np.tile(direction, (q, 1)) + 1e-3 * rng.standard_normal((q, d))
    corpus, queries = jnp.asarray(corpus, jnp.float32), jnp.asarray(queries, jnp.float32)
    rv, ri = mips_topk_reference(queries, corpus, k)
    bv, bi = mips_topk_blockmax(queries, corpus, k, block=64, kb=32, q_chunk=4)
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(ri))


def test_blockmax_query_chunking():
    queries, corpus = _data(3000, 32)
    rv, ri = mips_topk_reference(queries, corpus, 10)
    bv, bi = mips_topk_blockmax(queries, corpus, 10, block=128, kb=16, q_chunk=8)
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(ri))


def test_chunked_approx_recall():
    queries, corpus = _data(1 << 15, 16, seed=2)
    k = 512
    rv, ri = mips_topk_reference(queries, corpus, k)
    av, ai = mips_topk_chunked_approx(queries, corpus, k, chunk=1 << 13, recall_target=0.95)
    ri, ai = np.asarray(ri), np.asarray(ai)
    recalls = [len(set(ri[i]) & set(ai[i])) / k for i in range(ri.shape[0])]
    assert np.mean(recalls) >= 0.95, np.mean(recalls)
    # values must be genuine scores, descending
    av = np.asarray(av)
    assert (np.diff(av, axis=1) <= 1e-6).all()


def test_dispatch_small_n():
    queries, corpus = _data(1000, 4)
    v, i = mips_topk(queries, corpus, 5)
    rv, ri = mips_topk_reference(queries, corpus, 5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_bf16_corpus():
    """Search works with a bf16 HBM-resident corpus (the production layout)."""
    rng = np.random.default_rng(3)
    corpus = jnp.asarray(rng.standard_normal((4096, 32)), jnp.bfloat16)
    queries = jnp.asarray(rng.standard_normal((8, 32)), jnp.bfloat16)
    bv, bi = mips_topk_blockmax(queries, corpus, 16, block=64, kb=16, q_chunk=8)
    rv, ri = mips_topk_reference(queries, corpus, 16)
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(ri))


def test_exact_topk_hierarchical():
    from proqa_tpu.ops.mips import exact_topk
    rng = np.random.default_rng(7)
    scores = jnp.asarray(rng.standard_normal((16, 5000)), jnp.float32)
    for k, group in [(13, None), (80, 16), (128, 64), (7, 8)]:
        rv, ri = jax.lax.top_k(scores, k)
        v, i = exact_topk(scores, k, group=group)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        np.testing.assert_allclose(np.asarray(v), np.asarray(rv))


def test_exact_topk_adversarial_one_group():
    """All top values packed into one group still come out exactly."""
    from proqa_tpu.ops.mips import exact_topk
    scores = np.zeros((2, 1024), np.float32)
    scores[:, 100:120] = np.arange(20, 0, -1)
    v, i = exact_topk(jnp.asarray(scores), 16, group=32)
    rv, ri = jax.lax.top_k(jnp.asarray(scores), 16)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_padded_rows_never_returned_when_k_exceeds_valid():
    """k > n_valid: the tail must follow the (NEG_INF, row 0) degenerate
    contract — a padded row's index through IdMap.rows_to_ids would hit a
    wrong or out-of-range document."""
    rng = np.random.default_rng(11)
    corpus = jnp.asarray(np.vstack([
        rng.standard_normal((5, 16)).astype(np.float32),
        np.zeros((3, 16), np.float32),       # pre-padded rows
    ]))
    q = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    for fn in (
        lambda: mips_topk_reference(q, corpus, 8, n_valid=5),
        lambda: mips_topk(q, corpus, 8, n_valid=5),
    ):
        vals, idx = fn()
        vals, idx = np.asarray(vals), np.asarray(idx)
        pad = vals <= float(NEG_INF)
        assert pad[:, 5:].all()             # only 5 real rows exist
        assert (idx[pad] == 0).all()        # never a padded row's index
        assert (idx < 5).all()


# ---------------- int8 quantized corpus (round 4, ops/quant.py) ----------------

def test_quantize_roundtrip_and_chunking():
    from proqa_tpu.ops.quant import dequantize_rows, quantize_rows
    rng = np.random.default_rng(30)
    emb = rng.standard_normal((100, 16)).astype(np.float32)
    emb *= rng.uniform(0.1, 10.0, (100, 1)).astype(np.float32)  # varied norms
    emb[7] = 0.0                                                # zero row
    q8, sc = quantize_rows(emb, chunk=32)                       # ragged chunks
    assert q8.dtype == np.int8 and sc.dtype == np.float32
    assert np.abs(q8).max() <= 127 and sc[7] == 1.0
    deq = dequantize_rows(q8, sc)
    # per-row error bound: half a quantization step = max|row| / 254
    bound = np.maximum(np.abs(emb).max(axis=1), 1e-9) / 254 + 1e-7
    assert (np.abs(deq - emb).max(axis=1) <= bound).all()


def test_quantize_per_block():
    """block > 1: one scale per block of rows; partial tail block scaled
    over its real rows; chunking cannot split blocks."""
    from proqa_tpu.ops.quant import dequantize_rows, expand_scales, quantize_rows
    rng = np.random.default_rng(33)
    n, d, block = 75, 16, 16                      # ragged tail block of 11
    emb = (rng.standard_normal((n, d)) * rng.uniform(0.1, 10.0, (n, 1))).astype(np.float32)
    q8, sc = quantize_rows(emb, block=block, chunk=37)   # chunk rounds to 32
    assert sc.shape == (5,)
    # scale is the block absmax / 127
    for b in range(5):
        rows = emb[b * block : (b + 1) * block]
        np.testing.assert_allclose(sc[b], np.abs(rows).max() / 127, rtol=1e-6)
    deq = dequantize_rows(q8, sc, block=block)
    bound = expand_scales(sc, block, n) / 2 + 1e-7
    assert (np.abs(deq - emb).max(axis=1) <= bound).all()
    # matches an unchunked quantization bit-for-bit
    q8b, scb = quantize_rows(emb, block=block)
    np.testing.assert_array_equal(q8, q8b)
    np.testing.assert_array_equal(sc, scb)


@pytest.mark.parametrize("path", ["reference", "blockmax", "approx"])
def test_int8_scales_match_dequantized_search(path):
    """Every scales-aware search path returns exactly the top-k of the
    DEQUANTIZED corpus (the scaled quantized scores ARE those scores)."""
    from proqa_tpu.ops.quant import dequantize_rows, quantize_rows
    rng = np.random.default_rng(31)
    n, d, q, k = 3000, 128, 16, 10
    emb = (rng.standard_normal((n, d)) * rng.uniform(0.5, 2.0, (n, 1))).astype(np.float32)
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.float32)
    q8, sc = quantize_rows(emb)
    want_v, want_i = mips_topk_reference(
        queries, jnp.asarray(dequantize_rows(q8, sc)), k
    )
    corp, scj = jnp.asarray(q8), jnp.asarray(sc)
    if path == "reference":
        got_v, got_i = mips_topk_reference(queries, corp, k, scales=scj)
    elif path == "blockmax":
        got_v, got_i = mips_topk_blockmax(queries, corp, k, block=256, scales=scj)
    else:
        got_v, got_i = mips_topk_chunked_approx(queries, corp, k, chunk=1024, scales=scj)
        # approx: recall >= target rather than equality
        rec = np.mean([
            len(set(np.asarray(got_i)[r]) & set(np.asarray(want_i)[r])) / k
            for r in range(q)
        ])
        assert rec >= 0.95
        return
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-5, atol=1e-5)


def test_int8_dispatch_small_and_blockmax():
    """mips_topk threads scales through both the naive and large-N paths."""
    from proqa_tpu.ops.quant import dequantize_rows, quantize_rows
    rng = np.random.default_rng(32)
    for n in (2048, 6000):   # <=4096 naive; >4096 blockmax (cpu backend)
        emb = (rng.standard_normal((n, 128)) * rng.uniform(0.5, 2.0, (n, 1))).astype(np.float32)
        queries = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
        q8, sc = quantize_rows(emb)
        want_v, want_i = mips_topk_reference(
            queries, jnp.asarray(dequantize_rows(q8, sc)), 7
        )
        got_v, got_i = mips_topk(queries, jnp.asarray(q8), 7, scales=jnp.asarray(sc))
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
