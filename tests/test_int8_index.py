"""int8-quantized DenseIndex (round 4): half-footprint storage whose
searches are exact w.r.t. the quantized scores — the index-level contract is
bit-equality with searching the DEQUANTIZED matrix, across construction,
incremental add, tombstone removal, compaction, persistence, and the fused
encode+search path. Capacity motivation: 67.2M rows/chip at D=128 (ops/quant.py).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from proqa_tpu.index.dense import DenseIndex
from proqa_tpu.index.idmap import IdMap
from proqa_tpu.ops.mips import mips_topk_reference
from proqa_tpu.ops.quant import dequantize_rows, quantize_rows


def _world(n=3000, d=128, q=8, seed=0):
    rng = np.random.default_rng(seed)
    emb = (rng.standard_normal((n, d)) * rng.uniform(0.5, 2.0, (n, 1))).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    return emb, queries


def _truth(emb, queries, k):
    """Ground truth at the index's scoring precision: queries cast to bf16
    (the production scoring dtype for int8 corpora), scales applied — the
    naive reference path over the SAME quantized representation."""
    q8, sc = quantize_rows(emb)
    v, i = mips_topk_reference(
        jnp.asarray(queries, jnp.bfloat16), jnp.asarray(q8), k,
        scales=jnp.asarray(sc),
    )
    return np.asarray(v), np.asarray(i)


def test_int8_index_search_matches_dequantized():
    # n > 4096 so the index dispatches the blockmax path, NOT the same naive
    # reference the truth uses (tautology guard)
    emb, queries = _world(n=6000)
    idx = DenseIndex.from_embeddings(emb, dtype="int8")
    assert idx.is_quantized and idx.embeddings.dtype == jnp.int8
    assert idx.scales.shape[0] == idx.embeddings.shape[0]
    want_v, want_i = _truth(emb, queries, 10)
    got_v, got_i = idx.search(queries, 10)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_v, want_v, rtol=1e-5, atol=1e-5)
    # quality sanity vs the full-precision float truth: int8+bf16 rounding
    # moves values <0.5% and the returned sets overlap heavily
    q8, sc = quantize_rows(emb)
    fv, fi = mips_topk_reference(
        jnp.asarray(queries), jnp.asarray(dequantize_rows(q8, sc)), 10
    )
    np.testing.assert_allclose(got_v, np.asarray(fv), rtol=5e-3)
    overlap = np.mean([
        len(set(got_i[r]) & set(np.asarray(fi)[r])) / 10
        for r in range(len(got_i))
    ])
    assert overlap >= 0.9


def test_int8_take_dequantizes():
    emb, _ = _world(n=200)
    idx = DenseIndex.from_embeddings(emb, dtype="int8")
    rows = np.array([0, 7, 199, -1])
    got = idx.take(rows)
    q8, sc = quantize_rows(emb)
    deq = dequantize_rows(q8, sc)
    want = deq[np.maximum(rows, 0)]  # clip mode maps -1 to row 0
    want[rows < 0] = deq[0]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_int8_add_remove_compact_equals_rebuild():
    """The sound live-update contract (tests/test_index_updates.py) holds for
    int8: after add+remove, search results equal a freshly built int8 index
    over the surviving rows' ORIGINAL float embeddings."""
    emb, queries = _world(n=1500)
    ids = [f"p{i}" for i in range(1500)]
    idx = DenseIndex.from_embeddings(emb, IdMap(list(ids)), dtype="int8")
    extra, _ = _world(n=64, seed=3)
    idx.add(extra, [f"x{i}" for i in range(64)])
    removed = idx.remove_ids(["p3", "p77", "x5"])
    assert removed == 3

    live = np.concatenate([np.delete(emb, [3, 77], axis=0),
                           np.delete(extra, [5], axis=0)])
    live_ids = ([f"p{i}" for i in range(1500) if i not in (3, 77)]
                + [f"x{i}" for i in range(64) if i != 5])
    rebuilt = DenseIndex.from_embeddings(live, IdMap(live_ids), dtype="int8")

    v1, i1, ids1 = idx.search_ids(queries, 9)
    v2, i2, ids2 = rebuilt.search_ids(queries, 9)
    np.testing.assert_allclose(v1, v2, rtol=1e-6, atol=1e-6)
    assert ids1 == ids2

    # compaction keeps the quantized representation bit-for-bit
    comp = idx.compact()
    assert comp.is_quantized
    v3, i3, ids3 = comp.search_ids(queries, 9)
    np.testing.assert_array_equal(v1, v3)
    assert ids1 == ids3


def test_int8_save_load_roundtrip(tmp_path):
    """save() writes the reference-compatible f32 artifact (dequantized);
    load(dtype='int8') re-quantizes losslessly (the absmax element is exactly
    +-127, so the recovered scale and codes match bit-for-bit)."""
    emb, queries = _world(n=1200)
    idx = DenseIndex.from_embeddings(emb, IdMap([f"p{i}" for i in range(1200)]),
                                     dtype="int8")
    path = os.path.join(tmp_path, "idx")
    idx.save(path)
    back = DenseIndex.load(path, dtype="int8")
    assert back.is_quantized
    np.testing.assert_array_equal(
        np.asarray(back.embeddings[: back.n]), np.asarray(idx.embeddings[: idx.n])
    )
    np.testing.assert_allclose(
        np.asarray(back.scales[: back.n]), np.asarray(idx.scales[: idx.n]),
        rtol=1e-6, atol=0,
    )
    # and a plain bf16 load of the same artifact still works
    plain = DenseIndex.load(path)
    assert not plain.is_quantized
    v_q, i_q = back.search(queries, 5)
    v_p, i_p = plain.search(queries, 5)
    # representations differ (int8 vs bf16 rounding) but heavily overlap
    overlap = np.mean([len(set(i_q[r]) & set(i_p[r])) / 5 for r in range(len(i_q))])
    assert overlap >= 0.8


def test_int8_fused_search_matches_unfused():
    emb, _ = _world(n=2048)
    idx = DenseIndex.from_embeddings(emb, dtype="int8")
    d = emb.shape[1]

    def encode_fn(params, ids, mask):
        # toy "encoder": one-hot-ish projection of token ids
        return params["w"][ids[:, 0] % 32]

    rng = np.random.default_rng(5)
    params = {"w": jnp.asarray(rng.standard_normal((32, d)), jnp.float32)}
    fused = idx.fused_search_fn(encode_fn, k=6)
    assert fused is not None
    fn, operands = fused
    ids = jnp.asarray(rng.integers(1, 1000, (4, 3)), jnp.int32)
    fv, fi = fn(params, ids, *operands)
    q = np.asarray(params["w"])[np.asarray(ids)[:, 0] % 32]
    uv, ui = idx.search(q, 6)
    np.testing.assert_array_equal(np.asarray(fi), ui)


def test_int8_ivf_view():
    """to_ivf on an int8 index builds slabs from dequantized rows; exact
    search through the view still matches the dequantized ground truth."""
    emb, queries = _world(n=2000)
    idx = DenseIndex.from_embeddings(emb, dtype="int8")
    ivf = idx.to_ivf(nlist=8, nprobe=4, niter=3)
    assert ivf.is_quantized  # carries scales for take()/exact search
    want_v, want_i = _truth(emb, queries, 7)
    got_v, got_i = ivf.search(queries, 7, exact=True)
    np.testing.assert_array_equal(got_i, want_i)
    # approx path: recall against the float truth
    av, ai = ivf.search(queries, 7)
    rec = np.mean([len(set(ai[r]) & set(want_i[r])) / 7 for r in range(len(ai))])
    assert rec >= 0.5  # nprobe=4/8 on random data


@pytest.mark.parametrize("shard", [False, True])
def test_int8_sharded_search(shard):
    emb, queries = _world(n=4096 + 100)  # ragged: straddler + device padding
    mesh = None
    if shard:
        from proqa_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    idx = DenseIndex.from_embeddings(emb, dtype="int8", mesh=mesh)
    want_v, want_i = _truth(emb, queries, 10)
    got_v, got_i = idx.search(queries, 10)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_v, want_v, rtol=1e-5, atol=1e-5)
