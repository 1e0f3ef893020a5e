"""int8-quantized DenseIndex (round 4): half-footprint storage whose
searches are exact w.r.t. the quantized scores. Quantization is per-BLOCK
(ops/quant.py: block pinned to the search kernel's reduce block — a per-row
scale operand would be lane-padded 128x in HBM), so the index-level contract
is: search results equal the naive reference over the index's OWN stored
codes+scales at the scoring precision, across construction, incremental add
(straddled-block requantization), tombstone removal, compaction, persistence,
and the fused encode+search path. Capacity motivation: 67.2M rows/chip at
D=128."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from proqa_tpu.index.dense import DenseIndex
from proqa_tpu.index.idmap import IdMap
from proqa_tpu.ops.mips import mips_topk_reference
from proqa_tpu.ops.quant import dequantize_rows, expand_scales, quantize_rows


def _world(n=3000, d=128, q=8, seed=0):
    rng = np.random.default_rng(seed)
    emb = (rng.standard_normal((n, d)) * rng.uniform(0.5, 2.0, (n, 1))).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    return emb, queries


def _truth_from_index(idx, queries, k):
    """Naive top-k over the index's OWN codes+scales at scoring precision
    (bf16 queries), tombstones excluded — the exactness contract."""
    codes = jnp.asarray(np.asarray(idx.embeddings[: idx.n]))
    row_sc = expand_scales(np.asarray(idx.scales), idx.quant_block, idx.n)
    v, i = mips_topk_reference(
        jnp.asarray(queries, jnp.bfloat16), codes, min(k + idx.n_deleted, idx.n),
        scales=jnp.asarray(row_sc),
    )
    v, i = np.asarray(v), np.asarray(i)
    if idx.n_deleted:
        keep = ~np.isin(i, idx._deleted)
        out_v = np.full((v.shape[0], k), -np.inf, np.float32)
        out_i = np.zeros((i.shape[0], k), i.dtype)
        for r in range(v.shape[0]):
            cols = np.nonzero(keep[r])[0][:k]
            out_v[r, : cols.size] = v[r, cols]
            out_i[r, : cols.size] = i[r, cols]
        return out_v, out_i
    return v[:, :k], i[:, :k]


def test_int8_index_search_matches_own_representation():
    # n > 4096 so the index dispatches the blockmax path, NOT the same naive
    # reference the truth uses (tautology guard)
    emb, queries = _world(n=6000)
    idx = DenseIndex.from_embeddings(emb, dtype="int8")
    assert idx.is_quantized and idx.embeddings.dtype == jnp.int8
    assert idx.quant_block >= 16
    assert idx.scales.shape[0] == idx.embeddings.shape[0] // idx.quant_block
    want_v, want_i = _truth_from_index(idx, queries, 10)
    got_v, got_i = idx.search(queries, 10)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_v, want_v, rtol=1e-5, atol=1e-5)
    # quality sanity vs the full-precision float truth: int8+bf16 rounding
    # moves values <1% and the returned sets overlap heavily
    fv, fi = mips_topk_reference(jnp.asarray(queries), jnp.asarray(emb), 10)
    np.testing.assert_allclose(got_v, np.asarray(fv), rtol=1e-2)
    overlap = np.mean([
        len(set(got_i[r]) & set(np.asarray(fi)[r])) / 10
        for r in range(len(got_i))
    ])
    assert overlap >= 0.85


def test_int8_take_dequantizes():
    emb, _ = _world(n=200)
    idx = DenseIndex.from_embeddings(emb, dtype="int8")
    qb = idx.quant_block
    rows = np.array([0, 7, 199, -1])
    got = idx.take(rows)
    q8, sc = quantize_rows(emb, block=qb)
    deq = dequantize_rows(q8, sc, block=qb)
    want = deq[np.maximum(rows, 0)]  # clip mode maps -1 to row 0
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_int8_add_remove_exact_over_own_codes():
    """Live updates keep the exactness contract: search == naive top-k over
    the index's own (post-add, post-requantization) codes with tombstoned
    rows excluded. Added rows' stored values stay within one quantization
    step of their originals even through the straddled-block requantize."""
    emb, queries = _world(n=1500)
    ids = [f"p{i}" for i in range(1500)]
    idx = DenseIndex.from_embeddings(emb, IdMap(list(ids)), dtype="int8")
    qb = idx.quant_block
    assert 1500 % qb != 0  # ensure the add below straddles a block
    extra, _ = _world(n=64, seed=3)
    idx.add(extra, [f"x{i}" for i in range(64)])
    assert idx.n == 1564
    removed = idx.remove_ids(["p3", "p77", "x5"])
    assert removed == 3

    want_v, want_i = _truth_from_index(idx, queries, 9)
    got_v, got_i = idx.search(queries, 9)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_v, want_v, rtol=1e-6, atol=1e-6)

    # stored content tracks the originals: every live row within 1 step
    stored = idx.take(np.arange(idx.n))
    orig = np.concatenate([emb, extra])
    row_sc = expand_scales(np.asarray(idx.scales), qb, idx.n)
    err = np.abs(stored - orig).max(axis=1)
    assert (err <= row_sc * 1.01 + 1e-7).all()  # requantized rows: <=1 step

    # compaction requantizes from the dequantized survivors — bit-equal to
    # building fresh from those values
    comp = idx.compact()
    assert comp.is_quantized and len(comp) == idx.n - 3
    live = [r for r in range(idx.n) if r not in set(int(x) for x in idx._deleted)]
    want = DenseIndex.from_embeddings(
        idx.take(np.asarray(live)),
        IdMap([idx.id_map[r] for r in live]), dtype="int8",
    )
    np.testing.assert_array_equal(
        np.asarray(comp.embeddings[: comp.n]), np.asarray(want.embeddings[: want.n])
    )
    v1, _, ids1 = comp.search_ids(queries, 9)
    v2, _, ids2 = want.search_ids(queries, 9)
    np.testing.assert_array_equal(v1, v2)
    assert ids1 == ids2


def test_int8_save_load_roundtrip(tmp_path):
    """save() writes the reference-compatible f32 artifact (dequantized);
    load(dtype='int8') re-quantizes losslessly (same n -> same block
    grouping; each block's absmax element is exactly +-127*scale, so the
    recovered scale and codes match bit-for-bit)."""
    emb, queries = _world(n=1200)
    idx = DenseIndex.from_embeddings(emb, IdMap([f"p{i}" for i in range(1200)]),
                                     dtype="int8")
    path = os.path.join(tmp_path, "idx")
    idx.save(path)
    back = DenseIndex.load(path, dtype="int8")
    assert back.is_quantized and back.quant_block == idx.quant_block
    np.testing.assert_array_equal(
        np.asarray(back.embeddings[: back.n]), np.asarray(idx.embeddings[: idx.n])
    )
    np.testing.assert_allclose(
        np.asarray(back.scales), np.asarray(idx.scales), rtol=1e-6, atol=0
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
    assert len(operands) == 2  # embeddings + scales, both passed not closed
    ids = jnp.asarray(rng.integers(1, 1000, (4, 3)), jnp.int32)
    fv, fi = fn(params, ids, *operands)
    q = np.asarray(params["w"])[np.asarray(ids)[:, 0] % 32]
    uv, ui = idx.search(q, 6)
    np.testing.assert_array_equal(np.asarray(fi), ui)


def test_int8_ivf_view():
    """to_ivf on an int8 index builds slabs from dequantized rows; exact
    search through the view still matches the index's own representation."""
    emb, queries = _world(n=2000)
    idx = DenseIndex.from_embeddings(emb, dtype="int8")
    ivf = idx.to_ivf(nlist=8, nprobe=4, niter=3)
    assert ivf.is_quantized  # carries scales for take()/exact search
    want_v, want_i = _truth_from_index(idx, queries, 7)
    got_v, got_i = ivf.search(queries, 7, exact=True)
    np.testing.assert_array_equal(got_i, want_i)
    # approx path: recall against the exact truth
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
    want_v, want_i = _truth_from_index(idx, queries, 10)
    got_v, got_i = idx.search(queries, 10)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_v, want_v, rtol=1e-5, atol=1e-5)
