"""Incremental DenseIndex updates: add / remove (tombstones) / compact.

FAISS `IndexFlat.add` / `remove_ids` parity, beyond the reference pipeline
(which only rebuilds indexes offline). Exactness contract: search results on
a mutated index equal a from-scratch rebuild at any add/remove history.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from proqa_tpu.index import DenseIndex, IdMap


def _mk(n, d=8, seed=0, ids=False, **kw):
    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((n, d)).astype(np.float32)
    id_map = IdMap([f"doc{i}" for i in range(n)]) if ids else None
    return emb, DenseIndex.from_embeddings(emb, id_map, dtype=jnp.float32, **kw)


def _q(nq=4, d=8, seed=9):
    return np.random.default_rng(seed).standard_normal((nq, d)).astype(np.float32)


def test_add_matches_rebuilt():
    emb, idx = _mk(20)
    extra = np.random.default_rng(1).standard_normal((7, 8)).astype(np.float32)
    idx.add(extra)
    assert len(idx) == 27 and idx.version == 1

    rebuilt = DenseIndex.from_embeddings(
        np.concatenate([emb, extra]), dtype=jnp.float32
    )
    q = _q()
    v1, i1 = idx.search(q, 5)
    v2, i2 = rebuilt.search(q, 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    # new rows are reachable
    assert (i1 >= 20).any() or (np.asarray(idx.take([26])) == extra[6]).all()


def test_add_grows_capacity():
    emb, idx = _mk(10, pad_multiple=16)
    cap0 = idx.embeddings.shape[0]
    big = np.random.default_rng(2).standard_normal((cap0 + 5, 8)).astype(np.float32)
    idx.add(big)
    assert idx.embeddings.shape[0] >= idx.n >= cap0 + 15
    rebuilt = DenseIndex.from_embeddings(np.concatenate([emb, big]), dtype=jnp.float32)
    q = _q()
    v1, i1 = idx.search(q, 8)
    v2, i2 = rebuilt.search(q, 8)
    np.testing.assert_array_equal(i1, i2)
    # the capacity tail beyond n stays zero (the add-bucket invariant)
    tail = np.asarray(idx.embeddings[idx.n:])
    assert (tail == 0).all()


def test_add_repeated_small_buckets():
    emb, idx = _mk(4, pad_multiple=16)
    parts = [emb]
    rng = np.random.default_rng(3)
    for m in (1, 3, 2, 5, 1):
        p = rng.standard_normal((m, 8)).astype(np.float32)
        idx.add(p)
        parts.append(p)
    rebuilt = DenseIndex.from_embeddings(np.concatenate(parts), dtype=jnp.float32)
    v1, i1 = idx.search(_q(), 6)
    v2, i2 = rebuilt.search(_q(), 6)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)


def test_add_idmap_roundtrip():
    emb, idx = _mk(6, ids=True)
    extra = np.random.default_rng(4).standard_normal((2, 8)).astype(np.float32)
    idx.add(extra, ids=["new0", "new1"])
    assert idx.id_map.rows_to_ids([6, 7]) == ["new0", "new1"]
    assert idx.id_map.ids_to_rows(["new1"]) == [7]
    # id-count mismatch and missing/spurious ids raise
    with pytest.raises(ValueError):
        idx.add(extra, ids=["only-one"])
    with pytest.raises(ValueError):
        idx.add(extra)  # has a map -> ids required
    _, bare = _mk(4)
    with pytest.raises(ValueError):
        bare.add(extra, ids=["a", "b"])  # no map -> ids forbidden


def test_remove_rows_matches_rebuilt():
    emb, idx = _mk(30)
    q = _q()
    # tombstone the global top row for each query so filtering must actually
    # change results
    _, top = idx.search(q, 1)
    dead = np.unique(top.reshape(-1))[:3]
    assert idx.remove_rows(dead) == dead.size
    assert idx.remove_rows(dead) == 0  # idempotent
    assert len(idx) == 30 - dead.size

    keep = np.setdiff1d(np.arange(30), dead)
    rebuilt = DenseIndex.from_embeddings(emb[keep], dtype=jnp.float32)
    v1, i1 = idx.search(q, 5)
    v2, i2 = rebuilt.search(q, 5)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    # compare via original row identity
    np.testing.assert_array_equal(keep[i2], i1)
    assert not np.isin(i1, dead).any()


def test_remove_ids_and_duplicates():
    emb, idx = _mk(8, ids=True)
    # duplicate a doc id across two rows via add
    idx.add(emb[:1], ids=["doc0"])
    assert idx.remove_ids(["doc0"]) == 2  # both rows tombstoned
    v, i = idx.search(_q(), 4)
    assert not np.isin(i, [0, 8]).any()


def test_remove_underfill_padding_contract():
    emb, idx = _mk(5)
    idx.remove_rows([0, 1, 2])
    v, i = idx.search(_q(), 4)  # only 2 live rows < k
    assert np.isfinite(v[:, :2]).all()
    assert (v[:, 2:] == -np.inf).all()
    assert (i[:, 2:] == 0).all()
    assert not np.isin(i[:, :2], [0, 1, 2]).any()


def test_remove_out_of_range():
    _, idx = _mk(5)
    with pytest.raises(ValueError):
        idx.remove_rows([5])
    with pytest.raises(ValueError):
        idx.remove_rows([-1])


def test_compact_and_save(tmp_path):
    emb, idx = _mk(12, ids=True)
    idx.remove_ids(["doc3", "doc7"])
    live = len(idx)
    c = idx.compact()
    assert len(c) == live == 10 and c.n_deleted == 0
    assert c.id_map.rows_to_ids([3]) == ["doc4"]  # renumbered past the hole
    q = _q()
    v1, i1 = idx.search(q, 4)
    v2, i2 = c.search(q, 4)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    # save() compacts tombstones away and round-trips
    idx.save(str(tmp_path / "ix"))
    loaded = DenseIndex.load(str(tmp_path / "ix"), dtype=jnp.float32)
    assert len(loaded) == 10
    v3, i3 = loaded.search(q, 4)
    np.testing.assert_array_equal(i3, i2)


def test_fused_and_ivf_guards():
    emb, idx = _mk(40)
    fused0 = idx.fused_search_fn(lambda p, ids, m: jnp.zeros((ids.shape[0], 8)), 4)
    assert fused0 is not None
    idx.remove_rows([1])
    assert idx.fused_search_fn(
        lambda p, ids, m: jnp.zeros((ids.shape[0], 8)), 4
    ) is None  # tombstones force the filtering two-dispatch path
    with pytest.raises(ValueError):
        idx.to_ivf(nlist=2, nprobe=1, niter=2)
    ivf = idx.compact().to_ivf(nlist=2, nprobe=1, niter=2)
    with pytest.raises(ValueError):
        ivf.add(emb[:1])
    with pytest.raises(ValueError):
        ivf.remove_rows([0])


def test_version_bumps_and_sharded_guard():
    from proqa_tpu.parallel import make_mesh

    emb, idx = _mk(16)
    assert idx.version == 0
    idx.add(emb[:2])
    idx.remove_rows([0])
    assert idx.version == 2

    _, sharded = _mk(16, mesh=make_mesh(8))
    with pytest.raises(ValueError):
        sharded.add(emb[:2])
    with pytest.raises(ValueError):
        sharded.remove_rows([0])
