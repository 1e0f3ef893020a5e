"""IVF index: recall against exact search, overflow handling, full-probe
exactness."""
import numpy as np
import pytest

import jax.numpy as jnp

from proqa_tpu.index.ivf import build_ivf
from proqa_tpu.ops.mips import mips_topk_reference


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    # clusterable data: 32 blobs
    centers = rng.standard_normal((32, 32)) * 2
    pts = (centers[rng.integers(0, 32, size=4096)] +
           0.3 * rng.standard_normal((4096, 32))).astype(np.float32)
    queries = (centers[rng.integers(0, 32, size=16)] +
               0.3 * rng.standard_normal((16, 32))).astype(np.float32)
    return pts, queries


def test_ivf_recall(data):
    pts, queries = data
    index = build_ivf(pts, nlist=32, nprobe=8, niter=15, dtype=jnp.float32)
    k = 20
    rv, ri = mips_topk_reference(jnp.asarray(queries), jnp.asarray(pts), k)
    v, i = index.search(queries, k)
    ri, i = np.asarray(ri), np.asarray(i)
    recall = np.mean([len(set(ri[r]) & set(i[r])) / k for r in range(len(ri))])
    assert recall > 0.8, recall
    assert (np.diff(np.asarray(v), axis=1) <= 1e-5).all()


def test_ivf_full_probe_exact(data):
    """nprobe == nlist scans everything -> exact results."""
    pts, queries = data
    index = build_ivf(pts, nlist=16, nprobe=16, niter=10, capacity_factor=1.2,
                      dtype=jnp.float32)
    k = 10
    rv, ri = mips_topk_reference(jnp.asarray(queries), jnp.asarray(pts), k)
    v, i = index.search(queries, k)
    recall = np.mean([
        len(set(np.asarray(ri)[r]) & set(np.asarray(i)[r])) / k for r in range(len(queries))
    ])
    assert recall == 1.0


def test_ivf_overflow_not_dropped():
    """Tiny capacity forces overflow; those rows must still be findable."""
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((512, 16)).astype(np.float32)
    index = build_ivf(pts, nlist=4, nprobe=1, niter=5, capacity_factor=0.25,
                      dtype=jnp.float32)
    assert index.overflow.shape[0] > 0
    over_rows = set(int(r) for r in np.asarray(index.overflow_rows) if r >= 0)
    # find queries whose EXACT top-1 lives in the overflow region; IVF must
    # still return it (overflow is always scanned)
    queries = rng.standard_normal((64, 16)).astype(np.float32)
    _, exact1 = mips_topk_reference(jnp.asarray(queries), jnp.asarray(pts), 1)
    exact1 = np.asarray(exact1)[:, 0]
    hits = [qi for qi in range(64) if int(exact1[qi]) in over_rows]
    assert hits, "test setup: no query resolved to an overflow row"
    _, ivf1 = index.search(queries[hits], 1)
    np.testing.assert_array_equal(np.asarray(ivf1)[:, 0], exact1[hits])


def test_ivf_no_padding_indices(data):
    pts, queries = data
    index = build_ivf(pts, nlist=32, nprobe=4, niter=5, dtype=jnp.float32)
    _, i = index.search(queries, 50)
    assert (np.asarray(i) >= 0).all() and (np.asarray(i) < len(pts)).all()


def test_ivf_underfilled_k_never_leaks_padding(data):
    """When the probed clusters + overflow hold FEWER than k real rows, the
    tail must come back as (row 0, -inf score) — the DenseIndex degenerate
    contract — never as -1 (Python -1 maps to the LAST doc in IdMap lookups
    and jnp.take clips it to 0 in the on-device para_rows gather)."""
    from proqa_tpu.ops.mips import NEG_INF

    pts, queries = data
    # 200 rows over 32 lists, probe only 2: ~2*cap+overflow real slots << k
    index = build_ivf(pts[:200], nlist=32, nprobe=2, niter=5,
                      capacity_factor=1.0, dtype=jnp.float32)
    vals, idx = index.search(queries, 150)
    vals, idx = np.asarray(vals), np.asarray(idx)
    assert (idx >= 0).all() and (idx < 200).all()
    padding = vals <= float(NEG_INF)
    assert padding.any(), "test setup: expected under-filled top-k"
    assert (idx[padding] == 0).all()
    # real results rank strictly ahead of padding slots
    first_pad = padding.argmax(axis=1)
    for r in range(len(queries)):
        if padding[r].any():
            assert padding[r, first_pad[r]:].all()


def test_ivf_dense_index_adapter(data):
    """DenseIndex.to_ivf: online-sampler-compatible search API over the IVF
    structure, with exact bypass and embedding gathers intact."""
    import jax.numpy as jnp

    from proqa_tpu.index import DenseIndex, IdMap

    pts, queries = data
    dense = DenseIndex.from_embeddings(
        pts, IdMap.from_doc_ids([f"d{i}" for i in range(len(pts))]),
        dtype=jnp.float32, pad_multiple=8,
    )
    ivf = dense.to_ivf(nlist=16, nprobe=16, niter=8)
    # full probe == exact
    v1, i1 = ivf.search(queries, 10)
    v2, i2 = ivf.search(queries, 10, exact=True)
    assert np.mean([len(set(i1[r]) & set(i2[r])) / 10 for r in range(len(queries))]) == 1.0
    # take() still serves the rank head
    emb = ivf.take(i1[0])
    assert emb.shape == (10, pts.shape[1])
    assert ivf.id_map.rows_to_ids(i1[0][:2])[0].startswith("d")


def test_ivf_search_chunks_large_query_batches(data):
    """A query batch whose slab-gather envelope exceeds the budget is
    processed in padded chunks; results must equal the unchunked search."""
    pts, queries = data
    index = build_ivf(pts, nlist=16, nprobe=4, niter=5, dtype=jnp.float32)
    big_q = np.concatenate([queries] * 5)  # 80 queries, not a chunk multiple
    v_ref, i_ref = index.search(big_q, 10)
    per_q = index.nprobe * index.capacity * pts.shape[1] * 4
    index.GATHER_BUDGET_BYTES = per_q * 24  # forces chunk=24 < 80
    v, i = index.search(big_q, 10)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), rtol=1e-6)


def test_ivf_l2_quantizer_probes_l2_geometry():
    """spherical=False: rows are ASSIGNED by L2; probing must use the same
    geometry (ip - |c|^2/2), not raw IP — a large-norm centroid would
    otherwise steal every probe and the gold row's slab never gets scanned."""
    import jax

    from proqa_tpu.index.ivf import IVFIndex

    # c0 small-norm, c1 huge-norm; gold row x=[0.5, 0] is L2-assigned to c0
    centroids = jnp.asarray([[0.1, 0.0], [10.0, 0.0]], jnp.float32)
    slabs = jnp.asarray(
        [[[0.5, 0.0]] * 8, [[0.0, 0.2]] * 8], jnp.float32
    )
    slab_rows = jnp.asarray(
        [[0] + [-1] * 7, [1] + [-1] * 7], jnp.int32
    )
    index = IVFIndex(
        centroids=centroids, slabs=slabs, slab_rows=slab_rows,
        overflow=jnp.zeros((0, 2), jnp.float32),
        overflow_rows=jnp.zeros((0,), jnp.int32),
        nprobe=1, spherical=False,
    )
    q = jnp.asarray([[1.0, 0.0]], jnp.float32)
    # raw-IP probing would pick c1's slab (ip 10 vs 0.1) and return row 1;
    # L2 probing picks c0 (0.095 vs -40) and finds the true best row 0
    vals, idx = index.search(q, 1)
    assert int(np.asarray(idx)[0, 0]) == 0


def test_ivf_fused_search_uses_quantizer_geometry():
    """The fused encode+search path must probe with the quantizer's own
    geometry: with spherical=False, passing the default spherical=True into
    _ivf_search would raw-IP-probe the huge-norm centroid's slab and miss
    the gold row (same construction as the unfused test above)."""
    import jax

    from proqa_tpu.index.dense import IVFDenseIndex
    from proqa_tpu.index.ivf import IVFIndex

    centroids = jnp.asarray([[0.1, 0.0], [10.0, 0.0]], jnp.float32)
    slabs = jnp.asarray([[[0.5, 0.0]] * 8, [[0.0, 0.2]] * 8], jnp.float32)
    slab_rows = jnp.asarray([[0] + [-1] * 7, [1] + [-1] * 7], jnp.int32)
    ivf = IVFIndex(
        centroids=centroids, slabs=slabs, slab_rows=slab_rows,
        overflow=jnp.zeros((0, 2), jnp.float32),
        overflow_rows=jnp.zeros((0,), jnp.int32),
        nprobe=1, spherical=False,
    )
    emb = jnp.asarray([[0.5, 0.0], [0.0, 0.2]], jnp.float32)
    index = IVFDenseIndex(embeddings=emb, n=2, ivf=ivf)

    table = jnp.asarray([[1.0, 0.0]], jnp.float32)  # token 0 -> query [1, 0]

    def encode_fn(params, ids, mask):
        return jnp.take(params, ids[:, 0], axis=0)

    fn, operands = index.fused_search_fn(encode_fn, 1)
    vals, idx = fn(table, jnp.zeros((1, 4), jnp.int32), *operands)
    assert int(np.asarray(idx)[0, 0]) == 0


def test_fused_search_pads_to_full_k_width():
    """Fused search must return the SAME k-column width as the unfused
    `search` path even when the index cannot fill k (IVF: nprobe*cap+overflow
    < k; dense: corpus rows < k). A fused/unfused width mismatch would hand
    the jitted QA train step two batch signatures -> a fresh multi-minute
    remote compile mid-run. Pad slots follow the (NEG_INF, row 0) contract."""
    import jax

    from proqa_tpu.index.dense import DenseIndex, IVFDenseIndex
    from proqa_tpu.index.ivf import IVFIndex
    from proqa_tpu.ops.mips import NEG_INF

    table = jnp.asarray([[1.0, 0.0]], jnp.float32)  # token 0 -> query [1, 0]

    def encode_fn(params, ids, mask):
        return jnp.take(params, ids[:, 0], axis=0)

    k = 12  # > both fills below
    # --- IVF: 2 lists * cap 4 + 0 overflow = 8 < k ---
    centroids = jnp.asarray([[1.0, 0.0], [0.0, 1.0]], jnp.float32)
    slabs = jnp.asarray([[[0.5, 0.0]] * 4, [[0.0, 0.2]] * 4], jnp.float32)
    slab_rows = jnp.asarray([[0, 1, -1, -1], [2, -1, -1, -1]], jnp.int32)
    ivf = IVFIndex(
        centroids=centroids, slabs=slabs, slab_rows=slab_rows,
        overflow=jnp.zeros((0, 2), jnp.float32),
        overflow_rows=jnp.zeros((0,), jnp.int32),
        nprobe=2, spherical=True,
    )
    emb = jnp.asarray([[0.5, 0.0], [0.4, 0.0], [0.0, 0.2]], jnp.float32)
    index = IVFDenseIndex(embeddings=emb, n=3, ivf=ivf)
    fn, operands = index.fused_search_fn(encode_fn, k)
    vals, idx = fn(table, jnp.zeros((2, 4), jnp.int32), *operands)
    assert vals.shape == (2, k) and idx.shape == (2, k)
    vals, idx = np.asarray(vals), np.asarray(idx)
    uv, ui = index.search(np.asarray([[1.0, 0.0]], np.float32), k)
    assert uv.shape == (1, k)  # unfused contract: same width
    assert int(idx[0, 0]) == 0 and int(ui[0, 0]) == 0
    assert (vals[:, 3:] <= float(NEG_INF)).all()
    assert (idx[:, 3:] == 0).all()

    # --- dense: 3 rows < k ---
    dense = DenseIndex(embeddings=emb, n=3)
    fn, operands = dense.fused_search_fn(encode_fn, k)
    vals, idx = fn(table, jnp.zeros((2, 4), jnp.int32), *operands)
    assert vals.shape == (2, k) and idx.shape == (2, k)
    vals = np.asarray(vals)
    assert (vals[:, 3:] <= float(NEG_INF)).all()
