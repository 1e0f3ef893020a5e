"""Multi-device tests on the 8-device virtual CPU mesh: sharded MIPS merge
must equal single-device exact search."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from proqa_tpu.ops.mips import mips_topk_reference
from proqa_tpu.parallel import make_mesh, shard_rows, sharded_mips_topk


@pytest.fixture(scope="module")
def mesh(eight_devices):
    return make_mesh(8)


def test_sharded_equals_reference(mesh):
    rng = np.random.default_rng(0)
    n, d, q, k = 8 * 1024, 32, 16, 37
    corpus = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.float32)
    rv, ri = mips_topk_reference(queries, corpus, k)

    sharded = shard_rows(mesh, corpus)
    sv, si = sharded_mips_topk(queries, sharded, k, mesh)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(sv), np.asarray(rv), rtol=1e-6)


def test_sharded_blockmax_path(mesh):
    """Large-enough shards route through the block-max search per chip."""
    rng = np.random.default_rng(1)
    n, d, q, k = 8 * (1 << 17), 8, 8, 16
    corpus = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    queries = jnp.asarray(rng.standard_normal((q, d)).astype(np.float32))
    rv, ri = mips_topk_reference(queries, corpus, k)
    sv, si = sharded_mips_topk(queries, shard_rows(mesh, corpus), k, mesh, q_chunk=8)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(ri))


def test_shard_layout(mesh):
    corpus = jnp.zeros((64, 4))
    sharded = shard_rows(mesh, corpus)
    assert len(sharded.sharding.device_set) == 8


def test_dense_index_sharded(mesh):
    """DenseIndex with a mesh: padding + id mapping + sharded search."""
    import jax.numpy as jnp

    from proqa_tpu.index import DenseIndex, IdMap

    rng = np.random.default_rng(5)
    n, d = 1000, 16  # deliberately not divisible by 8
    emb = rng.standard_normal((n, d)).astype(np.float32)
    index = DenseIndex.from_embeddings(
        emb, IdMap.from_doc_ids([f"d{i}" for i in range(n)]),
        mesh=mesh, dtype=jnp.float32, pad_multiple=8,
    )
    assert index.embeddings.shape[0] % 8 == 0
    queries = rng.standard_normal((5, d)).astype(np.float32)
    vals, idx, ids = index.search_ids(queries, 7)
    ref_v, ref_i = mips_topk_reference(jnp.asarray(queries), jnp.asarray(emb), 7)
    np.testing.assert_array_equal(idx, np.asarray(ref_i))
    assert ids[0][0] == f"d{int(np.asarray(ref_i)[0,0])}"
