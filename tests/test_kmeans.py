"""k-means: convergence on separable blobs, spherical mode, subsampling,
objective monotonicity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from proqa_tpu.ops.kmeans import KMeansResult, assign_clusters, kmeans


def _blobs(n_per, k, d, spread=0.05, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, d)) * 3
    pts = np.concatenate([
        centers[i] + spread * rng.standard_normal((n_per, d)) for i in range(k)
    ])
    labels = np.repeat(np.arange(k), n_per)
    perm = rng.permutation(len(pts))
    return pts[perm].astype(np.float32), labels[perm]


def _cluster_purity(assign, labels, k):
    purity = 0
    for c in range(k):
        members = labels[assign == c]
        if len(members):
            purity += np.bincount(members).max()
    return purity / len(labels)


def test_kmeans_recovers_blobs():
    k = 5
    pts, labels = _blobs(200, k, 8)
    res = kmeans(jax.random.PRNGKey(0), jnp.asarray(pts), k, niter=20, chunk=256)
    assert isinstance(res, KMeansResult)
    assert res.centroids.shape == (k, 8)
    assert _cluster_purity(np.asarray(res.assignments), labels, k) > 0.95


def test_kmeans_spherical_unit_norm():
    pts, _ = _blobs(100, 4, 16, seed=1)
    res = kmeans(jax.random.PRNGKey(1), jnp.asarray(pts), 4, niter=10, spherical=True, chunk=128)
    norms = np.linalg.norm(np.asarray(res.centroids), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_kmeans_subsampled_assigns_all():
    pts, labels = _blobs(300, 3, 4, seed=2)
    res = kmeans(
        jax.random.PRNGKey(2), jnp.asarray(pts), 3,
        niter=10, max_points_per_centroid=50, chunk=128,
    )
    assert res.assignments.shape == (900,)
    assert _cluster_purity(np.asarray(res.assignments), labels, 3) > 0.9


def test_assign_clusters_matches_numpy():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((500, 8)).astype(np.float32)
    c = rng.standard_normal((7, 8)).astype(np.float32)
    a, v = assign_clusters(jnp.asarray(x), jnp.asarray(c), chunk=128)
    d2 = ((x[:, None, :] - c[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(a), d2.argmin(-1))


def test_assign_clusters_spherical():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((200, 8)).astype(np.float32)
    c = rng.standard_normal((5, 8)).astype(np.float32)
    a, _ = assign_clusters(jnp.asarray(x), jnp.asarray(c), spherical=True, chunk=64)
    np.testing.assert_array_equal(np.asarray(a), (x @ c.T).argmax(-1))


def test_kmeanspp_more_centroids_than_distinct_points():
    """k >= distinct points: residual distances go all-zero; sampling must
    fall back to uniform instead of silently clamping every remaining
    centroid to the last row."""
    pts = jnp.asarray(np.tile(np.eye(3, 8, dtype=np.float32), (4, 1)))
    res = kmeans(jax.random.PRNGKey(0), pts, 5, niter=3, init="kmeans++")
    assert res.centroids.shape == (5, 8)
    assert np.isfinite(np.asarray(res.centroids)).all()
    a = np.asarray(res.assignments)
    assert ((a >= 0) & (a < 5)).all()
    # every distinct point still lands with its duplicates
    for i in range(3):
        group = a[[i, i + 3, i + 6, i + 9]]
        assert (group == group[0]).all()


def test_make_optimizer_rejects_schedule_with_warmup():
    import pytest as _pytest

    from proqa_tpu.train.optim import make_optimizer

    with _pytest.raises(ValueError, match="warmup"):
        make_optimizer(lambda step: 1e-5, warmup_steps=10)
