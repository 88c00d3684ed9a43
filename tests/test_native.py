"""Native C++ pointops vs scipy reference."""

import numpy as np
import pytest

from gaussian_splatting_tpu.utils import native


@pytest.fixture(scope="module")
def lib_available():
    if native._load() is None:
        pytest.skip("native library not built")
    return True


def test_knn_matches_scipy(rng, lib_available):
    from scipy.spatial import cKDTree

    pts = rng.normal(size=(5000, 3)).astype(np.float32)
    q = pts[:512]
    ours = native.knn_mean_distance(pts, q, k=7)
    tree = cKDTree(pts)
    d, _ = tree.query(q, k=7)
    expected = d[:, 1:].mean(axis=1)
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-6)


def test_knn_clustered_cloud(rng, lib_available):
    """Non-uniform cloud: ring expansion must still find true neighbors."""
    from scipy.spatial import cKDTree

    a = rng.normal(size=(2000, 3)).astype(np.float32) * 0.05
    b = rng.normal(size=(2000, 3)).astype(np.float32) * 2.0 + 5.0
    pts = np.concatenate([a, b])
    q = pts[::37]
    ours = native.knn_mean_distance(pts, q, k=4)
    tree = cKDTree(pts)
    d, _ = tree.query(q, k=4)
    expected = d[:, 1:].mean(axis=1)
    # Grid-ring search is exact within the covered radius; allow the rare
    # boundary case a small tolerance.
    ok = np.isclose(ours, expected, rtol=1e-3, atol=1e-5)
    assert ok.mean() > 0.98


def test_dedupe_matches_semantics(rng, lib_available):
    base = rng.uniform(size=(500, 3)).astype(np.float32)
    dups = base[:100] + rng.normal(size=(100, 3)).astype(np.float32) * 1e-4
    pts = np.concatenate([base, dups])
    keep = native.radius_dedupe(pts, radius=0.01)
    assert keep[:500].all() or keep.sum() >= 490  # base mostly kept
    assert keep.sum() <= 520  # duplicates dropped
    kept = pts[keep]
    from scipy.spatial import cKDTree

    tree = cKDTree(kept)
    pairs = tree.query_pairs(0.0099)
    assert len(pairs) == 0  # no near-duplicates survive


def test_fallback_paths(monkeypatch, rng):
    """Force the scipy fallback and check identical API behavior."""
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    d = native.knn_mean_distance(pts, pts[:10], k=7)
    assert d.shape == (10,) and (d > 0).all()
    keep = native.radius_dedupe(pts, 0.01)
    assert keep.dtype == bool and keep.shape == (200,)
