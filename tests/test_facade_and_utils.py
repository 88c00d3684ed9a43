"""Facade, plots, focal-BA, and debug utilities."""

import json

import numpy as np
import jax.numpy as jnp

from gaussian_splatting_tpu.models.gaussians import init_from_points
from gaussian_splatting_tpu.ops.facade import GaussianRasterizer
from gaussian_splatting_tpu.utils.plots import draw_graphs
from gaussian_splatting_tpu.training.trainer import GaussianTrainer


def _params(rng, n=30):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    state = init_from_points(pts, None, n, capacity=n)
    return state.params


def test_facade_render_single_and_cache(rng):
    p = _params(rng)
    r = GaussianRasterizer(width=32, height=32, backend="ref", enable_caching=True)
    vp = {
        "world_view_transform": np.eye(4, dtype=np.float32),
        "K": np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32),
    }
    vp["world_view_transform"][2, 3] = 4.0
    out1 = r.render_single(p, vp)
    assert out1.render.shape == (32, 32, 3)
    out2 = r.render_single(p, vp)  # cache hit
    assert r.cache_stats()["hits"] == 1
    np.testing.assert_array_equal(np.asarray(out1.render), np.asarray(out2.render))


def test_facade_render_with_depth_modes(rng):
    p = _params(rng)
    r = GaussianRasterizer(width=16, height=16, backend="ref")
    vp = {"world_view_transform": np.eye(4, dtype=np.float32),
          "K": np.eye(3, dtype=np.float32) * 20}
    vp["K"][0, 2] = vp["K"][1, 2] = 8.0
    vp["K"][2, 2] = 1.0
    vp["world_view_transform"][2, 3] = 4.0
    for mode, ch in [("RGB", 3), ("D", 1), ("ED", 1), ("RGB+D", 4), ("RGB+ED", 4)]:
        out = r.render_with_depth(p, vp, render_mode=mode)
        assert out["render"].shape[-1] == ch, mode
        assert "visibility_filter" in out and "radii" in out


def test_draw_graphs(tmp_path):
    mpath = tmp_path / "metrics.jsonl"
    with open(mpath, "w") as f:
        for i in range(0, 100, 10):
            f.write(json.dumps({"loss": 1.0 / (i + 1), "n_gaussians": 100 + i,
                                "train/psnr": 20 + i / 10, "_step": i}) + "\n")
    paths = draw_graphs(str(mpath), str(tmp_path))
    assert len(paths) == 1
    import os

    assert os.path.exists(paths[0])


def test_debug_reprojection(tmp_path, rng):
    pts = rng.normal(size=(100, 3)) + np.array([0, 0, 4.0])
    pose = np.eye(4)
    K = np.array([[40.0, 0, 16], [0, 40, 16], [0, 0, 1]])
    frame = np.zeros((32, 32, 3), np.uint8)
    img = GaussianTrainer.debug_reprojection(
        pts, pose, K, frame, str(tmp_path / "dbg.png"))
    assert (img[..., 0] == 255).sum() > 10  # red dots drawn
    assert (tmp_path / "dbg.png").exists()


def test_focal_bundle_adjustment(rng):
    """Focal BA on synthetic frames stays within a sane range and runs."""
    from synthetic_video import make_scene, render_frame, look_at_np
    from gaussian_splatting_tpu.video.calibrate import Calibrator

    pts, cols, sizes = make_scene(rng)
    width = height = 240
    f_true = 1.2 * 240
    K = np.array([[f_true, 0, 120], [0, f_true, 120], [0, 0, 1.0]])
    frames = []
    for i in range(3):
        view = look_at_np((-0.4 + 0.3 * i, 0.0, -0.5), (0, 0, 3.5))
        frames.append(render_frame(pts, cols, sizes, K, view, width, height))
    calib = Calibrator(matcher="sift")
    K0 = calib.identify_intrinsics(width, height)
    K1 = calib.refine_focal_bundle_adjustment(K0, frames)
    assert 0.3 * K0[0, 0] < K1[0, 0] < 3.0 * K0[0, 0]
