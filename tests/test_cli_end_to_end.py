"""Complete user journey: synthetic video -> train CLI (SfM + training +
checkpoints + PLY) -> eval CLI (metrics + renders). CPU, tiny settings."""

import json

import numpy as np
import pytest

from synthetic_video import write_synthetic_video


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    path = tmp_path_factory.mktemp("vid") / "clip.mp4"
    write_synthetic_video(path, n_frames=48, width=320, height=240)
    return str(path)


@pytest.mark.slow
def test_train_then_eval_cli(video, tmp_path):
    from gaussian_splatting_tpu.train_cli import main as train_main
    from gaussian_splatting_tpu.eval_cli import main as eval_main

    out = tmp_path / "run"
    rc = train_main([
        "--videos", video,
        "--output", str(out),
        "--iterations", "8",
        "--batch-size", "2",
        "--frame-stride", "4",
        "--initial-gaussians", "200",
        "--max-gaussians", "2000",
        "--backend", "ref",
        "--image-scale", "0.5",   # SfM at full res, training at 160x120
        "--cache-dir", str(tmp_path / "cache"),
    ])
    assert rc == 0
    assert (out / "final.npz").exists()
    assert (out / "final.ply").exists()
    assert (out / "metrics.jsonl").exists()
    assert (out / "debug_reproj.png").exists()

    eout = tmp_path / "eval"
    rc = eval_main([
        "--model", str(out / "final.npz"),
        "--videos", video,
        "--output", str(eout),
        "--num-views", "3",
        "--frame-stride", "4",
        "--backend", "ref",
        "--cache-dir", str(tmp_path / "cache"),
    ])
    assert rc == 0
    m = json.loads((eout / "metrics.json").read_text())
    assert m["num_views"] == 3
    assert np.isfinite(m["psnr"]) and m["psnr"] > 5.0
    assert (eout / "model.ply").exists()
    pngs = list(eout.glob("view_*.png"))
    assert len(pngs) == 3
