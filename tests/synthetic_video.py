"""Synthetic video generation for SfM tests (the reference repo's
data/input.mp4 is a git-LFS pointer, so tests build their own footage).

Renders a rich, textured 3D scene — a dense cloud of colored squares on a
textured ground/backdrop — through a smoothly translating+rotating camera,
so SIFT has plenty of features and the baseline triangulates well.
"""

import numpy as np
import cv2


def look_at_np(eye, target, up=(0.0, 1.0, 0.0)):
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)
    t = -R @ eye
    view = np.eye(4)
    view[:3, :3] = R
    view[:3, 3] = t
    return view


def make_scene(rng, n_points=900):
    """Random colored 3D points in a slab plus a textured back wall."""
    pts = np.concatenate([
        rng.uniform([-2.0, -1.5, 2.0], [2.0, 1.5, 5.0], size=(n_points, 3)),
    ])
    cols = rng.integers(40, 255, size=(n_points, 3))
    sizes = rng.integers(2, 6, size=(n_points,))
    return pts, cols, sizes


def render_frame(pts, cols, sizes, K, view, width, height):
    img = np.full((height, width, 3), 30, np.uint8)
    # light gradient background for stable histogram
    gx = np.linspace(0, 60, width, dtype=np.uint8)[None, :, None]
    img = np.clip(img.astype(int) + gx, 0, 255).astype(np.uint8)
    Xh = np.hstack([pts, np.ones((len(pts), 1))])
    Xc = (view @ Xh.T).T[:, :3]
    z = Xc[:, 2]
    vis = z > 0.1
    uv = (K @ Xc[vis].T).T
    uv = uv[:, :2] / uv[:, 2:3]
    order = np.argsort(-z[vis])  # far to near
    uvi = uv[order]
    ci = cols[vis][order]
    si = sizes[vis][order]
    zi = z[vis][order]
    for k, ((u, v), c, s, zz) in enumerate(zip(uvi, ci, si, zi)):
        if -20 <= u < width + 20 and -20 <= v < height + 20:
            r = max(2, int(round(s * 4.0 / zz)))
            ui, vi = int(u), int(v)
            col = tuple(int(x) for x in c)
            # Textured patch: outer square + contrasting inner circle + corner
            # dot, so SIFT finds distinctive blobs/corners per point.
            cv2.rectangle(img, (ui - r, vi - r), (ui + r, vi + r), col, -1)
            inv = tuple(int(255 - x) for x in c)
            cv2.circle(img, (ui, vi), max(1, r // 2), inv, -1)
            cv2.rectangle(img, (ui - r, vi - r),
                          (ui - r + max(1, r // 2), vi - r + max(1, r // 2)),
                          (int(c[1]), int(c[2]), int(c[0])), -1)
    return img


def write_synthetic_video(path, n_frames=60, width=320, height=240, seed=0,
                          fps=30.0, arc_range=(0.0, 1.0), scene_seed=None,
                          n_points=900):
    """Camera arcs sideways while looking at the cloud center. Returns
    (K, true world-to-camera poses).

    ``arc_range`` selects a sub-segment of the parametric camera path and
    ``scene_seed`` fixes the scene independently of ``seed`` — two videos
    with the same scene_seed and overlapping arc_ranges see the same scene
    from partially overlapping trajectories (cross-video alignment tests).
    """
    rng = np.random.default_rng(scene_seed if scene_seed is not None else seed)
    pts, cols, sizes = make_scene(rng, n_points=n_points)
    f = 1.2 * max(width, height)
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1.0]])
    fourcc = cv2.VideoWriter.fourcc(*"mp4v")
    vw = cv2.VideoWriter(str(path), fourcc, fps, (width, height))
    assert vw.isOpened(), "cv2.VideoWriter failed to open"
    a0, a1 = arc_range
    poses = []
    for i in range(n_frames):
        s = a0 + (a1 - a0) * i / max(n_frames - 1, 1)
        eye = (-1.2 + 2.4 * s, 0.3 * np.sin(2 * np.pi * s), -0.5 + 0.3 * s)
        view = look_at_np(eye, (0.0, 0.0, 3.5))
        frame = render_frame(pts, cols, sizes, K, view, width, height)
        vw.write(frame)
        poses.append(view)
    vw.release()
    return K, np.stack(poses)
