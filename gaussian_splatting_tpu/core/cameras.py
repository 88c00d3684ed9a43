"""Camera containers and projection conventions.

Conventions (matching the reference pipeline, see reference ``README.md:6``):
- Poses are **world-to-camera** 4x4 matrices (``viewmat``): ``p_cam = W @ p_world``.
- Intrinsics ``K`` is the standard 3x3 pinhole matrix; +z looks forward,
  +x right, +y down, pixel (0,0) at the top-left.
- Default focal heuristic: ``f = 1.2 * max(W, H)`` pixels, principal point at
  the image center (reference ``calibrate.py:357``, ``README.md:7``).

The OpenGL-style 4x4 projection matrix built here mirrors the reference
(``trainer.py:342-352``) for checkpoint/viewpoint parity; the rasterizer itself
consumes ``viewmat`` + ``K`` directly (as gsplat does — the projection matrix is
decorative in the render path, see reference ``gsplat_backend.py:174-175``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A pinhole camera. All fields are JAX arrays so a batch of cameras can be
    stacked along a leading axis and vmapped / sharded over devices.

    viewmat: (4, 4) world-to-camera.
    K:       (3, 3) intrinsics in pixels.
    width/height are static ints (shape-determining) and live as metadata.
    """

    viewmat: jnp.ndarray
    K: jnp.ndarray
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @property
    def cam_to_world(self) -> jnp.ndarray:
        R = self.viewmat[..., :3, :3]
        t = self.viewmat[..., :3, 3]
        Rt = jnp.swapaxes(R, -1, -2)
        pos = -jnp.einsum("...ij,...j->...i", Rt, t)
        top = jnp.concatenate([Rt, pos[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)

    @property
    def position(self) -> jnp.ndarray:
        """Camera center in world coordinates: -R^T t."""
        R = self.viewmat[..., :3, :3]
        t = self.viewmat[..., :3, 3]
        return -jnp.einsum("...ji,...j->...i", R, t)

    @property
    def focal(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.K[..., 0, 0], self.K[..., 1, 1]


def projection_matrix(
    K: jnp.ndarray, width: int, height: int, znear: float = 0.01, zfar: float = 100.0
) -> jnp.ndarray:
    """OpenGL-style projection matrix from pinhole intrinsics.

    Mirrors the reference construction (``trainer.py:342-352``) so that
    exported viewpoints / checkpoints are interchangeable.
    """
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    rows = [
        jnp.stack([2 * fx / width, zero, 2 * cx / width - 1, zero], axis=-1),
        jnp.stack([zero, 2 * fy / height, 2 * cy / height - 1, zero], axis=-1),
        jnp.stack([zero, zero, one * zfar / (zfar - znear), -one * zfar * znear / (zfar - znear)], axis=-1),
        jnp.stack([zero, zero, one, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def focal_from_heuristic(width: int, height: int, focal_35mm: float | None = None) -> float:
    """COLMAP-style focal prior in pixels.

    - With a 35mm-equivalent focal length: ``f = (f35 / 36) * max(W, H)``.
    - Otherwise the default prior ``f = 1.2 * max(W, H)``
      (reference ``calibrate.py:350-365``).
    """
    m = float(max(width, height))
    if focal_35mm is not None:
        return (float(focal_35mm) / 36.0) * m
    return 1.2 * m


def make_intrinsics(width: int, height: int, focal_px: float | None = None,
                    focal_35mm: float | None = None) -> jnp.ndarray:
    """Build a 3x3 K from the focal heuristic with center principal point."""
    f = float(focal_px) if focal_px is not None else focal_from_heuristic(width, height, focal_35mm)
    return jnp.array(
        [[f, 0.0, width / 2.0], [0.0, f, height / 2.0], [0.0, 0.0, 1.0]],
        dtype=jnp.float32,
    )


def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> jnp.ndarray:
    """World-to-camera viewmat looking from `eye` to `target` (+z forward,
    +y down in camera frame — OpenCV convention, matching the SfM output)."""
    eye = jnp.asarray(eye, dtype=jnp.float32)
    target = jnp.asarray(target, dtype=jnp.float32)
    up = jnp.asarray(up, dtype=jnp.float32)
    fwd = target - eye
    fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-12)
    right = jnp.cross(fwd, up)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-12)
    down = jnp.cross(fwd, right)
    R = jnp.stack([right, down, fwd], axis=0)  # rows = camera axes in world
    t = -R @ eye
    view = jnp.eye(4, dtype=jnp.float32)
    view = view.at[:3, :3].set(R)
    view = view.at[:3, 3].set(t)
    return view
