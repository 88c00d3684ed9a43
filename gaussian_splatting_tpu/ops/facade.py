"""Rasterizer facade — backend selection and render caching.

Functional counterpart of the reference ``GaussianRasterizer``
(``gaussian_rasterizer.py:40-323``): backend selection ("auto" -> pallas ->
ref, mirroring the reference's auto -> gsplat -> pytorch at ``:97-118``) and
a render cache keyed by view-matrix distance (< 0.01, reference ``:282-293``).
``render_batch`` renders viewpoints sequentially (same-resolution views share
one compiled executable) — the reference's viewpoint grouping (``:181-217``)
is likewise unused by its production paths. Like the reference — where
production calls ``backend.render_with_depth`` directly — the training loop
bypasses this facade and jits ``ops.render.render``; the facade serves
interactive/eval use.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.ops.render import RenderOut, render  # noqa: F401

log = logging.getLogger(__name__)


class GaussianRasterizer:
    def __init__(
        self,
        width: int,
        height: int,
        tile_size: int = 16,
        backend: str = "auto",
        enable_caching: bool = False,
        cache_view_eps: float = 0.01,
        sh_degree: int = 3,
    ):
        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "ref"
        self.backend = backend
        self.width = width
        self.height = height
        self.tile_size = tile_size
        self.sh_degree = sh_degree
        self.enable_caching = enable_caching
        self.cache_view_eps = cache_view_eps
        self._cache: List = []  # [(viewmat np, RenderOut)]
        self.cache_hits = 0
        self.cache_misses = 0
        self._render_jit = None

    # ---- core ----------------------------------------------------------

    def _get_render_fn(self):
        if self._render_jit is None:
            backend, w, h, ts = self.backend, self.width, self.height, self.tile_size

            @jax.jit
            def fn(means, quats, log_scales, logit_op, sh, viewmat, K, bg):
                return render(
                    means, quats, log_scales, logit_op, sh, viewmat, K, w, h,
                    sh_degree=self.sh_degree, bg=bg, backend=backend, tile_size=ts,
                )

            self._render_jit = fn
        return self._render_jit

    def _cache_lookup(self, viewmat: np.ndarray) -> Optional[RenderOut]:
        for vm, out in self._cache:
            if np.linalg.norm(vm - viewmat) < self.cache_view_eps:
                self.cache_hits += 1
                return out
        self.cache_misses += 1
        return None

    # ---- API (reference gaussian_rasterizer.py surface) ----------------

    def render_single(self, params, viewpoint: Dict, bg=None) -> RenderOut:
        """params: dict with means3D/scales(raw log)/rotations/opacities(raw
        logit)/shs — or a GaussianParams; viewpoint: dict with
        world_view_transform and K."""
        viewmat = np.asarray(viewpoint["world_view_transform"], np.float32)
        if self.enable_caching:
            hit = self._cache_lookup(viewmat)
            if hit is not None:
                return hit
        means, quats, log_scales, logit_op, sh = _unpack_params(params)
        K = jnp.asarray(viewpoint["K"], jnp.float32)
        bg = jnp.zeros((3,), jnp.float32) if bg is None else jnp.asarray(bg)
        out = self._get_render_fn()(
            means, quats, log_scales, logit_op, sh,
            jnp.asarray(viewmat), K, bg,
        )
        if self.enable_caching:
            self._cache.append((viewmat, out))
            if len(self._cache) > 32:
                self._cache.pop(0)
        return out

    def render_batch(self, params, viewpoints: List[Dict], bg=None) -> List[RenderOut]:
        """Render each viewpoint sequentially; identical-resolution
        viewpoints share one compiled executable (the per-view render is
        itself one fused jit program — there is no cross-view batching,
        matching what the reference's production path actually does)."""
        return [self.render_single(params, vp, bg=bg) for vp in viewpoints]

    def render_with_depth(self, params, viewpoint: Dict, bg=None,
                          render_mode: str = "RGB+ED") -> Dict:
        out = self.render_single(params, viewpoint, bg=bg)
        ed = out.depth / jnp.maximum(out.alpha, 1e-10)
        renders = {
            "RGB": out.render,
            "D": out.depth[..., None],
            "ED": ed[..., None],
            "RGB+D": jnp.concatenate([out.render, out.depth[..., None]], -1),
            "RGB+ED": jnp.concatenate([out.render, ed[..., None]], -1),
        }
        return {
            "render": renders[render_mode],
            "alpha": out.alpha,
            "depth": out.depth,
            "means2d": out.means2d,
            "radii": out.radii,
            "visibility_filter": out.visibility,
        }

    def cache_stats(self) -> Dict[str, int]:
        return {"hits": self.cache_hits, "misses": self.cache_misses}


def _unpack_params(params):
    from gaussian_splatting_tpu.models.gaussians import GaussianParams

    if isinstance(params, GaussianParams):
        return (params.means, params.quats, params.log_scales,
                params.logit_opacities, params.sh_coeffs)
    means = jnp.asarray(params["means3D"])
    quats = jnp.asarray(params.get("rotations", params.get("quats")))
    log_scales = jnp.asarray(params.get("scales", params.get("log_scales")))
    logit_op = jnp.asarray(params.get("opacities", params.get("logit_opacities")))
    sh = jnp.asarray(params.get("shs", params.get("sh_coeffs")))
    return means, quats, log_scales, logit_op, sh
