"""Independent sequential NumPy rasterizer used ONLY in tests.

This is a deliberately naive per-pixel, per-gaussian loop implementing the
classic 3DGS front-to-back compositing semantics (alpha clamp 0.999, 1/255
skip, T <= 1e-4 early break, pixel centers at +0.5). It cross-checks the
vectorized JAX oracle — two independently-written implementations agreeing is
the correctness anchor for everything above them.
"""

import numpy as np

ALPHA_CLAMP = 0.999
ALPHA_SKIP = 1.0 / 255.0
T_EARLY_STOP = 1e-4


def rasterize_np(means2d, conics, colors, opacities, depths, radii,
                 width, height, bg=None, tile_size=None):
    N = means2d.shape[0]
    C = colors.shape[-1]
    if bg is None:
        bg = np.zeros(C, np.float64)
    order = np.argsort(np.where(radii > 0, depths, np.inf), kind="stable")
    img = np.zeros((height, width, C), np.float64)
    alpha_img = np.zeros((height, width), np.float64)
    depth_img = np.zeros((height, width), np.float64)
    for py in range(height):
        for px in range(width):
            x = px + 0.5
            y = py + 0.5
            T = 1.0
            acc = np.zeros(C, np.float64)
            dacc = 0.0
            for idx in order:
                if radii[idx] <= 0:
                    continue
                if tile_size is not None:
                    ts = float(tile_size)
                    r = float(radii[idx])
                    tx, ty = np.floor(x / ts), np.floor(y / ts)
                    if not (np.floor((means2d[idx, 0] - r) / ts) <= tx < np.ceil((means2d[idx, 0] + r) / ts)):
                        continue
                    if not (np.floor((means2d[idx, 1] - r) / ts) <= ty < np.ceil((means2d[idx, 1] + r) / ts)):
                        continue
                dx = x - means2d[idx, 0]
                dy = y - means2d[idx, 1]
                A, B, Cc = conics[idx]
                sigma = 0.5 * (A * dx * dx + Cc * dy * dy) + B * dx * dy
                alpha = min(ALPHA_CLAMP, opacities[idx] * np.exp(-sigma))
                if sigma < 0.0 or alpha < ALPHA_SKIP:
                    continue
                next_T = T * (1.0 - alpha)
                if next_T <= T_EARLY_STOP:
                    break
                w = alpha * T
                acc += w * colors[idx]
                dacc += w * depths[idx]
                T = next_T
            img[py, px] = acc + T * bg
            alpha_img[py, px] = 1.0 - T
            depth_img[py, px] = dacc
    return img, alpha_img, depth_img
