"""Run the Pallas rasterizer compiled on real TPU and compare against the
oracle (also on TPU) — forward pixels and gradients."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.ops.rasterize_ref import rasterize_reference
from gaussian_splatting_tpu.ops.rasterize_pallas import rasterize_tiled

print("backend:", jax.default_backend())
rng = np.random.default_rng(0)

width, height = 128, 96
n = 500
means2d = jnp.asarray(rng.uniform([0, 0], [width, height], size=(n, 2)), jnp.float32)
L = rng.normal(size=(n, 2, 2)) * 2.0
cov = L @ np.swapaxes(L, 1, 2) + np.eye(2)[None]
inv = np.linalg.inv(cov)
conics = jnp.asarray(np.stack([inv[:, 0, 0], inv[:, 0, 1], inv[:, 1, 1]], 1), jnp.float32)
colors = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
opac = jnp.asarray(rng.uniform(0.2, 0.95, size=(n,)), jnp.float32)
depths = jnp.asarray(rng.uniform(1, 10, size=(n,)), jnp.float32)
radii = jnp.asarray(np.ceil(3 * np.sqrt(np.linalg.eigvalsh(cov).max(1))), jnp.int32)
args = (means2d, conics, colors, opac, depths, radii)
timg = jnp.asarray(rng.uniform(size=(height, width, 3)), jnp.float32)


def f_pal(m, c, col, o, d):
    img, alpha, depth = rasterize_tiled(m, c, col, o, d, radii, width, height,
                                        tile_size=16, chunk=256, interpret=False)
    return jnp.sum((img - timg) ** 2) + 0.3 * jnp.sum(alpha**2) + 0.05 * jnp.sum(depth**2)


def f_ref(m, c, col, o, d):
    out = rasterize_reference(m, c, col, o, d, radii, width, height, tile_size=16)
    return (jnp.sum((out.image - timg) ** 2) + 0.3 * jnp.sum(out.alpha**2)
            + 0.05 * jnp.sum(out.depth**2))


t0 = time.time()
img_p = jax.jit(lambda *a: rasterize_tiled(*a, radii, width, height, tile_size=16,
                                           chunk=256, interpret=False)[0])(*args[:5])
img_p.block_until_ready()
print("pallas fwd compile+run:", time.time() - t0)
img_r = jax.jit(lambda *a: rasterize_reference(*a, radii, width, height, tile_size=16).image)(*args[:5])
err = float(jnp.abs(img_p - img_r).max())
print("fwd max abs err:", err)

gp = jax.jit(jax.grad(f_pal, argnums=(0, 1, 2, 3, 4)))(*args[:5])
gr = jax.jit(jax.grad(f_ref, argnums=(0, 1, 2, 3, 4)))(*args[:5])
for name, a, b in zip(["means2d", "conics", "colors", "opac", "depths"], gp, gr):
    a, b = np.asarray(a), np.asarray(b)
    scale = np.abs(b).max() + 1e-8
    print(f"grad {name}: max abs diff {np.abs(a - b).max():.3e}  (scale {scale:.3e})")
    assert np.abs(a - b).max() < 5e-3 * scale, name
assert err < 2e-3
print("TPU PARITY OK")
