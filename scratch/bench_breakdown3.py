"""Round-2 breakdown v3: isolate bin-sort / fwd kernel / bwd kernel /
grad-reduce, plus chunk and depth_bits variants, with sheared windows.
Cache-busting seeds defeat the axon memoizer."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from gaussian_splatting_tpu.ops.tiling import (
    class_caps, exact_tile_counts, fill_budgets_to_pow2, isect_and_sort,
    padded_capacity_for, reduce_padded_grads, total_slots, cdiv)
from gaussian_splatting_tpu.ops.rasterize_pallas import rasterize_tiled

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
width, height = 1920, 1080
ts = 16
MAXT = 16
REPS = 5
print(f"backend: {jax.default_backend()} N: {N}", flush=True)

rng = np.random.default_rng(0)
means2d = jnp.asarray(rng.uniform([0, 0], [width, height], size=(N, 2)), jnp.float32)
sx = rng.lognormal(mean=0.8, sigma=0.5, size=(N,)).clip(0.7, 12.0)
sy = rng.lognormal(mean=0.8, sigma=0.5, size=(N,)).clip(0.7, 12.0)
th = rng.uniform(0, np.pi, size=(N,)); c, s = np.cos(th), np.sin(th)
a = c*c*sx**2 + s*s*sy**2; b = c*s*(sx**2-sy**2); d = s*s*sx**2 + c*c*sy**2
det = a*d - b*b
conics = jnp.asarray(np.stack([d/det, -b/det, a/det], 1), jnp.float32)
colors = jnp.asarray(rng.uniform(size=(N, 3)), jnp.float32)
opac = jnp.asarray(rng.uniform(0.3, 0.9, size=(N,)), jnp.float32)
depths = jnp.asarray(rng.uniform(1, 10, size=(N,)), jnp.float32)
radii = jnp.asarray(np.ceil(3 * np.maximum(sx, sy)), jnp.int32)
seeds = [jnp.float32(1.0 + 1e-7 * i) for i in range(REPS + 1)]

T = cdiv(width, ts) * cdiv(height, ts)
caps = np.asarray(class_caps(MAXT))
nt = np.minimum(exact_tile_counts(means2d, radii, width, height, ts,
                                  conics=np.asarray(conics),
                                  opacities=np.asarray(opac)), MAXT)
cls = np.searchsorted(caps, np.clip(nt, 1, MAXT))
hist = np.bincount(cls[nt > 0], minlength=len(caps))[:len(caps)]


def budgets_for(chunk):
    b = tuple(int(np.ceil(h * 1.05 / 128) * 128 + 128) for h in hist)
    return fill_budgets_to_pow2(b, caps, overhead=T * chunk)


def timeit(name, fn, reps=REPS):
    out = fn(seeds[-1])
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(reps):
        out = fn(seeds[i])
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return out, dt


for chunk in (256, 128):
    BUD = budgets_for(chunk)
    slots = total_slots(N, MAXT, BUD)
    pcap = padded_capacity_for(slots, T, chunk)
    print(f"\n== chunk {chunk}: slots {slots} pcap {pcap}", flush=True)

    bin_fn = jax.jit(lambda s, _b=BUD, _c=chunk: isect_and_sort(
        means2d * s, conics, colors, opac, depths, radii,
        width, height, ts, _c, MAXT, class_budgets=_b))
    b, t_bin = timeit("  bin+sort", bin_fn)
    print("    n_isect:", int(b.n_isect), " dropped:", int(b.n_dropped),
          " budget_dropped:", int(b.n_budget_dropped), flush=True)

    # Grad reduce standalone at the real pcap with a realistic gid payload.
    gids = jnp.asarray(
        rng.integers(0, N + 1, size=(pcap,)).astype(np.float32))
    gbuf = jnp.concatenate(
        [jnp.asarray(rng.normal(size=(11, pcap)).astype(np.float32)),
         gids[None, :], jnp.zeros((4, pcap), jnp.float32)], axis=0)
    red_fn = jax.jit(lambda s: reduce_padded_grads(
        gbuf * s, N, jnp.int32(pcap)))
    _, t_red = timeit("  grad reduce (sort+cumsum)", red_fn)

    fwd = jax.jit(lambda s, _b=BUD, _c=chunk: rasterize_tiled(
        means2d * s, conics, colors, opac, depths, radii, width, height,
        tile_size=ts, chunk=_c, max_tiles_per_gaussian=MAXT,
        class_budgets=_b, interpret=False)[0])
    _, t_fwd = timeit("  full fwd", fwd)

    def loss(m, c2, col, o, dd, s_, _b=BUD, _c=chunk):
        img, alpha, depth = rasterize_tiled(
            m * s_, c2, col, o, dd, radii, width, height,
            tile_size=ts, chunk=_c, max_tiles_per_gaussian=MAXT,
            class_budgets=_b, interpret=False)
        return jnp.sum(img) + jnp.sum(alpha) + 0.01 * jnp.sum(depth)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    _, t_all = timeit("  full fwd+bwd",
                      lambda s: g(means2d, conics, colors, opac, depths, s))
    px = width * height
    print(f"  -> fwd kernel ~{(t_fwd-t_bin)*1e3:.0f} ms | "
          f"bwd kernel ~{(t_all-t_fwd-t_red)*1e3:.0f} ms | "
          f"bin {t_bin*1e3:.0f} | reduce {t_red*1e3:.0f} | "
          f"fwd+bwd {px/t_all/1e6:.2f} Mpix/s", flush=True)

# depth_bits variant at chunk 256
BUD = budgets_for(256)
g_db = jax.jit(jax.grad(
    lambda m, c2, col, o, dd, s_: rasterize_tiled(
        m * s_, c2, col, o, dd, radii, width, height,
        tile_size=ts, chunk=256, max_tiles_per_gaussian=MAXT,
        class_budgets=BUD, depth_bits=16, interpret=False)[0].sum(),
    argnums=(0,)))
_, t_db = timeit("fwd+bwd depth_bits=16 (img-only loss)",
                 lambda s: g_db(means2d, conics, colors, opac, depths, s))
g_nb = jax.jit(jax.grad(
    lambda m, c2, col, o, dd, s_: rasterize_tiled(
        m * s_, c2, col, o, dd, radii, width, height,
        tile_size=ts, chunk=256, max_tiles_per_gaussian=MAXT,
        class_budgets=BUD, depth_bits=0, interpret=False)[0].sum(),
    argnums=(0,)))
_, t_nb = timeit("fwd+bwd depth_bits=0  (img-only loss)",
                 lambda s: g_nb(means2d, conics, colors, opac, depths, s))
print(f"depth_bits speedup: {t_nb/t_db:.2f}x", flush=True)
