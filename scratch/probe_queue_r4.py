"""Round-4: isolated kernel timings — stock while-loop fwd vs flat-queue fwd
with the saturation skip (a) lag-2 ping-pong, (b) disabled entirely — at the
bench binning. Then the full fwd+bwd via rasterize_tiled queue vs loop.

Run: python scratch/probe_queue_r4.py
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_splatting_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from gaussian_splatting_tpu.ops.rasterize_pallas import (
    _fwd_kernel, _fwd_kernel_q, rasterize_tiled)
from gaussian_splatting_tpu.ops.tiling import (
    cdiv, chunk_queue, class_caps, exact_tile_counts, isect_and_sort,
    squeeze_budgets_under_pow2, total_slots)
from gaussian_splatting_tpu.utils.profiling import time_fn_device

N = 1_000_000
width, height = 1920, 1080
ts, MAXT, chunk = 16, 16, 256
REPS = 6
print(f"backend: {jax.default_backend()}", flush=True)

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

caps = np.asarray(class_caps(MAXT))
nt = np.minimum(exact_tile_counts(means2d, radii, width, height, ts,
                                  conics=np.asarray(conics),
                                  opacities=np.asarray(opac)), MAXT)
cls = np.searchsorted(caps, np.clip(nt, 1, MAXT))
hist = np.bincount(cls[nt > 0], minlength=len(caps))[:len(caps)]
budgets = tuple(int(np.ceil(h * 1.05 / 128) * 128 + 128) for h in hist)
hard_min = tuple(int(np.ceil(h / 128) * 128) for h in hist)
BUD = squeeze_budgets_under_pow2(budgets, hard_min, caps)
ntx, nty = cdiv(width, ts), cdiv(height, ts)
T = ntx * nty
P = ts * ts
interp = jax.default_backend() != "tpu"
n_slots = total_slots(N, MAXT, BUD)
W_CAP = n_slots // chunk + T

b = jax.jit(lambda m, c2, col, o, dd, r: isect_and_sort(
    m, c2, col, o, dd, r, width, height, ts, chunk, MAXT,
    class_budgets=BUD, interpret=interp))(
        means2d, conics, colors, opac, depths, radii)
jax.block_until_ready(b.sorted_soa)
wtile, cum, n_work = jax.jit(
    lambda c: chunk_queue(c, chunk, W_CAP))(b.counts)
nwork1 = n_work.reshape(1)
print(f"n_work={int(n_work)} W_CAP={W_CAP}", flush=True)

stock = pl.pallas_call(
    functools.partial(_fwd_kernel, ts=ts, ntx=ntx, chunk=chunk),
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, P), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 16, 2 * chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    ),
    out_shape=jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
    interpret=interp,
)


def make_q(sat_skip):
    return pl.pallas_call(
        functools.partial(_fwd_kernel_q, ts=ts, ntx=ntx, chunk=chunk,
                          w_cap=W_CAP, sat_skip=sat_skip),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(W_CAP,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, 8, P), lambda w, wt, *_: (wt[w], 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 16, 2 * chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((P, 1), jnp.float32),
                pltpu.SMEM((2,), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
        interpret=interp,
    )


o1 = jax.jit(stock)(b.tile_starts, b.counts, b.sorted_soa)
for name, skip in (("q-lag2", True), ("q-noskip", False)):
    q = make_q(skip)
    o2 = jax.jit(q)(wtile, cum, b.tile_starts, b.counts, nwork1, b.sorted_soa)
    mask = np.asarray(b.counts) > 0
    e = float(jnp.max(jnp.abs(o1[mask] - o2[mask])))
    print(f"parity stock vs {name}: {e:.3e}", flush=True)

    def fn(s, wt, cm, st, ct, nw, soa):
        return q(wt, cm, st, ct, nw, soa * s)[:, 0:5]

    dt = time_fn_device(fn, (wtile, cum, b.tile_starts, b.counts, nwork1,
                             b.sorted_soa), reps=REPS)
    print(f"fwd kernel {name}: {dt * 1e3:7.2f} ms", flush=True)


def fn_stock(s, st, ct, soa):
    return stock(st, ct, soa * s)[:, 0:5]


dt = time_fn_device(fn_stock, (b.tile_starts, b.counts, b.sorted_soa),
                    reps=REPS)
print(f"fwd kernel stock : {dt * 1e3:7.2f} ms", flush=True)
