"""Round-4: cross-tile first-chunk prefetch for the forward kernel.

Hypothesis (probe_kernel_r4 [2]): each grid program pays a cold DMA wait on
its first chunk — the double-buffer pipeline drains at every tile boundary,
and at ~1.3 visited chunks/tile that cold wait dominates. This variant
dedicates scratch slot 2 to "chunk 0", issued by the PREVIOUS program right
after its own sweep finishes (overlapping the DMA with the output flush,
program transition, and next program's scalar setup).

Protocol (grid is sequential on one core):
 - chunk 0 of tile t reads slot 2, whose DMA was issued by program t-1
   (or by t itself at entry when t == 0), guarded on counts[t] > 0;
 - chunks i >= 1 double-buffer through slots i % 2 exactly as stock;
 - after its sweep (and the early-exit drain), program t issues tile t+1's
   chunk-0 DMA into slot 2.

Run: python scratch/probe_prefetch_r4.py [N]
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
    _chunk_alpha, _pixel_coords, _prefix_prod_lanes, T_EARLY_STOP)
from gaussian_splatting_tpu.ops.tiling import (
    cdiv, class_caps, exact_tile_counts, isect_and_sort,
    squeeze_budgets_under_pow2)
from gaussian_splatting_tpu.utils.profiling import time_fn_device

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
width, height = 1920, 1080
ts, MAXT, chunk = 16, 16, 256
REPS = 6
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
interp = jax.default_backend() != "tpu"


def _fwd_kernel_pf(starts_ref, counts_ref, soa_ref, out_ref, scratch, sem,
                   *, tsz, ntx, chunk, n_tiles):
    P = tsz * tsz
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    shift = jax.lax.rem(start, chunk)
    base = start - shift
    n_chunks = pl.cdiv(count, chunk)
    px, py = _pixel_coords(t, tsz, ntx)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def dma(i, slot):
        off = pl.multiple_of(base + i * chunk, chunk)
        return pltpu.make_async_copy(
            soa_ref.at[:, pl.ds(off, 2 * chunk)],
            scratch.at[slot], sem.at[slot])

    def dma_next_first(nt_start):
        sh = jax.lax.rem(nt_start, chunk)
        off = pl.multiple_of(nt_start - sh, chunk)
        return pltpu.make_async_copy(
            soa_ref.at[:, pl.ds(off, 2 * chunk)],
            scratch.at[2], sem.at[2])

    # t == 0 self-issues its first chunk; all others were issued by t-1.
    @pl.when((t == 0) & (n_chunks > 0))
    def _():
        dma_next_first(start).start()

    def body(carry):
        i, acc, tcar = carry

        @pl.when(i + 1 < n_chunks)
        def _():
            dma(i + 1, jax.lax.rem(i + 1, 2)).start()

        slot = jnp.where(i == 0, 2, jax.lax.rem(i, 2))
        dma(i, slot).wait()
        window = scratch[slot]
        data = pltpu.roll(window, 2 * chunk - shift, 1)[:, :chunk]
        valid = (i * chunk + col) < count
        alpha, *_ = _chunk_alpha(data, px, py, valid)
        one_m = 1.0 - alpha
        prod_incl = _prefix_prod_lanes(one_m, chunk)
        prod_excl = jnp.where(col == 0, 1.0, pltpu.roll(prod_incl, 1, 1))
        t_after = tcar * prod_incl
        mask = t_after > T_EARLY_STOP
        w = jnp.where(mask, alpha * tcar * prod_excl, 0.0)
        extras = data[6:14, :]
        ew = jnp.concatenate(
            [extras[0:5], jnp.zeros((3, chunk), jnp.float32)], axis=0)
        acc = acc + jax.lax.dot_general(
            ew, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        tcar = tcar * jnp.min(jnp.where(mask, prod_incl, 1.0), axis=1,
                              keepdims=True)
        return i + 1, acc, tcar

    def cond(carry):
        i, _, tcar = carry
        return (i < n_chunks) & (jnp.max(tcar) > T_EARLY_STOP)

    init = (jnp.int32(0), jnp.zeros((8, P), jnp.float32),
            jnp.ones((P, 1), jnp.float32))
    ie, acc, _ = jax.lax.while_loop(cond, body, init)

    # Drain the in-flight prefetch after an early exit (ie >= 1 whenever
    # anything was issued; chunk ie sits in slot ie % 2).
    @pl.when((ie < n_chunks) & (ie >= 1))
    def _():
        dma(ie, jax.lax.rem(ie, 2)).wait()

    # Hand the baton: issue tile t+1's first chunk into slot 2.
    @pl.when(t + 1 < n_tiles)
    def _():
        nxt_start = starts_ref[t + 1]
        nxt_count = counts_ref[t + 1]

        @pl.when(nxt_count > 0)
        def _():
            dma_next_first(nxt_start).start()

    out_ref[0] = acc


@functools.lru_cache(maxsize=None)
def _make_fwd_pf(T, P, chunk):
    return pl.pallas_call(
        functools.partial(_fwd_kernel_pf, tsz=ts, ntx=ntx, chunk=chunk,
                          n_tiles=T),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 8, P), lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((3, 16, 2 * chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
        interpret=interp,
    )


def main():
    from gaussian_splatting_tpu.ops.rasterize_pallas import _make_core

    b = jax.jit(lambda m, c2, col, o, dd, r: isect_and_sort(
        m, c2, col, o, dd, r, width, height, ts, chunk, MAXT,
        class_budgets=BUD, interpret=interp))(
            means2d, conics, colors, opac, depths, radii)
    jax.block_until_ready(b.sorted_soa)

    # Stock fwd kernel (same inputs, isolated from binning).
    core = _make_core(ts, ntx, nty, chunk, N, MAXT, width, height, interp,
                      class_budgets=BUD)
    # core() includes binning; time the raw fwd_call instead via the pf
    # variant vs a second compile of the stock kernel body. Easiest stock
    # proxy: the counting kernel in probe_kernel_r4 measured [2]; here
    # compare pf against a re-made stock call.
    from gaussian_splatting_tpu.ops.rasterize_pallas import _fwd_kernel

    stock = pl.pallas_call(
        functools.partial(_fwd_kernel, ts=ts, ntx=ntx, chunk=chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 8, ts * ts), lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 16, 2 * chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((T, 8, ts * ts), jnp.float32),
        interpret=interp,
    )
    pf = _make_fwd_pf(T, ts * ts, chunk)

    o1 = jax.jit(stock)(b.tile_starts, b.counts, b.sorted_soa)
    o2 = jax.jit(pf)(b.tile_starts, b.counts, b.sorted_soa)
    err = float(jnp.max(jnp.abs(o1 - o2)))
    print(f"parity |stock - pf| max = {err:.3e}", flush=True)
    assert err == 0.0, "prefetch variant must be bit-identical"

    for name, call in (("stock", stock), ("prefetch", pf)):
        def fn(s, st, ct, soa):
            return call(st, ct, soa * s)[:, 0:5]

        dt = time_fn_device(fn, (b.tile_starts, b.counts, b.sorted_soa),
                            reps=REPS)
        print(f"fwd kernel {name:9s}: {dt * 1e3:7.2f} ms", flush=True)


main()
