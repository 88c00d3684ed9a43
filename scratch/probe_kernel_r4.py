"""Round-4 kernel probes (VERDICT #8): where do the 35 ms fwd / 58 ms bwd
actually go, relative to the pair-math model?

Measures, at the bench scene (1M @ 1080p unless overridden):
 1. chunks actually VISITED by the forward sweep (early termination) via a
    counter variant of the kernel — the roofline currently prices ALL
    n_isect x 256 pairs; if saturation skips a big tail, both the measured
    efficiency and the roofline model are off.
 2. per-program (per-tile) fixed overhead: same total chunk count laid out
    over many vs few tiles, with opacity=0 so no early termination and zero
    blend contribution — pure pair-math + pipeline overhead.
 3. chunk=128 vs 256 on the full fwd+bwd (scan is 7 vs 8 stages; padding
    waste halves; DMA count doubles).
 4. depth_bits=16 single-key binning sort vs the 2-key exact sort.

Run: python scratch/probe_kernel_r4.py [N]
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
    _chunk_alpha, _pixel_coords, _prefix_prod_lanes, rasterize_tiled,
    T_EARLY_STOP)
from gaussian_splatting_tpu.ops.tiling import (
    cdiv, class_caps, exact_tile_counts, isect_and_sort,
    squeeze_budgets_under_pow2)
from gaussian_splatting_tpu.utils.profiling import time_fn_device

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
STAGES = set((sys.argv[2] if len(sys.argv) > 2 else "1234"))
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


# ---------------------------------------------------------------- probe 1
def _fwd_count_kernel(starts_ref, counts_ref, soa_ref, out_ref, meta_ref,
                      scratch, sem, smem, *, tsz, ntx, chunk, n_tiles):
    """Forward sweep clone that also counts visited chunks and total chunks
    (meta = [visited, total, visited_pairs_proxy])."""
    P = tsz * tsz
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    shift = jax.lax.rem(start, chunk)
    base = start - shift
    n_chunks = pl.cdiv(count, chunk)
    px, py = _pixel_coords(t, tsz, ntx)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    @pl.when(t == 0)
    def _():
        smem[0] = 0
        smem[1] = 0

    def start_dma(i):
        off = pl.multiple_of(base + i * chunk, chunk)
        pltpu.make_async_copy(
            soa_ref.at[:, pl.ds(off, 2 * chunk)],
            scratch.at[jax.lax.rem(i, 2)],
            sem.at[jax.lax.rem(i, 2)],
        ).start()

    @pl.when(n_chunks > 0)
    def _():
        start_dma(jnp.int32(0))

    def body(carry):
        i, acc, tcar = carry

        @pl.when(i + 1 < n_chunks)
        def _():
            start_dma(i + 1)
        slot = jax.lax.rem(i, 2)
        off = pl.multiple_of(base + i * chunk, chunk)
        pltpu.make_async_copy(
            soa_ref.at[:, pl.ds(off, 2 * chunk)], scratch.at[slot], sem.at[slot]
        ).wait()
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
            preferred_element_type=jnp.float32)
        tcar = tcar * jnp.min(jnp.where(mask, prod_incl, 1.0), axis=1,
                              keepdims=True)
        smem[0] = smem[0] + 1
        return i + 1, acc, tcar

    def cond(carry):
        i, _, tcar = carry
        return (i < n_chunks) & (jnp.max(tcar) > T_EARLY_STOP)

    init = (jnp.int32(0), jnp.zeros((8, P), jnp.float32),
            jnp.ones((P, 1), jnp.float32))
    ie, acc, _ = jax.lax.while_loop(cond, body, init)

    @pl.when(ie < n_chunks)
    def _():
        off = pl.multiple_of(base + ie * chunk, chunk)
        pltpu.make_async_copy(
            soa_ref.at[:, pl.ds(off, 2 * chunk)],
            scratch.at[jax.lax.rem(ie, 2)],
            sem.at[jax.lax.rem(ie, 2)],
        ).wait()

    smem[1] = smem[1] + n_chunks
    out_ref[0] = acc

    @pl.when(t == n_tiles - 1)
    def _():
        meta_ref[0, 0] = smem[0]
        meta_ref[0, 1] = smem[1]


@functools.lru_cache(maxsize=None)
def _make_fwd_count(T, P, chunk):
    return pl.pallas_call(
        functools.partial(_fwd_count_kernel, tsz=ts, ntx=ntx, chunk=chunk,
                          n_tiles=T),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((1, 8, P), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2), lambda t, *_: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 16, 2 * chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((2,), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        ],
        interpret=interp,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def probe_visited():
    b = jax.jit(lambda m, c2, col, o, dd, r: isect_and_sort(
        m, c2, col, o, dd, r, width, height, ts, chunk, MAXT,
        class_budgets=BUD, interpret=interp))(
            means2d, conics, colors, opac, depths, radii)
    call = _make_fwd_count(T, ts * ts, chunk)
    out, meta = jax.jit(call)(b.tile_starts, b.counts, b.sorted_soa)
    visited, total = int(meta[0, 0]), int(meta[0, 1])
    n_isect = int(b.n_isect)
    print(f"[1] chunks visited {visited} / total {total} "
          f"({100.0 * visited / max(total, 1):.1f}%)  "
          f"n_isect={n_isect} pairs_upper={total * chunk * 256 / 1e9:.2f}G "
          f"pairs_visited={visited * chunk * 256 / 1e9:.2f}G", flush=True)
    return b


if "1" in STAGES:
    probe_visited()


# ---------------------------------------------------------------- probe 2
def probe_tile_overhead():
    """Same chunk workload over many vs few tiles: fabricate a sorted SoA of
    C_total chunks, opacity=0 (contrib gate always false -> no early term,
    full VPU sweep), distributed over n_tiles tiles."""
    from gaussian_splatting_tpu.ops.rasterize_pallas import _make_core

    C_total = 14336  # ~ the bench's chunk count, chunk=256 -> 3.67M entries
    M = C_total * chunk
    for n_tiles_used in (8160, 2040, 510):
        per_tile = C_total // n_tiles_used
        counts = np.zeros((T,), np.int32)
        counts[:n_tiles_used] = per_tile * chunk
        starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        soa = np.zeros((16, M + 2 * chunk), np.float32)
        # mean far away so sigma>0 but alpha=0 via op row 5 = 0.
        soa[0, :] = 1e6
        soa[1, :] = 1e6
        soa[2, :] = 1.0
        soa[4, :] = 1.0
        starts_j = jnp.asarray(starts)
        counts_j = jnp.asarray(counts)
        soa_j = jnp.asarray(soa)
        core = _make_core(ts, ntx, nty, chunk, N, MAXT, width, height,
                          interp, class_budgets=BUD)
        # reuse the fwd pallas_call inside core via the counting kernel's
        # sibling: simplest is to call the count kernel (same math).
        call = _make_fwd_count(T, ts * ts, chunk)

        def fn(s, st, ct, so):
            out, meta = call(st, ct, so * s)
            return jnp.sum(out[:, 4]) + jnp.float32(meta[0, 0])

        dt = time_fn_device(fn, (starts_j, counts_j, soa_j), reps=REPS)
        print(f"[2] fwd {C_total} chunks over {n_tiles_used:5d} tiles "
              f"({per_tile} chunks/tile): {dt * 1e3:7.2f} ms", flush=True)


if "2" in STAGES:
    probe_tile_overhead()


# ---------------------------------------------------------------- probe 3
def probe_chunk_size():
    for ck in (256, 128):
        def fwd_only(s, m, c2, col, o, dd, r):
            img, alpha, _ = rasterize_tiled(
                m * s, c2, col, o, dd, r, width, height, tile_size=ts,
                chunk=ck, max_tiles_per_gaussian=MAXT, class_budgets=BUD,
                interpret=interp, depth_grad=False, reduce_slices=4,
                grad_buffer_frac=0.87)
            return jnp.sum(img) + jnp.sum(alpha)

        args = (means2d, conics, colors, opac, depths, radii)
        dt_f = time_fn_device(fwd_only, args, reps=REPS)
        g = jax.grad(fwd_only, argnums=(1, 2, 3, 4, 5))
        dt_fb = time_fn_device(lambda s, *a: g(s, *a), args, reps=REPS)
        print(f"[3] chunk={ck}: fwd {dt_f * 1e3:7.2f} ms   "
              f"fwd+bwd {dt_fb * 1e3:7.2f} ms", flush=True)


if "3" in STAGES:
    probe_chunk_size()


# ---------------------------------------------------------------- probe 4
def probe_depth_bits():
    for db in (0, 16):
        def binfn(s, m, c2, col, o, dd, r):
            b = isect_and_sort(m * s, c2, col, o, dd, r, width, height, ts,
                               chunk, MAXT, class_budgets=BUD, depth_bits=db,
                               interpret=interp)
            return jnp.sum(b.sorted_soa[9]) + jnp.float32(b.n_isect)

        args = (means2d, conics, colors, opac, depths, radii)
        dt = time_fn_device(binfn, args, reps=REPS)
        print(f"[4] binning depth_bits={db:2d}: {dt * 1e3:7.2f} ms", flush=True)


if "4" in STAGES:
    probe_depth_bits()
