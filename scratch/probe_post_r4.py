"""Round-4 consolidated hardware measurements (run after the quality runs
free the chip):

 [A] fwd kernel isolated: queue + direct unaligned DMA vs aligned+roll.
 [B] binning depth_bits 0 vs 16 (in-situ full forward).
 [C] gradient-reduce stage split: slice extraction+mask / sort / pack_rows
     / segsum, at the bench grad-buffer size.
 [D] full fwd+bwd via rasterize_tiled with the best flags.

Run: python scratch/probe_post_r4.py [stages e.g. ABCD]
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
    _fwd_kernel_q, rasterize_tiled, rasterize_grad_meta)
from gaussian_splatting_tpu.ops.tiling import (
    cdiv, chunk_queue, class_caps, exact_tile_counts, isect_and_sort,
    pack_rows, squeeze_budgets_under_pow2, total_slots)
from gaussian_splatting_tpu.ops.segsum import segment_sum_sorted
from gaussian_splatting_tpu.utils.profiling import time_fn_device

STAGES = set(sys.argv[1]) if len(sys.argv) > 1 else set("ABCD")
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
GF = 0.87

args6 = (means2d, conics, colors, opac, depths, radii)


def get_binned():
    b = jax.jit(lambda m, c2, col, o, dd, r: isect_and_sort(
        m, c2, col, o, dd, r, width, height, ts, chunk, MAXT,
        class_budgets=BUD, interpret=interp))(*args6)
    jax.block_until_ready(b.sorted_soa)
    return b


def stage_A():
    b = get_binned()
    wtile, cum, n_work = jax.jit(lambda c: chunk_queue(c, chunk, W_CAP))(
        b.counts)
    nwork1 = n_work.reshape(1)

    def make_q(direct):
        win = chunk if direct else 2 * chunk
        return pl.pallas_call(
            functools.partial(_fwd_kernel_q, ts=ts, ntx=ntx, chunk=chunk,
                              w_cap=W_CAP, sat_skip=True, direct_dma=direct),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(W_CAP,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    (1, 8, P), lambda w, wt, *_: (wt[w], 0, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, 16, win), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.VMEM((P, 1), jnp.float32),
                    pltpu.SMEM((2,), jnp.int32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
            interpret=interp,
        )

    ref_out = None
    for name, direct in (("aligned+roll", False), ("direct-dma", True)):
        q = make_q(direct)
        o = jax.jit(q)(wtile, cum, b.tile_starts, b.counts, nwork1,
                       b.sorted_soa)
        mask = np.asarray(b.counts) > 0
        if ref_out is None:
            ref_out = o
        else:
            e = float(jnp.max(jnp.abs(ref_out[mask] - o[mask])))
            print(f"[A] parity direct vs aligned: {e:.3e}", flush=True)

        def fn(s, wt, cm, st, ct, nw, soa):
            return q(wt, cm, st, ct, nw, soa * s)[:, 0:5]

        dt = time_fn_device(fn, (wtile, cum, b.tile_starts, b.counts,
                                 nwork1, b.sorted_soa), reps=REPS)
        print(f"[A] fwd kernel queue {name}: {dt * 1e3:7.2f} ms", flush=True)


def stage_B():
    for db in (0, 16):
        def fwd(s, m, c2, col, o, dd, r):
            img, alpha, _ = rasterize_tiled(
                m * s, c2, col, o, dd, r, width, height, tile_size=ts,
                chunk=chunk, max_tiles_per_gaussian=MAXT, class_budgets=BUD,
                depth_bits=db, interpret=interp, depth_grad=False,
                reduce_slices=4, grad_buffer_frac=GF)
            return jnp.sum(img) + jnp.sum(alpha)

        dt = time_fn_device(fwd, args6, reps=REPS)
        print(f"[B] full fwd depth_bits={db:2d}: {dt * 1e3:7.2f} ms",
              flush=True)


def stage_C():
    # Fabricate a grad buffer at the bench occupancy: gids random in [0, N),
    # ~13.5% sentinel tail (occupancy 0.865).
    pcap = (int(n_slots * GF) // chunk + 1) * chunk
    nw = int(pcap * 0.865) // chunk * chunk
    key_np = np.concatenate([
        rng.integers(0, N, size=(nw,)).astype(np.float32),
        np.full((pcap - nw,), float(N), np.float32)])
    grad = np.zeros((16, pcap), np.float32)
    grad[0] = key_np
    for r in range(1, 10):
        grad[r] = rng.uniform(size=(pcap,)).astype(np.float32)
    grad_j = jnp.asarray(grad)
    nw_j = jnp.asarray(nw, jnp.int32)
    K = 4
    m = pcap // K

    def full(s, g):
        from gaussian_splatting_tpu.ops.tiling import reduce_padded_grads
        gr = reduce_padded_grads(g * s, N, nw_j, interpret=interp,
                                 with_depth=False, sort_slices=K)
        return [v[::4097] for v in gr.values()]

    print(f"[C] pcap={pcap} nw={nw}", flush=True)
    dt = time_fn_device(full, (grad_j,), reps=REPS)
    print(f"[C] reduce full (K=4): {dt * 1e3:7.2f} ms", flush=True)

    def sorts_only(s, g):
        outs = []
        for i in range(K):
            pos_ok = jnp.arange(i * m, (i + 1) * m) < nw_j
            sl = lambda r: jax.lax.slice_in_dim(g[r], i * m, (i + 1) * m)
            key = jnp.where(pos_ok, sl(0) * s, float(N))
            pays = tuple(jnp.where(pos_ok, sl(r), 0.0) for r in range(1, 10))
            ops = jax.lax.sort((key,) + pays, num_keys=1)
            outs.append([o[::4097] for o in ops])
        return outs

    dt = time_fn_device(sorts_only, (grad_j,), reps=REPS)
    print(f"[C] reduce sorts+mask only (K=4): {dt * 1e3:7.2f} ms", flush=True)

    # pack_rows + segsum on presorted slices.
    sorted_slices = []
    for i in range(K):
        sl = [np.sort(key_np[i * m:(i + 1) * m])] + \
             [grad[r, i * m:(i + 1) * m] for r in range(1, 10)]
        sorted_slices.append([jnp.asarray(x) for x in sl])
    flat = [x for slc in sorted_slices for x in slc]

    def seg_only(s, *flat_ops):
        outs = []
        for i in range(K):
            ops = flat_ops[i * 10:(i + 1) * 10]
            ops = (ops[0],) + tuple(p * s for p in ops[1:])
            stacked = pack_rows(ops, sentinel=float(N), interpret=interp)
            outs.append(segment_sum_sorted(stacked, N, interpret=interp))
        tot = outs[0]
        for o in outs[1:]:
            tot = tot + o
        return tot[:, ::4097]

    dt = time_fn_device(seg_only, tuple(flat), reps=REPS)
    print(f"[C] pack_rows+segsum+add only (K=4): {dt * 1e3:7.2f} ms",
          flush=True)


def stage_D():
    best = dict(depth_bits=16, direct_dma=True)
    for name, kw in (("r3-flags", dict(depth_bits=0, direct_dma=False)),
                     ("best", best)):
        def fb(s, m, c2, col, o, dd, r):
            def loss2(m, c2, col, o, dd):
                img, alpha, _ = rasterize_tiled(
                    m * s, c2, col, o, dd, r, width, height, tile_size=ts,
                    chunk=chunk, max_tiles_per_gaussian=MAXT,
                    class_budgets=BUD, grad_buffer_frac=GF, reduce_slices=4,
                    interpret=interp, depth_grad=False, **kw)
                return jnp.sum(img) + jnp.sum(alpha)
            return jax.grad(loss2, argnums=(0, 1, 2, 3, 4))(m, c2, col, o, dd)

        dt = time_fn_device(fb, args6, reps=REPS)
        mpix = width * height / dt / 1e6
        print(f"[D] fwd+bwd {name}: {dt * 1e3:7.2f} ms  ({mpix:.2f} Mpix/s)",
              flush=True)


if "A" in STAGES:
    stage_A()
if "B" in STAGES:
    stage_B()
if "C" in STAGES:
    stage_C()
if "D" in STAGES:
    stage_D()
