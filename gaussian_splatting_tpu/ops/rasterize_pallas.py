"""Hand-written Pallas TPU kernels for tiled gaussian rasterization.

This is the TPU-native replacement for the reference's external CUDA
rasterizer (gsplat; invoked at reference ``gsplat_backend.py:83-97``). The
design is NOT a port of the CUDA kernel's per-pixel sequential blend — it is
re-derived for the VPU/MXU:

- Grid = one program per 16x16 image tile. Each program sweeps its
  depth-sorted intersection segment (built by ``ops/tiling.py``) in aligned
  CHUNK-sized blocks, double-stepping a manual HBM->VMEM DMA.
- Layout: pixels on *sublanes* (P = 256 rows), chunk entries on *lanes*
  (K columns). Every reduction the backward pass needs then lands naturally
  in either row-vector (per-entry grads) or column-vector (per-pixel carries)
  layout — the kernels contain zero transposes.
- The sequential front-to-back blend is replaced by a vectorized
  log-transmittance prefix scan (Hillis-Steele over lanes) plus one MXU
  matmul per chunk that accumulates [r, g, b, depth, sum_w] simultaneously;
  ``sum_w`` doubles as ``1 - T_final`` (telescoping), so alpha needs no
  separate path.
- Early termination (T <= 1e-4) is a monotone mask inside a chunk and a
  while-loop break across chunks — matching the CUDA semantics exactly.
- Backward recomputes alphas per chunk (no big residuals) in a single
  forward-order sweep: the suffix sums the gradient needs are
  ``Q_total - prefix``, where Q_total falls out of the saved forward output.
  Per-entry gradients are written to disjoint CHUNK-aligned HBM segments —
  races are impossible by construction (no atomics, unlike the CUDA bwd).

Gradients w.r.t. per-gaussian parameters are then one XLA scatter-add (the
VJP of the SoA gather in ``tiling.build_soa``).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_splatting_tpu.ops.tiling import (
    TileBinning,
    build_soa,
    cdiv,
    isect_tiles,
    padded_capacity_for,
)

ALPHA_CLAMP = 0.999
ALPHA_SKIP = 1.0 / 255.0
T_EARLY_STOP = 1e-4


def _prefix_sum_lanes(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inclusive prefix sum along axis=1 (lanes) via Hillis-Steele:
    log2(n) shift+masked-add steps. n static power of two."""
    assert (n & (n - 1)) == 0, "chunk must be a power of two"
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    d = 1
    while d < n:
        x = jnp.where(col >= d, x + pltpu.roll(x, d, 1), x)
        d *= 2
    return x


def _prefix_prod_lanes(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inclusive prefix *product* along lanes. Used for the transmittance
    chain T_k = prod_{j<=k} (1 - alpha_j) directly — no log1p/exp round trip
    (3 fewer transcendental passes per chunk than the log-space form)."""
    assert (n & (n - 1)) == 0, "chunk must be a power of two"
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    d = 1
    while d < n:
        x = jnp.where(col >= d, x * pltpu.roll(x, d, 1), x)
        d *= 2
    return x


def _chunk_alpha(data, px, py):
    """Per-(pixel, entry) alpha for one chunk.

    data: (16, K) SoA chunk; px, py: (P, 1) pixel centers.
    Returns alpha (P, K) plus recompute intermediates for backward.
    """
    mx, my = data[0:1, :], data[1:2, :]
    ca, cb, cc = data[2:3, :], data[3:4, :], data[4:5, :]
    op = data[5:6, :]
    dx = px - mx   # (P, K)
    dy = py - my
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    vis = jnp.exp(-sigma)
    araw = op * vis
    contrib = (sigma >= 0.0) & (araw >= ALPHA_SKIP)
    alpha = jnp.where(contrib, jnp.minimum(araw, ALPHA_CLAMP), 0.0)
    return alpha, sigma, vis, araw, contrib, dx, dy, ca, cb, cc, op


def _pixel_coords(t, ts, ntx):
    P = ts * ts
    tx = t % ntx
    ty = t // ntx
    pidx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tx * ts + pidx % ts).astype(jnp.float32) + 0.5
    py = (ty * ts + pidx // ts).astype(jnp.float32) + 0.5
    return px, py


def _fwd_kernel(starts_ref, counts_ref, soa_ref, out_ref, scratch, sem, *, ts, ntx, chunk):
    P = ts * ts
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    n_chunks = pl.cdiv(count, chunk)
    px, py = _pixel_coords(t, ts, ntx)

    def body(carry):
        i, acc, tcar = carry
        off = pl.multiple_of(start + i * chunk, chunk)
        dma = pltpu.make_async_copy(soa_ref.at[:, pl.ds(off, chunk)], scratch, sem)
        dma.start()
        dma.wait()
        data = scratch[:]
        alpha, *_ = _chunk_alpha(data, px, py)
        one_m = 1.0 - alpha                        # >= 1 - ALPHA_CLAMP = 1e-3
        prod_incl = _prefix_prod_lanes(one_m, chunk)
        t_after = tcar * prod_incl
        mask = t_after > T_EARLY_STOP
        w = jnp.where(mask, alpha * tcar * prod_incl / one_m, 0.0)  # (P, K)
        extras = data[6:14, :]  # rows r, g, b, depth, one, 0, 0, 0 -> (8, K)
        acc = acc + jax.lax.dot_general(
            extras, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (8, P)
        # prod over *included* entries = value of the monotone-decreasing
        # inclusive scan at the last included lane = min over masked lanes.
        tcar = tcar * jnp.min(jnp.where(mask, prod_incl, 1.0), axis=1, keepdims=True)
        return i + 1, acc, tcar

    def cond(carry):
        i, _, tcar = carry
        return (i < n_chunks) & (jnp.max(tcar) > T_EARLY_STOP)

    init = (
        jnp.int32(0),
        jnp.zeros((8, P), jnp.float32),
        jnp.ones((P, 1), jnp.float32),
    )
    _, acc, _ = jax.lax.while_loop(cond, body, init)
    out_ref[0] = acc


def _bwd_kernel(
    starts_ref, counts_ref, soa_ref, aux_ref, grad_ref, scratch, gscratch, sem, wsem,
    *, ts, ntx, chunk,
):
    P = ts * ts
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    n_chunks = pl.cdiv(count, chunk)
    px, py = _pixel_coords(t, ts, ntx)

    gpix = aux_ref[0, 0:8, :]   # (8, P) cotangent of the forward accumulators
    fout = aux_ref[0, 8:16, :]  # (8, P) saved forward output
    ones8 = jnp.ones((8, 1), jnp.float32)
    # Q_total per pixel, in column layout: sum_ch gpix*fout -> (P, 1).
    q_col = jax.lax.dot_general(
        gpix * fout, ones8, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
    )

    def body(i, carry):
        tcar, pcar = carry
        off = pl.multiple_of(start + i * chunk, chunk)
        dma = pltpu.make_async_copy(soa_ref.at[:, pl.ds(off, chunk)], scratch, sem)
        dma.start()
        dma.wait()
        data = scratch[:]
        alpha, sigma, vis, araw, contrib, dx, dy, ca, cb, cc, op = _chunk_alpha(data, px, py)
        one_m = 1.0 - alpha
        prod_incl = _prefix_prod_lanes(one_m, chunk)
        t_after = tcar * prod_incl
        mask = t_after > T_EARLY_STOP
        t_before = tcar * prod_incl / one_m
        w = jnp.where(mask, alpha * t_before, 0.0)

        extras = data[6:14, :]
        gw = jax.lax.dot_general(
            gpix, extras, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (P, K)
        gww = gw * w
        prefix_incl = pcar + _prefix_sum_lanes(gww, chunk)  # (P, K)
        suffix = q_col - prefix_incl
        d_alpha = jnp.where(mask, gw * t_before - suffix / (1.0 - alpha), 0.0)

        gate = contrib & (araw <= ALPHA_CLAMP)
        d_op_pg = jnp.where(gate, d_alpha * vis, 0.0)
        d_sigma = jnp.where(gate, -d_alpha * araw, 0.0)

        dmx = jnp.sum(-(ca * dx + cb * dy) * d_sigma, axis=0, keepdims=True)
        dmy = jnp.sum(-(cc * dy + cb * dx) * d_sigma, axis=0, keepdims=True)
        dca = jnp.sum(0.5 * dx * dx * d_sigma, axis=0, keepdims=True)
        dcb = jnp.sum(dx * dy * d_sigma, axis=0, keepdims=True)
        dcc = jnp.sum(0.5 * dy * dy * d_sigma, axis=0, keepdims=True)
        dop = jnp.sum(d_op_pg, axis=0, keepdims=True)
        d_extras = jax.lax.dot_general(
            gpix, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (8, K): dr, dg, db, ddepth, d_one(discarded), 0, 0, 0

        gscratch[0:1, :] = dmx
        gscratch[1:2, :] = dmy
        gscratch[2:3, :] = dca
        gscratch[3:4, :] = dcb
        gscratch[4:5, :] = dcc
        gscratch[5:6, :] = dop
        gscratch[6:14, :] = d_extras
        gscratch[14:16, :] = jnp.zeros((2, chunk), jnp.float32)
        wdma = pltpu.make_async_copy(gscratch, grad_ref.at[:, pl.ds(off, chunk)], wsem)
        wdma.start()
        wdma.wait()

        tcar = tcar * jnp.min(jnp.where(mask, prod_incl, 1.0), axis=1, keepdims=True)
        pcar = pcar + jnp.sum(gww, axis=1, keepdims=True)
        return tcar, pcar

    init = (jnp.ones((P, 1), jnp.float32), jnp.zeros((P, 1), jnp.float32))
    jax.lax.fori_loop(0, n_chunks, body, init)


@functools.lru_cache(maxsize=None)
def _make_rasterizer(ts, ntx, nty, chunk, pcap, interpret):
    P = ts * ts
    T = ntx * nty

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, ts=ts, ntx=ntx, chunk=chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 8, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((16, chunk), jnp.float32), pltpu.SemaphoreType.DMA(())],
        ),
        out_shape=jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, ts=ts, ntx=ntx, chunk=chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 16, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((16, chunk), jnp.float32),
                pltpu.VMEM((16, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((16, pcap), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    @jax.custom_vjp
    def raster(soa, starts, counts):
        return fwd_call(starts, counts, soa)

    def fwd(soa, starts, counts):
        out = fwd_call(starts, counts, soa)
        return out, (soa, starts, counts, out)

    def bwd(res, g):
        soa, starts, counts, out = res
        aux = jnp.concatenate([g, out], axis=1)  # (T, 16, P)
        gsoa = bwd_call(starts, counts, soa, aux)
        return gsoa, None, None

    raster.defvjp(fwd, bwd)
    return raster


def rasterize_tiled(
    means2d,
    conics,
    colors,
    opacities,
    depths,
    radii,
    width,
    height,
    bg=None,
    tile_size=16,
    isect_capacity=None,  # kept for API compat; capacity is N*max_t (static)
    chunk=256,
    max_tiles_per_gaussian=16,
    interpret=None,
    with_stats=False,
    need_grad=True,
):
    """Full tiled rasterization: binning (XLA) + Pallas fwd/bwd kernels.

    Returns (image (H, W, 3), alpha (H, W), depth (H, W)) — plus a stats dict
    (n_isect, n_dropped) when ``with_stats`` — differentiable w.r.t. the
    gaussian inputs with analytic kernel gradients. ``need_grad=False`` skips
    building the gradient-reduction inverse map (pure inference renders).
    """
    N = means2d.shape[0]
    ts = tile_size
    assert ts * ts in (64, 256, 1024), "tile_size must be 8, 16, or 32"
    ntx = cdiv(width, ts)
    nty = cdiv(height, ts)
    T = ntx * nty
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    binning = isect_tiles(
        means2d, radii, depths, width, height, ts, chunk=chunk,
        max_tiles_per_gaussian=max_tiles_per_gaussian,
        need_inverse=need_grad,
    )
    soa = build_soa(means2d, conics, colors, opacities, depths,
                    binning.padded_gauss, binning.slot_to_padded)
    pcap = padded_capacity_for(N, max_tiles_per_gaussian, T, chunk)

    raster = _make_rasterizer(ts, ntx, nty, chunk, pcap, bool(interpret))
    out = raster(soa, binning.padded_starts, binning.counts)  # (T, 8, P)

    img = out.reshape(nty, ntx, 8, ts, ts).transpose(0, 3, 1, 4, 2)
    img = img.reshape(nty * ts, ntx * ts, 8)[:height, :width]
    rgb = img[..., 0:3]
    depth_img = img[..., 3]
    alpha_img = img[..., 4]
    if bg is not None:
        rgb = rgb + (1.0 - alpha_img)[..., None] * bg[None, None, :]
    if with_stats:
        return rgb, alpha_img, depth_img, {
            "n_isect": binning.n_isect, "n_dropped": binning.n_dropped,
        }
    return rgb, alpha_img, depth_img
