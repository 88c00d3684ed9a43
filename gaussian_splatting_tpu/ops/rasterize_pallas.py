"""Hand-written Pallas TPU kernels for tiled gaussian rasterization.

This is the TPU-native replacement for the reference's external CUDA
rasterizer (gsplat; invoked at reference ``gsplat_backend.py:83-97``). The
design is NOT a port of the CUDA kernel's per-pixel sequential blend — it is
re-derived for the VPU/MXU and for what XLA does fast around it:

- XLA side (``ops/tiling.py``): ONE payload-carrying sort builds the
  kernel-ready depth-sorted SoA; no gathers, no scatters, no re-packing.
- Grid = one program per image tile. Each program sweeps its (unaligned)
  intersection segment in CHUNK blocks through an *aligned* (16, 2*CHUNK)
  VMEM window + dynamic roll — HBM DMA stays tile-aligned while segments
  start anywhere.
- Layout: pixels on sublanes (P rows), chunk entries on lanes (K columns).
  Per-entry gradient reductions land as row vectors, per-pixel carries as
  columns — zero transposes anywhere.
- The sequential front-to-back blend is replaced by a transmittance prefix
  *product* scan (Hillis-Steele over lanes, no log/exp) plus one MXU matmul
  per chunk accumulating [r, g, b, depth, sum_w]; ``sum_w`` doubles as
  ``1 - T_final`` (telescoping).
- Early termination (T <= 1e-4) is a monotone mask inside a chunk and a
  while-loop break across chunks — matching the CUDA semantics exactly.
- Backward recomputes alphas per chunk (no big residuals) in one
  forward-order sweep; suffix sums come from ``Q_total - prefix`` where
  Q_total falls out of the saved forward output. Per-entry gradients are
  appended COMPACTLY to one stream shared across tiles (VMEM staging ring +
  double-buffered bounce DMAs; grid is sequential, so no atomics needed),
  tagged with the gaussian id the kernel echoes from SoA row 11; the XLA
  side reduces them per gaussian with a payload sort + one Pallas segmented
  sum (``tiling.reduce_padded_grads``) — never a scatter-add. Early-
  terminated chunks (zero gradient) are dropped, so the reduce runs on
  ~n_isect entries instead of a padded capacity.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_splatting_tpu.ops.tiling import (
    cdiv,
    isect_and_sort,
    reduce_padded_grads,
    total_slots,
)

ALPHA_CLAMP = 0.999
ALPHA_SKIP = 1.0 / 255.0
T_EARLY_STOP = 1e-4
_PREC = jax.lax.Precision.HIGHEST


def _prefix_sum_lanes(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inclusive prefix sum along lanes — Hillis-Steele on the VPU
    (log2(n) roll+add+select stages; f32-exact order change only).

    Round 2 ran this as ONE (K, K) upper-tri MXU matmul on the theory that
    the idle MXU made it free — but at Precision.HIGHEST a (256, 256) tri
    matmul over (P, K) is 400 MFLOP/chunk of 6-pass bf16, ~2 us/chunk =
    ~37 ms of the 58 ms backward at the 1M/1080p bench (Mosaic serializes
    it with the VPU stream here). The 8-stage VPU scan costs ~24 ops/pair
    ~= 12 ms, and lower matmul precision is not an option: bf16 3-pass
    splits lose f32 payload bits and fail gradient parity."""
    assert (n & (n - 1)) == 0, "chunk must be a power of two"
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    d = 1
    while d < n:
        x = jnp.where(col >= d, x + pltpu.roll(x, d, 1), x)
        d *= 2
    return x


def _prefix_prod_lanes(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inclusive prefix *product* along lanes — the transmittance chain
    T_k = prod_{j<=k}(1 - alpha_j) computed directly, no log1p/exp."""
    assert (n & (n - 1)) == 0, "chunk must be a power of two"
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    d = 1
    while d < n:
        x = jnp.where(col >= d, x * pltpu.roll(x, d, 1), x)
        d *= 2
    return x


def _chunk_alpha(data, px, py, valid):
    """Per-(pixel, entry) alpha for one chunk.

    data: (16, K) SoA chunk; px, py: (P, 1) pixel centers; valid: (1, K).
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
    contrib = (sigma >= 0.0) & (araw >= ALPHA_SKIP) & valid
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


def _moment_basis(ts):
    """Static (6, P) basis of tile-LOCAL pixel monomials
    [1, x, y, x^2, x*y, y^2]. The backward's six per-entry reductions are
    moments of d_sigma against this basis — ONE MXU matmul instead of six
    VPU reduction chains. Tile-local coords keep x^2 <= 256 so the binomial
    recombination below loses no f32 precision."""
    P = ts * ts
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    x = (pidx % ts).astype(jnp.float32) + 0.5
    y = (pidx // ts).astype(jnp.float32) + 0.5
    one = jnp.ones((1, P), jnp.float32)
    return jnp.concatenate([one, x, y, x * x, x * y, y * y], axis=0)


def _fwd_kernel(starts_ref, counts_ref, soa_ref, out_ref, scratch, sem,
                *, ts, ntx, chunk):
    P = ts * ts
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    shift = jax.lax.rem(start, chunk)
    base = start - shift
    n_chunks = pl.cdiv(count, chunk)
    px, py = _pixel_coords(t, ts, ntx)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    # Double-buffered aligned-window DMA: slot i%2 computes while slot
    # (i+1)%2 prefetches the next chunk.
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
        one_m = 1.0 - alpha                       # >= 1 - ALPHA_CLAMP
        prod_incl = _prefix_prod_lanes(one_m, chunk)
        # Exclusive prefix product by a single lane shift — replaces the
        # per-(pixel, entry) divide prod_incl / one_m (divides are the most
        # expensive VPU op in the chunk; the shift is one roll+select).
        prod_excl = jnp.where(col == 0, 1.0, pltpu.roll(prod_incl, 1, 1))
        t_after = tcar * prod_incl
        mask = t_after > T_EARLY_STOP
        w = jnp.where(mask, alpha * tcar * prod_excl, 0.0)  # (P, K)
        extras = data[6:14, :]  # rows r, g, b, depth, one, gid, 0, 0
        ew = jnp.concatenate(
            [extras[0:5], jnp.zeros((3, chunk), jnp.float32)], axis=0
        )  # keep rgb+depth+one; gid row must not blend
        acc = acc + jax.lax.dot_general(
            ew, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC,
        )  # (8, P)
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
    ie, acc, _ = jax.lax.while_loop(cond, body, init)

    # Drain the prefetch issued for the chunk after an early exit.
    @pl.when(ie < n_chunks)
    def _():
        off = pl.multiple_of(base + ie * chunk, chunk)
        pltpu.make_async_copy(
            soa_ref.at[:, pl.ds(off, 2 * chunk)],
            scratch.at[jax.lax.rem(ie, 2)],
            sem.at[jax.lax.rem(ie, 2)],
        ).wait()

    out_ref[0] = acc


def _bwd_kernel(starts_ref, counts_ref, soa_ref, aux_ref, grad_ref, meta_ref,
                scratch, staging, bounce, sem, wsem, smem, *, ts, ntx, chunk,
                n_gaussians, n_tiles, grad_cap):
    """Backward sweep with the same double-buffered read DMA as forward.

    Gradient entries are written COMPACTLY: each processed chunk appends its
    ``valid`` entries to a staging ring shared across all tiles (dynamic-
    offset vector stores — synchronous, so an append's garbage tail past the
    cursor is safely overwritten by the next append), and full chunks flush
    to HBM with aligned DMAs through a double-buffered bounce. Per-tile
    chunk padding is gone and early-terminated chunks are DROPPED outright
    (their gradients are zero), so the reduce sort runs on ~n_isect entries
    instead of the round-1 padded capacity. ``meta`` reports the dynamic
    [n_written, n_dropped]."""
    P = ts * ts
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    shift = jax.lax.rem(start, chunk)
    base = start - shift
    n_chunks = pl.cdiv(count, chunk)
    px, py = _pixel_coords(t, ts, ntx)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    basis = _moment_basis(ts)                       # (6, P) static
    ox = ((t % ntx) * ts).astype(jnp.float32)       # tile origin
    oy = ((t // ntx) * ts).astype(jnp.float32)

    # Persistent append state: [cursor, flushed_chunks, dropped_chunks].
    @pl.when(t == 0)
    def _():
        smem[0] = 0
        smem[1] = 0
        smem[2] = 0
        meta_ref[0, 0] = 0
        meta_ref[0, 1] = 0

    gpix = aux_ref[0, 0:8, :]   # (8, P) cotangent of the forward accumulators
    fout = aux_ref[0, 8:16, :]  # (8, P) saved forward output
    ones8 = jnp.ones((8, 1), jnp.float32)
    q_col = jax.lax.dot_general(
        gpix * fout, ones8, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PREC,
    )  # (P, 1): Q_total per pixel

    def read_dma(i):
        off = pl.multiple_of(base + i * chunk, chunk)
        return pltpu.make_async_copy(
            soa_ref.at[:, pl.ds(off, 2 * chunk)],
            scratch.at[jax.lax.rem(i, 2)],
            sem.at[jax.lax.rem(i, 2)],
        )

    def flush_dma(slot, hbm_chunk):
        return pltpu.make_async_copy(
            bounce.at[slot],
            grad_ref.at[:, pl.ds(pl.multiple_of(hbm_chunk * chunk, chunk),
                                 chunk)],
            wsem.at[slot],
        )

    col2 = jax.lax.broadcasted_iota(jnp.int32, (16, 2 * chunk), 1)

    def append(gblock, valid):
        """Append ``valid`` leading columns of gblock (16, chunk) to the
        staging ring; flush a full chunk to HBM when the cursor crosses.
        Mosaic has no unaligned dynamic vector store, so the append is a
        full-window read-modify-write: roll the block to the cursor
        (dynamic rolls ARE lowered) and select by a column mask. Columns
        past ``valid`` are garbage that the next append (or the final
        sentinel fill) overwrites before any flush reads them."""
        c = smem[0]
        rolled = pltpu.roll(jnp.concatenate([gblock, gblock], axis=1), c, 1)
        staging[:, :] = jnp.where((col2 >= c) & (col2 < c + chunk),
                                  rolled, staging[:, :])
        c = c + valid
        smem[0] = c

        @pl.when(c >= chunk)
        def _():
            ok = smem[1] * chunk + chunk <= grad_cap

            @pl.when(ok)
            def _():
                nflush = smem[1]
                slot = jax.lax.rem(nflush, 2)

                # Retire this bounce slot's previous flush (nflush-2).
                @pl.when(nflush >= 2)
                def _():
                    flush_dma(slot, jnp.int32(0)).wait()
                bounce[slot] = staging[:, :chunk]
                flush_dma(slot, nflush).start()
                smem[1] = nflush + 1

            @pl.when(jnp.logical_not(ok))
            def _():
                smem[2] = smem[2] + 1
            staging[:, :chunk] = staging[:, chunk:]
            smem[0] = c - chunk

    @pl.when(n_chunks > 0)
    def _():
        read_dma(jnp.int32(0)).start()

    def cond(carry):
        i, tcar, _ = carry
        # Early termination: once every pixel is saturated, remaining chunks
        # have zero gradients — fall through to the sentinel-fill loop below.
        return (i < n_chunks) & (jnp.max(tcar) > T_EARLY_STOP)

    def body(carry):
        i, tcar, pcar = carry

        @pl.when(i + 1 < n_chunks)
        def _():
            read_dma(i + 1).start()

        read_dma(i).wait()
        window = scratch[jax.lax.rem(i, 2)]
        data = pltpu.roll(window, 2 * chunk - shift, 1)[:, :chunk]
        valid = (i * chunk + col) < count
        alpha, sigma, vis, araw, contrib, dx, dy, ca, cb, cc, op = _chunk_alpha(
            data, px, py, valid
        )
        one_m = 1.0 - alpha
        prod_incl = _prefix_prod_lanes(one_m, chunk)
        prod_excl = jnp.where(col == 0, 1.0, pltpu.roll(prod_incl, 1, 1))
        t_after = tcar * prod_incl
        mask = t_after > T_EARLY_STOP
        t_before = tcar * prod_excl
        w = jnp.where(mask, alpha * t_before, 0.0)

        extras = data[6:14, :]
        ew = jnp.concatenate(
            [extras[0:5], jnp.zeros((3, chunk), jnp.float32)], axis=0
        )
        gw = jax.lax.dot_general(
            gpix, ew, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC,
        )  # (P, K)
        gww = gw * w
        prefix_incl = pcar + _prefix_sum_lanes(gww, chunk)
        suffix = q_col - prefix_incl
        d_alpha = jnp.where(mask, gw * t_before - suffix / one_m, 0.0)

        gate = contrib & (araw <= ALPHA_CLAMP)
        d_sigma = jnp.where(gate, -d_alpha * araw, 0.0)

        # The six per-entry reductions are pixel-monomial moments of
        # d_sigma: ONE (6, P) @ (P, K) MXU matmul against the static
        # tile-local basis replaces six VPU reduction chains, then a small
        # per-entry binomial recombination shifts to gaussian-centered
        # moments. d_opacity needs no reduction of its own:
        # d_alpha*vis = -d_sigma/op pixelwise, so dop = -M0/op.
        mom = jax.lax.dot_general(
            basis, d_sigma, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC,
        )  # (6, K): [S, Sx, Sy, Sxx, Sxy, Syy] in tile-local pixel coords
        m0, m_x, m_y = mom[0:1], mom[1:2], mom[2:3]
        m_xx, m_xy, m_yy = mom[3:4], mom[4:5], mom[5:6]
        mxl = data[0:1, :] - ox   # gaussian mean in tile-local coords
        myl = data[1:2, :] - oy
        sdx = m_x - mxl * m0      # sum(dx * d_sigma)
        sdy = m_y - myl * m0
        dmx = -(ca * sdx + cb * sdy)
        dmy = -(cc * sdy + cb * sdx)
        dca = 0.5 * (m_xx - 2.0 * mxl * m_x + mxl * mxl * m0)
        dcb = m_xy - mxl * m_y - myl * m_x + mxl * myl * m0
        dcc = 0.5 * (m_yy - 2.0 * myl * m_y + myl * myl * m0)
        dop = jnp.where(op > 1e-12, -m0 / jnp.maximum(op, 1e-12), 0.0)
        d_extras = jax.lax.dot_general(
            gpix, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC,
        )  # (8, K): dr, dg, db, ddepth, d_one(drop), ...

        gid = jnp.where(valid, data[11:12, :], float(n_gaussians))

        # Key-first layout (row 0 = gid, rows 1..10 = gradients): the
        # sort-based reduce AND the bucket-partition reduce both key on
        # row 0 (tiling.reduce_padded_grads).
        gblock = jnp.concatenate([
            gid,
            dmx, dmy, dca, dcb, dcc, dop,
            d_extras[0:4, :],                          # dr, dg, db, ddepth
            jnp.zeros((5, chunk), jnp.float32),
        ], axis=0)                                     # (16, chunk)
        append(gblock, jnp.minimum(count - i * chunk, chunk))

        tcar = tcar * jnp.min(jnp.where(mask, prod_incl, 1.0), axis=1, keepdims=True)
        pcar = pcar + jnp.sum(gww, axis=1, keepdims=True)
        return i + 1, tcar, pcar

    init = (jnp.int32(0), jnp.ones((P, 1), jnp.float32),
            jnp.zeros((P, 1), jnp.float32))
    ie, _, _ = jax.lax.while_loop(cond, body, init)

    # Drain the read prefetch issued for the chunk after an early exit.
    # (Early-terminated chunks are NOT appended: their gradients are zero.)
    @pl.when(ie < n_chunks)
    def _():
        read_dma(ie).wait()

    # Last tile: sentinel-fill the staging tail, flush it, retire all DMAs,
    # and publish [n_written, n_dropped].
    @pl.when(t == n_tiles - 1)
    def _():
        c = smem[0]
        sent = jnp.concatenate([
            jnp.full((1, chunk), float(n_gaussians), jnp.float32),
            jnp.zeros((15, chunk), jnp.float32),
        ], axis=0)

        @pl.when(c > 0)
        def _():
            append(sent, chunk - c)   # pads to the boundary and flushes

        nflush = smem[1]

        @pl.when(nflush >= 2)
        def _():
            flush_dma(jax.lax.rem(nflush, 2), jnp.int32(0)).wait()

        @pl.when(nflush >= 1)
        def _():
            flush_dma(jax.lax.rem(nflush + 1, 2), jnp.int32(0)).wait()
        meta_ref[0, 0] = nflush * chunk
        meta_ref[0, 1] = smem[2] * chunk


def _fwd_kernel_q(wtile_ref, cum_ref, starts_ref, counts_ref, nwork_ref,
                  soa_ref, out_ref, scratch, sem, tcar_ref, smem,
                  *, ts, ntx, chunk, w_cap, sat_skip=True, direct_dma=False):
    """Flat-queue forward: ONE chunk per grid step (see tiling.chunk_queue).

    Replaces the round-3 per-tile ``while_loop`` sweep — measured 2.1 us
    vs 1.2 us per chunk (scratch/probe_kernel_r4.py [2]): the loop's
    data-dependent cond (vector reduce -> scalar -> branch every chunk)
    stalls the VPU pipeline, while Mosaic overlaps *grid steps* deeply.
    The output block revolves: consecutive steps of the same tile
    accumulate into the resident VMEM block; early termination becomes a
    per-tile saturation flag in SMEM that skips the chunk MATH (the DMA
    stream continues — bit-exact output either way because the per-pixel
    ``mask`` already zeroes saturated contributions; the flag only skips
    work the mask would zero)."""
    P = ts * ts
    w = pl.program_id(0)
    t = wtile_ref[w]
    start = starts_ref[t]
    count = counts_ref[t]
    ci = w - cum_ref[t]
    nop = w >= nwork_ref[0]
    shift = jax.lax.rem(start, chunk)
    base = start - shift
    col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    # ``direct_dma``: DMA the segment chunk at its exact (unaligned) offset
    # into a (16, chunk) window — no aligned 2x window, no dynamic roll.
    # DMA engines handle arbitrary offsets; the aligned-window+roll of the
    # round-2/3 kernels predates the queue layout. A/B knob, measured on
    # hardware before switching the default.
    def dma_for(wi):
        ti = wtile_ref[wi]
        si = starts_ref[ti]
        cii = wi - cum_ref[ti]
        if direct_dma:
            off = si + cii * chunk
            return pltpu.make_async_copy(
                soa_ref.at[:, pl.ds(off, chunk)],
                scratch.at[jax.lax.rem(wi, 2)],
                sem.at[jax.lax.rem(wi, 2)],
            )
        ba = si - jax.lax.rem(si, chunk)
        off = pl.multiple_of(ba + cii * chunk, chunk)
        return pltpu.make_async_copy(
            soa_ref.at[:, pl.ds(off, 2 * chunk)],
            scratch.at[jax.lax.rem(wi, 2)],
            sem.at[jax.lax.rem(wi, 2)],
        )

    @pl.when((w == 0) & jnp.logical_not(nop))
    def _():
        dma_for(w).start()

    @pl.when((w + 1 < w_cap) & (w + 1 < nwork_ref[0]))
    def _():
        dma_for(w + 1).start()

    @pl.when(jnp.logical_not(nop))
    def _():
        dma_for(w).wait()
        # Saturation skip reads a flag LAGGED BY TWO STEPS (ping-pong SMEM
        # slots): reading the flag written at step w-1 would chain a vector
        # reduce -> scalar -> predicate between *consecutive* grid steps —
        # the exact while-loop-cond stall the queue design removes. The
        # two-step lag is exact: skipping is only ever applied after the
        # tile is saturated (the per-pixel ``mask`` already zeroes those
        # contributions); chunks ci<2 never skip.
        sat = ((ci > 1) & (smem[jax.lax.rem(w, 2)] == 1)) if sat_skip else False

        @pl.when(jnp.logical_not(sat))
        def _():
            window = scratch[jax.lax.rem(w, 2)]
            if direct_dma:
                data = window
            else:
                data = pltpu.roll(window, 2 * chunk - shift, 1)[:, :chunk]
            valid = (ci * chunk + col) < count
            px, py = _pixel_coords(t, ts, ntx)
            tcar = jnp.where(ci == 0, jnp.ones((P, 1), jnp.float32),
                             tcar_ref[...])
            alpha, *_ = _chunk_alpha(data, px, py, valid)
            one_m = 1.0 - alpha
            prod_incl = _prefix_prod_lanes(one_m, chunk)
            prod_excl = jnp.where(col == 0, 1.0, pltpu.roll(prod_incl, 1, 1))
            t_after = tcar * prod_incl
            mask = t_after > T_EARLY_STOP
            w_blend = jnp.where(mask, alpha * tcar * prod_excl, 0.0)
            extras = data[6:14, :]
            ew = jnp.concatenate(
                [extras[0:5], jnp.zeros((3, chunk), jnp.float32)], axis=0)
            contrib = jax.lax.dot_general(
                ew, w_blend, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_PREC,
            )  # (8, P)

            @pl.when(ci == 0)
            def _():
                out_ref[0] = contrib

            @pl.when(ci > 0)
            def _():
                out_ref[0] = out_ref[0] + contrib

            tcar_new = tcar * jnp.min(
                jnp.where(mask, prod_incl, 1.0), axis=1, keepdims=True)
            tcar_ref[...] = tcar_new
            if sat_skip:
                smem[jax.lax.rem(w, 2)] = jnp.where(
                    jnp.max(tcar_new) > T_EARLY_STOP, 0, 1).astype(jnp.int32)

        if sat_skip:
            # A skipped chunk leaves the tile saturated: keep the flag hot in
            # BOTH slots so every later chunk of this tile also skips.
            @pl.when(sat)
            def _():
                smem[jax.lax.rem(w, 2)] = 1


def _bwd_kernel_q(wtile_ref, cum_ref, starts_ref, counts_ref, nwork_ref,
                  soa_ref, aux_ref, grad_ref, meta_ref,
                  scratch, staging, bounce, sem, wsem, smem,
                  tcar_ref, pcar_ref, qcol_ref,
                  *, ts, ntx, chunk, n_gaussians, w_cap, grad_cap,
                  sat_skip=True, direct_dma=False):
    """Flat-queue backward (see _fwd_kernel_q): one chunk per grid step,
    per-tile carries (transmittance, gww prefix, Q_total) in VMEM scratch
    reset at ci == 0, aux (cotangent + saved forward) block revolving with
    the tile. The compact gradient appends are unchanged from the loop
    kernel: a staging ring shared across ALL steps with double-buffered
    bounce flushes; saturated-tile chunks skip math AND append (their
    gradients are identically zero — at most two extra zero-gradient chunks
    per tile are appended relative to the round-3 while-loop exit, because
    the saturation flag is observed two chunks later than the loop cond)."""
    P = ts * ts
    w = pl.program_id(0)
    t = wtile_ref[w]
    start = starts_ref[t]
    count = counts_ref[t]
    ci = w - cum_ref[t]
    nop = w >= nwork_ref[0]
    shift = jax.lax.rem(start, chunk)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (16, 2 * chunk), 1)
    basis = _moment_basis(ts)
    ones8 = jnp.ones((8, 1), jnp.float32)

    @pl.when(w == 0)
    def _():
        smem[0] = 0
        smem[1] = 0
        smem[2] = 0
        meta_ref[0, 0] = 0
        meta_ref[0, 1] = 0

    def dma_for(wi):
        ti = wtile_ref[wi]
        si = starts_ref[ti]
        cii = wi - cum_ref[ti]
        if direct_dma:
            off = si + cii * chunk
            return pltpu.make_async_copy(
                soa_ref.at[:, pl.ds(off, chunk)],
                scratch.at[jax.lax.rem(wi, 2)],
                sem.at[jax.lax.rem(wi, 2)],
            )
        ba = si - jax.lax.rem(si, chunk)
        off = pl.multiple_of(ba + cii * chunk, chunk)
        return pltpu.make_async_copy(
            soa_ref.at[:, pl.ds(off, 2 * chunk)],
            scratch.at[jax.lax.rem(wi, 2)],
            sem.at[jax.lax.rem(wi, 2)],
        )

    def flush_dma(slot, hbm_chunk):
        return pltpu.make_async_copy(
            bounce.at[slot],
            grad_ref.at[:, pl.ds(pl.multiple_of(hbm_chunk * chunk, chunk),
                                 chunk)],
            wsem.at[slot],
        )

    def append(gblock, valid):
        c = smem[0]
        rolled = pltpu.roll(jnp.concatenate([gblock, gblock], axis=1), c, 1)
        staging[:, :] = jnp.where((col2 >= c) & (col2 < c + chunk),
                                  rolled, staging[:, :])
        c = c + valid
        smem[0] = c

        @pl.when(c >= chunk)
        def _():
            ok = smem[1] * chunk + chunk <= grad_cap

            @pl.when(ok)
            def _():
                nflush = smem[1]
                slot = jax.lax.rem(nflush, 2)

                @pl.when(nflush >= 2)
                def _():
                    flush_dma(slot, jnp.int32(0)).wait()
                bounce[slot] = staging[:, :chunk]
                flush_dma(slot, nflush).start()
                smem[1] = nflush + 1

            @pl.when(jnp.logical_not(ok))
            def _():
                smem[2] = smem[2] + 1
            staging[:, :chunk] = staging[:, chunk:]
            smem[0] = c - chunk

    @pl.when((w == 0) & jnp.logical_not(nop))
    def _():
        dma_for(w).start()

    @pl.when((w + 1 < w_cap) & (w + 1 < nwork_ref[0]))
    def _():
        dma_for(w + 1).start()

    @pl.when(jnp.logical_not(nop))
    def _():
        dma_for(w).wait()
        # Two-step-lagged saturation skip (see _fwd_kernel_q): slots 3/4
        # ping-pong so no scalar chain spans consecutive grid steps. A
        # saturated tile's chunks past the lag skip math AND append.
        sat = ((ci > 1) & (smem[3 + jax.lax.rem(w, 2)] == 1)) if sat_skip \
            else False

        @pl.when(jnp.logical_not(sat))
        def _():
            window = scratch[jax.lax.rem(w, 2)]
            if direct_dma:
                data = window
            else:
                data = pltpu.roll(window, 2 * chunk - shift, 1)[:, :chunk]
            valid = (ci * chunk + col) < count
            px, py = _pixel_coords(t, ts, ntx)
            ox = ((t % ntx) * ts).astype(jnp.float32)
            oy = ((t // ntx) * ts).astype(jnp.float32)
            gpix = aux_ref[0, 0:8, :]
            tcar = jnp.where(ci == 0, jnp.ones((P, 1), jnp.float32),
                             tcar_ref[...])
            pcar = jnp.where(ci == 0, jnp.zeros((P, 1), jnp.float32),
                             pcar_ref[...])

            @pl.when(ci == 0)
            def _():
                fout = aux_ref[0, 8:16, :]
                qcol_ref[...] = jax.lax.dot_general(
                    gpix * fout, ones8, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_PREC,
                )
            q_col = qcol_ref[...]

            alpha, sigma, vis, araw, contrib_m, dx, dy, ca, cb, cc, op = (
                _chunk_alpha(data, px, py, valid))
            one_m = 1.0 - alpha
            prod_incl = _prefix_prod_lanes(one_m, chunk)
            prod_excl = jnp.where(col == 0, 1.0, pltpu.roll(prod_incl, 1, 1))
            t_after = tcar * prod_incl
            mask = t_after > T_EARLY_STOP
            t_before = tcar * prod_excl
            w_blend = jnp.where(mask, alpha * t_before, 0.0)

            extras = data[6:14, :]
            ew = jnp.concatenate(
                [extras[0:5], jnp.zeros((3, chunk), jnp.float32)], axis=0)
            gw = jax.lax.dot_general(
                gpix, ew, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_PREC,
            )
            gww = gw * w_blend
            prefix_incl = pcar + _prefix_sum_lanes(gww, chunk)
            suffix = q_col - prefix_incl
            d_alpha = jnp.where(mask, gw * t_before - suffix / one_m, 0.0)
            gate = contrib_m & (araw <= ALPHA_CLAMP)
            d_sigma = jnp.where(gate, -d_alpha * araw, 0.0)

            mom = jax.lax.dot_general(
                basis, d_sigma, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_PREC,
            )
            m0, m_x, m_y = mom[0:1], mom[1:2], mom[2:3]
            m_xx, m_xy, m_yy = mom[3:4], mom[4:5], mom[5:6]
            mxl = data[0:1, :] - ox
            myl = data[1:2, :] - oy
            sdx = m_x - mxl * m0
            sdy = m_y - myl * m0
            dmx = -(ca * sdx + cb * sdy)
            dmy = -(cc * sdy + cb * sdx)
            dca = 0.5 * (m_xx - 2.0 * mxl * m_x + mxl * mxl * m0)
            dcb = m_xy - mxl * m_y - myl * m_x + mxl * myl * m0
            dcc = 0.5 * (m_yy - 2.0 * myl * m_y + myl * myl * m0)
            dop = jnp.where(op > 1e-12, -m0 / jnp.maximum(op, 1e-12), 0.0)
            d_extras = jax.lax.dot_general(
                gpix, w_blend, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_PREC,
            )
            gid = jnp.where(valid, data[11:12, :], float(n_gaussians))
            gblock = jnp.concatenate([
                gid,
                dmx, dmy, dca, dcb, dcc, dop,
                d_extras[0:4, :],
                jnp.zeros((5, chunk), jnp.float32),
            ], axis=0)
            append(gblock, jnp.minimum(count - ci * chunk, chunk))

            tcar_new = tcar * jnp.min(
                jnp.where(mask, prod_incl, 1.0), axis=1, keepdims=True)
            tcar_ref[...] = tcar_new
            pcar_ref[...] = pcar + jnp.sum(gww, axis=1, keepdims=True)
            if sat_skip:
                smem[3 + jax.lax.rem(w, 2)] = jnp.where(
                    jnp.max(tcar_new) > T_EARLY_STOP, 0, 1).astype(jnp.int32)

        if sat_skip:
            @pl.when(sat)
            def _():
                smem[3 + jax.lax.rem(w, 2)] = 1

    # Last grid step: sentinel-fill the staging tail, flush, retire DMAs,
    # publish [n_written, n_dropped]. Runs regardless of nop.
    @pl.when(w == w_cap - 1)
    def _():
        c = smem[0]
        sent = jnp.concatenate([
            jnp.full((1, chunk), float(n_gaussians), jnp.float32),
            jnp.zeros((15, chunk), jnp.float32),
        ], axis=0)

        @pl.when(c > 0)
        def _():
            append(sent, chunk - c)

        nflush = smem[1]

        @pl.when(nflush >= 2)
        def _():
            flush_dma(jax.lax.rem(nflush, 2), jnp.int32(0)).wait()

        @pl.when(nflush >= 1)
        def _():
            flush_dma(jax.lax.rem(nflush + 1, 2), jnp.int32(0)).wait()
        meta_ref[0, 0] = nflush * chunk
        meta_ref[0, 1] = smem[2] * chunk


@functools.lru_cache(maxsize=None)
def _make_core(ts, ntx, nty, chunk, N, max_t, width, height, interpret,
               grad_cap_mult=8, class_budgets=None, depth_bits=0,
               grad_frac=1.0, depth_grad=True, sort_buckets=0,
               bucket_headroom=1.5, reduce_slices=0, queue=True,
               direct_dma=False, sort_bands=0):
    P = ts * ts
    T = ntx * nty
    win = chunk if direct_dma else 2 * chunk
    # Band-split binning re-enumerates per band with shared class budgets:
    # the concatenated SoA is sort_bands x the single-band slot count.
    n_slots = total_slots(N, max_t, class_budgets) * max(int(sort_bands), 1)
    # Flat-queue work capacity: total chunks <= n_isect/chunk + one partial
    # chunk per tile; n_isect <= n_slots. Pad steps past the dynamic work
    # count are in-kernel no-ops.
    w_cap = n_slots // chunk + T
    # Gradient-buffer capacity: the backward kernel appends COMPACTLY (no
    # per-tile chunk padding, early-terminated chunks dropped), so real
    # entries never exceed n_isect <= n_slots; +1 chunk for the final
    # sentinel pad. The dense layout bounds with the grad_cap_mult knob
    # (n_slots = N*max_t assumes every slot real); overflow is dropped AND
    # counted (stats/n_grad_dropped).
    #
    # grad_frac < 1 shrinks the buffer below the exact bound: sentinel slots
    # never reach it and early-terminated chunks are dropped before it, so
    # the measured occupancy (``rasterize_grad_meta``) is typically well
    # under n_slots — and the gid payload sort over this buffer is the
    # single most expensive backward stage, scaling ~linearly with its
    # static length. Overflow is dropped AND counted, never silent.
    if class_budgets is None:
        bound = min(n_slots, grad_cap_mult * N)
    else:
        bound = n_slots
    bound = max(chunk, int(bound * float(grad_frac)))
    grad_cap = cdiv(bound, chunk) * chunk + chunk

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, ts=ts, ntx=ntx, chunk=chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 8, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 16, 2 * chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, ts=ts, ntx=ntx, chunk=chunk, n_gaussians=N,
                          n_tiles=T, grad_cap=grad_cap),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 16, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 2), lambda t, *_: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 16, 2 * chunk), jnp.float32),
                pltpu.VMEM((16, 2 * chunk), jnp.float32),
                pltpu.VMEM((2, 16, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((3,), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((16, grad_cap), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    fwd_call_q = pl.pallas_call(
        functools.partial(_fwd_kernel_q, ts=ts, ntx=ntx, chunk=chunk,
                          w_cap=w_cap, direct_dma=direct_dma),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(w_cap,),
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
        interpret=interpret,
    )

    bwd_call_q = pl.pallas_call(
        functools.partial(_bwd_kernel_q, ts=ts, ntx=ntx, chunk=chunk,
                          n_gaussians=N, w_cap=w_cap, grad_cap=grad_cap,
                          direct_dma=direct_dma),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(w_cap,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 16, P), lambda w, wt, *_: (wt[w], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 2), lambda w, *_: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 16, win), jnp.float32),
                pltpu.VMEM((16, 2 * chunk), jnp.float32),
                pltpu.VMEM((2, 16, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((5,), jnp.int32),
                pltpu.VMEM((P, 1), jnp.float32),
                pltpu.VMEM((P, 1), jnp.float32),
                pltpu.VMEM((P, 1), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((16, grad_cap), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    def _queue(b):
        from gaussian_splatting_tpu.ops.tiling import chunk_queue

        wtile, cum, n_work = chunk_queue(b.counts, chunk, w_cap)
        return wtile, cum, n_work.reshape(1)

    def _run_fwd(b):
        if queue:
            wtile, cum, nwork = _queue(b)
            out = fwd_call_q(wtile, cum, b.tile_starts, b.counts, nwork,
                             b.sorted_soa)
            # Empty tiles never enter the queue; zero their blocks.
            return jnp.where((b.counts > 0)[:, None, None], out, 0.0)
        return fwd_call(b.tile_starts, b.counts, b.sorted_soa)

    def _run_bwd(b_soa, tile_starts, counts, aux):
        if queue:
            from gaussian_splatting_tpu.ops.tiling import chunk_queue

            wtile, cum, n_work = chunk_queue(counts, chunk, w_cap)
            return bwd_call_q(wtile, cum, tile_starts, counts,
                              n_work.reshape(1), b_soa, aux)
        return bwd_call(tile_starts, counts, b_soa, aux)

    def _grad_drop_bound(n_isect):
        """Upper bound on entries the backward pass can drop at grad_cap —
        computable in forward (real drops depend on early termination and
        are reported exactly by the kernel's meta output; this conservative
        bound is what the forward-only stats path can report). Always 0 in
        compact mode (grad_cap >= n_slots + chunk >= any n_written)."""
        return jnp.maximum(n_isect + jnp.int32(chunk) - jnp.int32(grad_cap), 0)

    def _binned(means2d, conics, colors, opacities, depths, radii):
        return isect_and_sort(
            means2d, conics, colors, opacities, depths, radii,
            width, height, ts, chunk, max_t, class_budgets=class_budgets,
            depth_bits=depth_bits, sort_buckets=sort_buckets,
            bucket_headroom=bucket_headroom, sort_bands=sort_bands,
            interpret=interpret,
        )

    @jax.custom_vjp
    def core(means2d, conics, colors, opacities, depths, radii):
        b = _binned(means2d, conics, colors, opacities, depths, radii)
        out = _run_fwd(b)
        return (out, b.n_isect, b.n_dropped,
                b.n_budget_dropped + b.n_bucket_dropped,
                _grad_drop_bound(b.n_isect))

    def fwd(means2d, conics, colors, opacities, depths, radii):
        b = _binned(means2d, conics, colors, opacities, depths, radii)
        out = _run_fwd(b)
        res = (b.sorted_soa, b.tile_starts, b.counts, out)
        return (out, b.n_isect, b.n_dropped,
                b.n_budget_dropped + b.n_bucket_dropped,
                _grad_drop_bound(b.n_isect)), res

    def bwd(res, cts):
        g = cts[0]  # (T, 8, P); stats cotangents ignored
        soa, tile_starts, counts, out = res
        aux = jnp.concatenate([g, out], axis=1)  # (T, 16, P)
        grad_padded, meta = _run_bwd(soa, tile_starts, counts, aux)
        gr = reduce_padded_grads(grad_padded, N, meta[0, 0],
                                 interpret=interpret, with_depth=depth_grad,
                                 sort_slices=reduce_slices)
        d_means2d = jnp.stack([gr["dmx"], gr["dmy"]], axis=-1)
        d_conics = jnp.stack([gr["dca"], gr["dcb"], gr["dcc"]], axis=-1)
        d_colors = jnp.stack([gr["dr"], gr["dg"], gr["db"]], axis=-1)
        return d_means2d, d_conics, d_colors, gr["dop"], gr["ddepth"], None

    def probe_meta(means2d, conics, colors, opacities, depths, radii):
        """Exact gradient-buffer occupancy: run binning + forward + one
        backward sweep (unit cotangents — occupancy depends only on segment
        counts and early termination, not on the cotangent values) and
        return the kernel's (n_written, n_dropped) meta. (The sliced
        reduce is drop-free — slices are static positional segments — so
        kernel-level drops are the only reduce-side loss to police.)"""
        b = _binned(means2d, conics, colors, opacities, depths, radii)
        out = _run_fwd(b)
        aux = jnp.concatenate([jnp.ones_like(out), out], axis=1)
        grad_padded, meta = _run_bwd(b.sorted_soa, b.tile_starts, b.counts,
                                     aux)
        return meta[0, 0], meta[0, 1], jnp.int32(grad_cap)

    core.defvjp(fwd, bwd)
    core.probe_meta = probe_meta
    return core


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
    chunk=256,
    max_tiles_per_gaussian=16,
    class_budgets=None,
    depth_bits=0,
    grad_buffer_frac=1.0,
    sort_buckets=0,
    bucket_headroom=1.5,
    reduce_slices=0,
    sort_bands=0,
    interpret=None,
    with_stats=False,
    depth_grad=True,
    queue=False,
    direct_dma=False,
):
    """Full tiled rasterization: payload-sort binning (XLA) + Pallas fwd/bwd.

    Returns (image (H, W, 3), alpha (H, W), depth (H, W)) — plus a stats dict
    (n_isect, n_dropped, n_budget_dropped, n_grad_dropped) when
    ``with_stats`` — differentiable w.r.t. the gaussian inputs with analytic
    kernel gradients. ``class_budgets`` selects the compact footprint-class
    binning (see ``tiling.isect_and_sort``).

    ``depth_grad=False`` declares that the caller never differentiates the
    depth output (a photometric-only loss): d_depths comes back zero and the
    backward reduce drops one sort payload (~4 ms at the 1M bench).

    ``sort_buckets = B > 0`` (power of two) routes the BINNING sort
    through the Pallas bucket partition + per-bucket sorts
    (tiling.isect_and_sort); bucket overflow is counted (folds into the
    n_budget_dropped stat). ``reduce_slices = K > 1`` routes the
    GRADIENT-REDUCE sort through K sliced sorts + segsums (drop-free; see
    reduce_padded_grads). The flat 4M+-entry XLA sorts these replace were
    52% of the round-2 step.

    ``queue=True`` runs the kernels on the flat chunk queue (one chunk per
    grid step, ``tiling.chunk_queue``) instead of the per-tile while_loop
    sweep — bit-identical output. Isolated per-chunk probes pipeline at
    ~1.2 us/chunk vs the loop's ~2.1, but the round-5 full fwd+bwd A/B
    measured the LOOP kernels faster in situ (211.0 ms vs 219.7 at the
    1M/1080p bench — the queue's searchsorted/zero-fill overheads and
    padded grid outweigh the loop-cond stall; this was the round-4
    9.84 -> 9.45 Mpix/s headline regression), so the loop kernels are the
    default again and ``queue=True`` is the A/B knob.
    """
    N = means2d.shape[0]
    ts = tile_size
    assert ts * ts in (64, 256, 1024), "tile_size must be 8, 16, or 32"
    ntx = cdiv(width, ts)
    nty = cdiv(height, ts)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if class_budgets is not None:
        class_budgets = tuple(int(b) for b in class_budgets)

    core = _make_core(ts, ntx, nty, chunk, N, max_tiles_per_gaussian,
                      width, height, bool(interpret),
                      class_budgets=class_budgets, depth_bits=int(depth_bits),
                      grad_frac=float(grad_buffer_frac),
                      depth_grad=bool(depth_grad),
                      sort_buckets=int(sort_buckets),
                      bucket_headroom=float(bucket_headroom),
                      reduce_slices=int(reduce_slices), queue=bool(queue),
                      direct_dma=bool(direct_dma), sort_bands=int(sort_bands))
    out, n_isect, n_dropped, n_budget_dropped, n_grad_dropped = core(
        means2d, conics, colors, opacities, depths, radii)

    img = out.reshape(nty, ntx, 8, ts, ts).transpose(0, 3, 1, 4, 2)
    img = img.reshape(nty * ts, ntx * ts, 8)[:height, :width]
    rgb = img[..., 0:3]
    depth_img = img[..., 3]
    alpha_img = img[..., 4]
    if bg is not None:
        rgb = rgb + (1.0 - alpha_img)[..., None] * bg[None, None, :]
    if with_stats:
        return rgb, alpha_img, depth_img, {
            "n_isect": n_isect,
            "n_dropped": n_dropped,
            "n_budget_dropped": n_budget_dropped,
            "n_grad_dropped": n_grad_dropped,
        }
    return rgb, alpha_img, depth_img


def rasterize_grad_meta(
    means2d, conics, colors, opacities, depths, radii, width, height,
    tile_size=16, chunk=256, max_tiles_per_gaussian=16, class_budgets=None,
    depth_bits=0, grad_buffer_frac=1.0, sort_buckets=0, bucket_headroom=1.5,
    sort_bands=0, interpret=None, queue=False,
):
    """Exact gradient-buffer occupancy for one render: returns the int
    triple (n_written, n_dropped, grad_cap) from a real backward sweep.
    Used to size ``grad_buffer_frac`` (bench) and by the trainer's
    hysteresis (raise the frac when a probe shows drops or near-full
    occupancy) — the forward-path ``stats/n_grad_dropped`` is only a
    conservative bound when the frac is below 1."""
    ts = tile_size
    ntx = cdiv(width, ts)
    nty = cdiv(height, ts)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if class_budgets is not None:
        class_budgets = tuple(int(b) for b in class_budgets)
    core = _make_core(ts, ntx, nty, chunk, means2d.shape[0],
                      max_tiles_per_gaussian, width, height, bool(interpret),
                      class_budgets=class_budgets, depth_bits=int(depth_bits),
                      grad_frac=float(grad_buffer_frac),
                      sort_buckets=int(sort_buckets),
                      bucket_headroom=float(bucket_headroom),
                      queue=bool(queue), sort_bands=int(sort_bands))
    return core.probe_meta(means2d, conics, colors, opacities, depths, radii)
