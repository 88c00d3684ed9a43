"""Tile binning for the Pallas rasterizer — the XLA-side preprocessing.

Replaces the reference's CUDA tile binning (inside the external gsplat
kernel, reference ``gsplat_backend.py:83-97``) with a design measured and
shaped around what XLA:TPU actually does fast and slow (v5e, cache-busted):

  fast:  lax.sort keys (~150M entries/s) with payload operands ~FREE
         (13-operand sort == 3-operand sort), dense elementwise, cumsum
  slow:  large scatters (~40M elem/s), large-table gathers (~100M elem/s)

So the pipeline carries *all per-gaussian quantities through the sort as
payloads* and never gathers or scatters anything big:

1. Dense slot enumeration: every gaussian owns MAX_T static slots; slot s
   holds the s-th covered tile of its clipped radius bbox, or a sentinel
   (sentinel entries sink to the end of the sort; no compaction needed).
2. ONE ``lax.sort`` keyed by (tile_id, depth) carrying 10 quantity payloads
   plus the gaussian id -> the kernel-ready (16, M) SoA in per-tile
   front-to-back order, built by stacking the sort outputs (contiguous).
3. ``searchsorted`` -> per-tile segment starts/counts. Segments are NOT
   re-packed: the Pallas kernels read unaligned segments through an aligned
   VMEM window + dynamic roll, and write *gradients* to a separate
   chunk-aligned padded buffer (so backward writes never straddle tiles).
4. Gradient reduction to per-gaussian values (the CUDA backward's atomics,
   XLA's slow scatter-add) = one more payload sort keyed by the gaussian id
   the kernel echoes into its gradient output, then a segmented cumsum
   difference. Sort + cumsum + (N,)-sized boundary gathers only.

SoA row layout (16, M):
   0 mean_x | 1 mean_y | 2 conic_a | 3 conic_b | 4 conic_c | 5 opacity |
   6 r | 7 g | 8 b | 9 depth | 10 const-one | 11 gauss_id (exact f32) |
   12..15 zero
The const-one row makes ``sum(w) = 1 - T_final`` fall out of the kernel's
blend matmul; the gauss-id row rides along so the backward kernel can tag
every gradient entry for the sort-based reduction (ids < 2^24 are exact in
f32).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


def cdiv(a, b):
    return -(-a // b)


class TileBinning(NamedTuple):
    sorted_soa: jnp.ndarray      # (16, M + 2*chunk) kernel-ready SoA
    tile_starts: jnp.ndarray     # (T + 1,) int32 segment starts (unaligned)
    counts: jnp.ndarray          # (T,) int32 real intersections per tile
    padded_starts: jnp.ndarray   # (T,) int32 chunk-aligned grad-buffer starts
    n_isect: jnp.ndarray         # () int32 total real intersections
    n_dropped: jnp.ndarray       # () int32 entries lost to the MAX_T cap


def padded_capacity_for(n: int, max_t: int, num_tiles: int, chunk: int) -> int:
    """Static capacity of the aligned gradient buffer."""
    return cdiv(n * max_t + num_tiles * (chunk - 1), chunk) * chunk


def isect_and_sort(
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    width: int,
    height: int,
    tile_size: int,
    chunk: int,
    max_tiles_per_gaussian: int = 16,
) -> TileBinning:
    """Bin + depth-sort N screen-space gaussians, carrying their render
    quantities through the sort. Returns the kernel-ready SoA and segment
    tables. Not differentiable by itself — wrapped in the rasterizer's
    custom_vjp (gradients come back through the sort-based reduction)."""
    N = means2d.shape[0]
    ts = tile_size
    ntx = cdiv(width, ts)
    nty = cdiv(height, ts)
    T = ntx * nty
    max_t = max_tiles_per_gaussian
    M = N * max_t

    valid = radii > 0
    r = radii.astype(jnp.float32)
    mx, my = means2d[:, 0], means2d[:, 1]
    tx0 = jnp.clip(jnp.floor((mx - r) / ts), 0, ntx).astype(jnp.int32)
    tx1 = jnp.clip(jnp.ceil((mx + r) / ts), 0, ntx).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((my - r) / ts), 0, nty).astype(jnp.int32)
    ty1 = jnp.clip(jnp.ceil((my + r) / ts), 0, nty).astype(jnp.int32)
    nx = jnp.where(valid, jnp.maximum(tx1 - tx0, 0), 0)
    ny = jnp.where(valid, jnp.maximum(ty1 - ty0, 0), 0)
    n_tiles = nx * ny
    n_capped = jnp.minimum(n_tiles, max_t)
    n_isect = jnp.sum(n_capped)
    n_dropped = jnp.sum(n_tiles - n_capped)

    # Dense slot enumeration (N, MAX_T); sentinel tile T for unused slots.
    s = jnp.arange(max_t, dtype=jnp.int32)[None, :]
    nx_safe = jnp.maximum(nx, 1)[:, None]
    dy = s // nx_safe
    dx = s - dy * nx_safe
    tid = (ty0[:, None] + dy) * ntx + (tx0[:, None] + dx)
    slot_ok = s < n_capped[:, None]
    tile_key = jnp.where(slot_ok, tid, T).reshape(-1)

    def expand(q):
        return jnp.broadcast_to(q[:, None], (N, max_t)).reshape(-1)

    gauss_f32 = jnp.arange(N, dtype=jnp.float32)
    operands = (
        tile_key,
        expand(depths),
        expand(means2d[:, 0]), expand(means2d[:, 1]),
        expand(conics[:, 0]), expand(conics[:, 1]), expand(conics[:, 2]),
        expand(opacities),
        expand(colors[:, 0]), expand(colors[:, 1]), expand(colors[:, 2]),
        expand(gauss_f32),
    )
    sorted_ops = jax.lax.sort(operands, num_keys=2)
    sorted_tile = sorted_ops[0]
    s_depth = sorted_ops[1]
    (s_mx, s_my, s_ca, s_cb, s_cc, s_op, s_r, s_g, s_b, s_gid) = sorted_ops[2:]

    tile_starts = jnp.searchsorted(
        sorted_tile, jnp.arange(T + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    counts = tile_starts[1:] - tile_starts[:-1]
    chunks_per_tile = cdiv(counts, chunk)
    padded_starts = (
        chunk * (jnp.cumsum(chunks_per_tile) - chunks_per_tile)
    ).astype(jnp.int32)

    # Stack into the kernel SoA, padded by 2*chunk so aligned window reads
    # never run off the end. Sentinel-slot entries sit past every tile's
    # segment and are additionally masked in-kernel by the counts.
    pad = 2 * chunk
    zeros = jnp.zeros((M,), jnp.float32)
    rows = [
        s_mx, s_my, s_ca, s_cb, s_cc, s_op, s_r, s_g, s_b, s_depth,
        jnp.ones((M,), jnp.float32), s_gid, zeros, zeros, zeros, zeros,
    ]
    soa = jnp.stack(rows, axis=0)
    soa = jnp.pad(soa, ((0, 0), (0, pad)))
    return TileBinning(
        sorted_soa=soa,
        tile_starts=tile_starts,
        counts=counts,
        padded_starts=padded_starts,
        n_isect=n_isect,
        n_dropped=n_dropped,
    )


def reduce_padded_grads(grad_soa: jnp.ndarray, n_gaussians: int,
                        n_written: jnp.ndarray):
    """Per-gaussian gradient reduction — sort-based, scatter-free.

    grad_soa: (16, pcap) backward-kernel output; row 11 carries the gaussian
    id of each entry (f32, exact), rows 0..9 the per-entry gradients
    [dmx, dmy, dA, dB, dC, dop, dr, dg, db, ddepth]. Entries past
    ``n_written`` and masked entries carry id >= N (sentinel) and/or zero
    grads. Returns a dict of (N,) arrays.

    Method: payload sort by id (payloads are ~free on TPU), then segmented
    sums as cumsum differences at segment boundaries found by searchsorted.
    """
    pcap = grad_soa.shape[1]
    pos_ok = jnp.arange(pcap) < n_written
    key = jnp.where(pos_ok, grad_soa[11], float(n_gaussians))
    payloads = tuple(jnp.where(pos_ok, grad_soa[i], 0.0) for i in range(10))
    sorted_ops = jax.lax.sort((key,) + payloads, num_keys=1)
    sorted_key = sorted_ops[0]
    seg = jnp.searchsorted(
        sorted_key, jnp.arange(n_gaussians + 1, dtype=jnp.float32)
    )
    stacked = jnp.stack(sorted_ops[1:], axis=0)              # (10, pcap)
    csum = jnp.cumsum(stacked, axis=1)
    csum = jnp.concatenate([jnp.zeros((10, 1), csum.dtype), csum], axis=1)
    bounds = jnp.take(csum, seg, axis=1)                      # (10, N+1)
    sums = bounds[:, 1:] - bounds[:, :-1]                     # (10, N)
    return {
        "dmx": sums[0], "dmy": sums[1],
        "dca": sums[2], "dcb": sums[3], "dcc": sums[4],
        "dop": sums[5],
        "dr": sums[6], "dg": sums[7], "db": sums[8],
        "ddepth": sums[9],
    }
