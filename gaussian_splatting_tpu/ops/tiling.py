"""Tile binning for the Pallas rasterizer — the XLA-side preprocessing.

Replaces the reference's CUDA tile binning (inside the external gsplat
kernel, reference ``gsplat_backend.py:83-97``) with a TPU-friendly design:

1. Every gaussian enumerates up to MAX_T covered 16x16 tiles (static shape;
   overflow counted, never silently resized).
2. One `lax.sort` over (tile_id, depth) gives per-tile front-to-back lists.
3. Lists are re-packed so every tile's segment starts at a CHUNK-aligned
   offset ("padded segments"). This is the load-bearing trick: the Pallas
   kernels then DMA only aligned, fixed-size (16, CHUNK) blocks, and backward
   writes never straddle two tiles' segments (no atomics, no races).
4. Per-intersection gaussian data is gathered once into a structure-of-arrays
   ``(16, padded_capacity)`` f32 matrix, so the kernel's inner loop reads
   contiguous VMEM rows. Row layout:

   0 mean_x | 1 mean_y | 2 conic_a | 3 conic_b | 4 conic_c | 5 opacity |
   6 r | 7 g | 8 b | 9 depth | 10 const-one | 11..15 zero

   The const-one row makes ``sum(w) = 1 - T_final`` fall out of the same
   matmul that accumulates color — the kernel never materializes
   transmittance outputs in a transposed layout.

Padding entries index a dummy gaussian (column N) with opacity 0 placed far
off-screen, so kernels need no validity masks at all.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


def cdiv(a, b):
    return -(-a // b)


class TileBinning(NamedTuple):
    padded_gauss: jnp.ndarray    # (padded_capacity,) int32 gaussian ids (N = dummy)
    padded_starts: jnp.ndarray   # (T,) int32 CHUNK-aligned segment starts
    counts: jnp.ndarray          # (T,) int32 real intersections per tile
    n_isect: jnp.ndarray         # () int32 total real intersections (pre-drop)
    n_dropped: jnp.ndarray       # () int32 entries lost to capacity/MAX_T limits


def padded_capacity_for(capacity: int, num_tiles: int, chunk: int) -> int:
    """Static capacity of the aligned-segment buffer: raw capacity plus the
    worst-case per-tile alignment waste, rounded up to a chunk multiple."""
    return cdiv(capacity + num_tiles * (chunk - 1), chunk) * chunk


def isect_tiles(
    means2d: jnp.ndarray,
    radii: jnp.ndarray,
    depths: jnp.ndarray,
    width: int,
    height: int,
    tile_size: int,
    capacity: int,
    chunk: int,
    max_tiles_per_gaussian: int = 32,
) -> TileBinning:
    """Bin N screen-space gaussians into per-tile depth-sorted aligned segments."""
    N = means2d.shape[0]
    ts = tile_size
    ntx = cdiv(width, ts)
    nty = cdiv(height, ts)
    T = ntx * nty
    max_t = max_tiles_per_gaussian
    pcap = padded_capacity_for(capacity, T, chunk)

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

    offsets = jnp.cumsum(n_capped) - n_capped  # exclusive
    total = offsets[-1] + n_capped[-1] if N > 0 else jnp.int32(0)

    # Enumerate slots (N, max_t) row-major within each gaussian's tile bbox.
    s = jnp.arange(max_t, dtype=jnp.int32)[None, :]
    nx_safe = jnp.maximum(nx, 1)[:, None]
    dy = s // nx_safe
    dx = s % nx_safe
    tid = (ty0[:, None] + dy) * ntx + (tx0[:, None] + dx)
    slot_valid = s < n_capped[:, None]
    pos = offsets[:, None] + s
    pos = jnp.where(slot_valid & (pos < capacity), pos, capacity)  # OOB -> drop

    sentinel_tile = jnp.int32(T)
    tile_arr = jnp.full((capacity,), sentinel_tile, jnp.int32)
    depth_arr = jnp.full((capacity,), jnp.inf, jnp.float32)
    gauss_arr = jnp.full((capacity,), N, jnp.int32)
    flat_pos = pos.reshape(-1)
    tile_arr = tile_arr.at[flat_pos].set(tid.reshape(-1).astype(jnp.int32), mode="drop", unique_indices=True)
    depth_arr = depth_arr.at[flat_pos].set(
        jnp.broadcast_to(depths[:, None], (N, max_t)).reshape(-1).astype(jnp.float32),
        mode="drop", unique_indices=True,
    )
    gauss_arr = gauss_arr.at[flat_pos].set(
        jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, max_t)).reshape(-1),
        mode="drop", unique_indices=True,
    )

    sorted_tile, _, sorted_gauss = jax.lax.sort(
        (tile_arr, depth_arr, gauss_arr), num_keys=2
    )
    tile_starts = jnp.searchsorted(sorted_tile, jnp.arange(T + 1, dtype=jnp.int32)).astype(jnp.int32)
    counts = tile_starts[1:] - tile_starts[:-1]  # (T,)
    n_stored = tile_starts[T]

    # Aligned-segment re-pack.
    chunks_per_tile = cdiv(counts, chunk)
    padded_starts = (chunk * (jnp.cumsum(chunks_per_tile) - chunks_per_tile)).astype(jnp.int32)

    idx = jnp.arange(capacity, dtype=jnp.int32)
    tile_clip = jnp.clip(sorted_tile, 0, T - 1)
    rank = idx - tile_starts[tile_clip]
    ppos = jnp.where(sorted_tile < T, padded_starts[tile_clip] + rank, pcap)
    padded_gauss = jnp.full((pcap,), N, jnp.int32).at[ppos].set(
        sorted_gauss, mode="drop", unique_indices=True
    )

    n_dropped = (total - n_stored) + jnp.sum(n_tiles - n_capped)
    return TileBinning(
        padded_gauss=padded_gauss,
        padded_starts=padded_starts,
        counts=counts,
        n_isect=total,
        n_dropped=n_dropped,
    )


def build_soa(
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    depths: jnp.ndarray,
    padded_gauss: jnp.ndarray,
) -> jnp.ndarray:
    """Gather per-gaussian data into the (16, padded_capacity) SoA matrix.

    Differentiable w.r.t. the gaussian arrays: the VJP of the gather is a
    scatter-add over gaussian ids, which is exactly the per-gaussian gradient
    accumulation the CUDA backward does with atomics — here it's one XLA
    scatter instead.
    """
    N = means2d.shape[0]
    dtype = means2d.dtype
    # Flat per-quantity arrays with one dummy tail element (index N): TPU HBM
    # pads the minor dim of a (pcap, 16) array to 128 (8x memory/bandwidth
    # blowup — measured), and a (16, pcap) column gather is strided. Sixteen
    # independent 1D gathers + a stack along axis 0 keep every access
    # contiguous, and the VJP is sixteen 1D scatter-adds.
    dummy_vals = (-1e4, -1e4, 1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    quantities = (
        means2d[:, 0], means2d[:, 1],
        conics[:, 0], conics[:, 1], conics[:, 2],
        opacities,
        colors[:, 0], colors[:, 1], colors[:, 2],
        depths,
        jnp.ones((N,), dtype),
    )
    rows = [
        jnp.concatenate([q, jnp.full((1,), dv, dtype)])[padded_gauss]
        for q, dv in zip(quantities, dummy_vals)
    ]
    pcap = padded_gauss.shape[0]
    rows += [jnp.zeros((pcap,), dtype)] * 5
    return jnp.stack(rows, axis=0)  # (16, pcap)
