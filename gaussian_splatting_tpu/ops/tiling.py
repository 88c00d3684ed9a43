"""Tile binning for the Pallas rasterizer — the XLA-side preprocessing.

Replaces the reference's CUDA tile binning (inside the external gsplat
kernel, reference ``gsplat_backend.py:83-97``) with a design measured and
shaped around what the TPU + XLA actually do fast and slow:

  fast:  lax.sort (~200M entries/s), dense elementwise, tiny gathers
  slow:  large scatters (~10-70M elem/s), large gathers (~700M elem/s)

Pipeline (scatter-free):
1. Dense slot enumeration: every gaussian owns MAX_T static slots; slot s
   holds the s-th covered tile of its (clipped) radius bbox, or a sentinel.
   No compaction — the sort handles sentinels (they sink to the end).
2. ONE ``lax.sort`` over the flattened (N*MAX_T,) enumeration with keys
   (tile_id, depth) and payloads (gaussian_idx [, slot_idx]) — per-tile
   front-to-back lists fall out.
3. Aligned-segment re-pack **by gather**: every tile's segment starts at a
   CHUNK-aligned offset so the Pallas kernels DMA only aligned fixed-size
   blocks and backward writes never straddle tiles. The padded->sorted source
   map is built from per-chunk constants expanded with ``jnp.repeat`` (static
   chunk factor) + gathers over (T,)-sized tables only — no big scatter.
4. ``build_soa``: per-quantity 1D gathers into the (16, padded_capacity) SoA
   the kernels consume. Its VJP is NOT the XLA scatter-add (measured 10x
   slower than gather): a custom_vjp reduces per-entry gradients back to
   gaussians by *gathering* them into the dense (N, MAX_T) slot layout (via
   the inverse permutation from step 2, recovered with one payload sort) and
   summing over slots — dense, vectorized, race-free.

SoA row layout (16, pcap):
   0 mean_x | 1 mean_y | 2 conic_a | 3 conic_b | 4 conic_c | 5 opacity |
   6 r | 7 g | 8 b | 9 depth | 10 const-one | 11..15 zero
The const-one row makes ``sum(w) = 1 - T_final`` fall out of the kernel's
blend matmul. Padding entries index a dummy gaussian (id N, opacity 0, far
off-screen), so kernels need no validity masks.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def cdiv(a, b):
    return -(-a // b)


class TileBinning(NamedTuple):
    padded_gauss: jnp.ndarray    # (pcap,) int32 gaussian ids (N = dummy)
    padded_starts: jnp.ndarray   # (T,) int32 CHUNK-aligned segment starts
    counts: jnp.ndarray          # (T,) int32 real intersections per tile
    n_isect: jnp.ndarray         # () int32 total real intersections
    n_dropped: jnp.ndarray       # () int32 entries lost to the MAX_T cap
    slot_to_padded: Optional[jnp.ndarray]  # (N, MAX_T) int32 or None


def padded_capacity_for(n: int, max_t: int, num_tiles: int, chunk: int) -> int:
    """Static capacity of the aligned-segment buffer: the dense enumeration
    size plus worst-case per-tile alignment waste, rounded to chunks."""
    return cdiv(n * max_t + num_tiles * (chunk - 1), chunk) * chunk


def isect_tiles(
    means2d: jnp.ndarray,
    radii: jnp.ndarray,
    depths: jnp.ndarray,
    width: int,
    height: int,
    tile_size: int,
    chunk: int,
    max_tiles_per_gaussian: int = 8,
    need_inverse: bool = False,
) -> TileBinning:
    """Bin N screen-space gaussians into per-tile depth-sorted aligned
    segments. ``need_inverse`` additionally returns the (N, MAX_T) slot ->
    padded-position map used by the gradient reduction (training path)."""
    N = means2d.shape[0]
    ts = tile_size
    ntx = cdiv(width, ts)
    nty = cdiv(height, ts)
    T = ntx * nty
    max_t = max_tiles_per_gaussian
    M = N * max_t
    pcap = padded_capacity_for(N, max_t, T, chunk)
    n_chunk_cap = pcap // chunk

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

    # Dense slot enumeration (N, MAX_T), sentinel tile T for unused slots.
    s = jnp.arange(max_t, dtype=jnp.int32)[None, :]
    nx_safe = jnp.maximum(nx, 1)[:, None]
    dy = s // nx_safe
    dx = s - dy * nx_safe
    tid = (ty0[:, None] + dy) * ntx + (tx0[:, None] + dx)
    slot_ok = s < n_capped[:, None]
    tile_key = jnp.where(slot_ok, tid, T).reshape(-1)
    depth_key = jnp.broadcast_to(depths[:, None], (N, max_t)).reshape(-1)
    gauss_pl = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[:, None], (N, max_t)
    ).reshape(-1)

    if need_inverse:
        slot_pl = jax.lax.broadcasted_iota(jnp.int32, (N, max_t), 0) * max_t \
            + jax.lax.broadcasted_iota(jnp.int32, (N, max_t), 1)
        sorted_tile, _, sorted_gauss, sorted_slot = jax.lax.sort(
            (tile_key, depth_key, gauss_pl, slot_pl.reshape(-1)), num_keys=2
        )
    else:
        sorted_tile, _, sorted_gauss = jax.lax.sort(
            (tile_key, depth_key, gauss_pl), num_keys=2
        )
        sorted_slot = None

    tile_starts = jnp.searchsorted(
        sorted_tile, jnp.arange(T + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    counts = tile_starts[1:] - tile_starts[:-1]

    # Aligned segments by gather: per-chunk constants expanded with repeat.
    chunks_per_tile = cdiv(counts, chunk)  # (T,)
    total_chunks = jnp.sum(chunks_per_tile)
    padded_starts = (chunk * (jnp.cumsum(chunks_per_tile) - chunks_per_tile)).astype(jnp.int32)

    # tile id of each padded chunk; trailing unused chunks -> sentinel T.
    lengths = jnp.concatenate(
        [chunks_per_tile, (n_chunk_cap - total_chunks)[None]]
    )
    tile_of_chunk = jnp.repeat(
        jnp.arange(T + 1, dtype=jnp.int32), lengths, total_repeat_length=n_chunk_cap
    )  # (n_chunk_cap,)
    starts_ext = jnp.concatenate([tile_starts[:-1], jnp.int32(0)[None]])
    pstarts_ext = jnp.concatenate([padded_starts, jnp.int32(0)[None]])
    counts_ext = jnp.concatenate([counts, jnp.int32(0)[None]])
    delta_chunk = starts_ext[tile_of_chunk] - pstarts_ext[tile_of_chunk]  # tiny gathers
    count_chunk = counts_ext[tile_of_chunk]
    pstart_chunk = pstarts_ext[tile_of_chunk]

    p = jnp.arange(pcap, dtype=jnp.int32)
    delta_p = jnp.repeat(delta_chunk, chunk)      # static repeat: broadcast+reshape
    count_p = jnp.repeat(count_chunk, chunk)
    pstart_p = jnp.repeat(pstart_chunk, chunk)
    src = p + delta_p                              # sorted-array source index
    valid_p = (p - pstart_p) < count_p
    sorted_gauss_ext = jnp.concatenate([sorted_gauss, jnp.full((1,), N, jnp.int32)])
    padded_gauss = jnp.where(
        valid_p, sorted_gauss_ext[jnp.clip(src, 0, M)], N
    )

    slot_to_padded = None
    if need_inverse:
        # Padded position of each sorted entry; invalid -> pcap sentinel.
        tclip = jnp.clip(sorted_tile, 0, T - 1)
        rank = jnp.arange(M, dtype=jnp.int32) - tile_starts[tclip]
        ppos = jnp.where(
            sorted_tile < T, padded_starts[tclip] + rank, pcap
        ).astype(jnp.int32)
        # Invert the sort permutation with one payload sort by slot id
        # (a permutation of [0, M) for valid entries; invalid entries carry
        # their own slot ids too, so the sort fully restores slot order).
        _, slot_to_padded_flat = jax.lax.sort((sorted_slot, ppos), num_keys=1)
        slot_to_padded = slot_to_padded_flat.reshape(N, max_t)

    return TileBinning(
        padded_gauss=padded_gauss,
        padded_starts=padded_starts,
        counts=counts,
        n_isect=n_isect,
        n_dropped=n_dropped,
        slot_to_padded=slot_to_padded,
    )


# ---------------------------------------------------------------------------
# SoA build with slot-reduction backward
# ---------------------------------------------------------------------------

_DUMMY = (-1e4, -1e4, 1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)


def _gather_rows(quantities, padded_gauss, dtype):
    rows = [
        jnp.concatenate([q, jnp.full((1,), dv, dtype)])[padded_gauss]
        for q, dv in zip(quantities, _DUMMY)
    ]
    pcap = padded_gauss.shape[0]
    rows += [jnp.zeros((pcap,), dtype)] * (16 - len(rows))
    return jnp.stack(rows, axis=0)  # (16, pcap)


@jax.custom_vjp
def _soa_from_quantities(quantities, padded_gauss, slot_to_padded):
    return _gather_rows(quantities, padded_gauss, quantities[0].dtype)


def _soa_fwd(quantities, padded_gauss, slot_to_padded):
    out = _gather_rows(quantities, padded_gauss, quantities[0].dtype)
    return out, (slot_to_padded, quantities[0].shape[0])


def _soa_bwd(res, g):
    """Per-gaussian gradient reduction by dense slot gather — the TPU-native
    replacement for the CUDA backward's atomics (and for XLA's slow
    scatter-add): grad_q[n] = sum_s g[row, slot_to_padded[n, s]]."""
    slot_to_padded, N = res
    assert slot_to_padded is not None, (
        "rasterize_tiled needs need_inverse=True binning for gradients"
    )
    pcap = g.shape[1]
    idx = jnp.minimum(slot_to_padded, pcap - 1)          # (N, MAX_T)
    mask = slot_to_padded < pcap
    grads = []
    for row in range(len(_DUMMY)):
        # where (not multiply): unwritten buffer regions behind the sentinel
        # may hold NaN, and 0 * NaN = NaN.
        picked = jnp.where(mask, g[row][idx], 0.0)        # (N, MAX_T)
        grads.append(jnp.sum(picked, axis=1))
    return tuple(grads), None, None


_soa_from_quantities.defvjp(_soa_fwd, _soa_bwd)


def build_soa(
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    depths: jnp.ndarray,
    padded_gauss: jnp.ndarray,
    slot_to_padded: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Gather per-gaussian data into the (16, pcap) SoA the kernels consume."""
    N = means2d.shape[0]
    quantities = (
        means2d[:, 0], means2d[:, 1],
        conics[:, 0], conics[:, 1], conics[:, 2],
        opacities,
        colors[:, 0], colors[:, 1], colors[:, 2],
        depths,
        jnp.ones((N,), means2d.dtype),
    )
    if slot_to_padded is None:
        # Inference path: plain gathers, default XLA VJP never taken.
        return _gather_rows(quantities, padded_gauss, means2d.dtype)
    return _soa_from_quantities(quantities, padded_gauss, slot_to_padded)
