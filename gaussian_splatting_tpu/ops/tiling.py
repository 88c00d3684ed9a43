"""Tile binning for the Pallas rasterizer — the XLA-side preprocessing.

Replaces the reference's CUDA tile binning (inside the external gsplat
kernel, reference ``gsplat_backend.py:83-97``) with a design measured and
shaped around what XLA:TPU actually does fast and slow (v5e, cache-busted):

  fast:  lax.sort keys (~150M entries/s) with payload operands ~FREE
         (13-operand sort == 3-operand sort), dense elementwise, cumsum
  slow:  large scatters (~40M elem/s), large-table gathers (~100M elem/s)

So the pipeline carries *all per-gaussian quantities through the sort as
payloads* and never gathers or scatters anything big:

1. Slot enumeration in one of two modes:
   - ``dense``: every gaussian owns MAX_T static slots (simple; ~40-70% of
     slots are sentinels in real scenes).
   - ``compact`` (the fast path): gaussians are grouped into power-of-two
     footprint classes (1, 2, 4, ... MAX_T covered tiles) by ONE cheap
     N-sized payload sort, then each class is expanded with exactly its cap
     — a broadcast per class, never a gather. The big M-sized sort below
     shrinks by the sentinel ratio (measured 16M -> ~6M slots at the 1M
     gaussian / 1080p benchmark). Per-class gaussian budgets are static
     (recompile knobs); overflow is counted, never silent.
   Slot s of a gaussian holds the s-th covered tile of its clipped radius
   bbox, or a sentinel (sentinels sink to the end of the sort).
   Gaussians with opacity < 1/255 are culled exactly: their per-pixel alpha
   ``op * vis <= op`` can never reach the kernel's 1/255 contribution gate,
   so forward AND backward are bit-identical without their entries.
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

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# A gaussian with opacity below the kernels' per-pixel contribution gate
# (rasterize_pallas.ALPHA_SKIP) can never contribute color or gradient:
# alpha = op * exp(-sigma) <= op. Culling these in binning is exact.
OPACITY_CULL = 1.0 / 255.0


def cdiv(a, b):
    return -(-a // b)


class TileBinning(NamedTuple):
    sorted_soa: jnp.ndarray      # (16, M + 2*chunk) kernel-ready SoA
    tile_starts: jnp.ndarray     # (T + 1,) int32 segment starts (unaligned)
    counts: jnp.ndarray          # (T,) int32 real intersections per tile
    padded_starts: jnp.ndarray   # (T,) int32 chunk-aligned grad-buffer starts
    n_isect: jnp.ndarray         # () int32 total real intersections
    n_dropped: jnp.ndarray       # () int32 tiles lost to the MAX_T cap
    n_budget_dropped: jnp.ndarray  # () int32 tiles lost to class-budget overflow
    n_bucket_dropped: jnp.ndarray  # () int32 tiles lost to partition-bucket overflow


def padded_capacity_for(n_slots: int, num_tiles: int, chunk: int) -> int:
    """Static capacity of the aligned gradient buffer for ``n_slots`` sort
    entries: every tile's segment is rounded up to a chunk boundary."""
    return cdiv(n_slots + num_tiles * (chunk - 1), chunk) * chunk


def class_caps(max_t: int) -> Tuple[int, ...]:
    """Footprint class caps 1,2,3,4,6,8,12,16,24,32,... up to max_t.
    Finer-than-pow2 steps keep slot inflation (cap/actual tiles) near 1.1x
    instead of 1.35x — the sort length is the pipeline's dominant cost."""
    assert max_t >= 1 and (max_t & (max_t - 1)) == 0, "max_t must be a power of 2"
    caps = [c for c in (1, 2, 3, 4, 6) if c <= max_t]
    c = caps[-1]
    while c < max_t:
        c = c * 4 // 3 if c % 3 == 0 else c * 3 // 2
        caps.append(c)
    return tuple(caps)


def squeeze_budgets_under_pow2(budgets, hard_min, caps, align: int = 128,
                               max_trim: float = 0.10) -> Tuple[int, ...]:
    """If trimming at most ``max_trim`` of the total slot count gets the
    sort under the next-lower pow2 boundary, trim the headroom (never below
    ``hard_min``, the measured per-class population): the pow2 step costs
    ~28% (measured: 35.5 ms at 4.19M vs 49.3 ms at 4.20M for the 12-operand
    sort), so a small trim that crosses down is a clear win. Otherwise
    return budgets unchanged."""
    budgets = [int(b) for b in budgets]
    hard_min = [int(h) for h in hard_min]
    s = sum(b * int(c) for b, c in zip(budgets, caps))
    if s <= 0:
        return tuple(budgets)
    p2lo = 1 << (s.bit_length() - 1)        # pow2 floor of current total
    if s == p2lo:
        return tuple(budgets)
    s_hard = sum(h * int(c) for h, c in zip(hard_min, caps))
    if s_hard > p2lo or s - p2lo > max_trim * s:
        return tuple(budgets)
    f = p2lo / s
    out = []
    for b, h in zip(budgets, hard_min):
        t = max(h, int(b * f) // align * align)
        out.append(min(t, b))
    # Rounding can leave the total above the boundary; shave the largest
    # classes (by slot contribution) down an alignment step at a time.
    total = sum(t * int(c) for t, c in zip(out, caps))
    order = sorted(range(len(out)), key=lambda i: -out[i] * int(caps[i]))
    gi = 0
    while total > p2lo and gi < 10 * len(out):
        i = order[gi % len(out)]
        if out[i] - align >= hard_min[i]:
            out[i] -= align
            total -= align * int(caps[i])
        gi += 1
    if total > p2lo:
        return tuple(budgets)
    return tuple(out)


def total_slots(n: int, max_t: int,
                class_budgets: Optional[Tuple[int, ...]]) -> int:
    """Static sort size M for a given binning mode."""
    if class_budgets is None:
        return n * max_t
    caps = class_caps(max_t)
    assert len(class_budgets) == len(caps), (
        f"need {len(caps)} class budgets for max_t={max_t}, "
        f"got {len(class_budgets)}")
    return int(sum(b * c for b, c in zip(class_budgets, caps)))


def exact_tile_counts(means2d, radii, width, height, ts,
                      conics=None, opacities=None,
                      row_lo: int = 0, row_hi: Optional[int] = None):
    """Host-side (numpy) per-gaussian slot counts — the exact footprint
    ``_tile_rects`` produces, for budget/cap measurement. With conics +
    opacities this mirrors the sheared-window count (ny * wt); without, the
    legacy radius-bbox count. ``row_lo/row_hi`` clip to a tile-row band
    (per-band budget measurement for ``sort_bands``)."""
    import numpy as np

    m = np.asarray(means2d, np.float64)
    r = np.asarray(radii, np.float64)
    ntx = cdiv(width, ts)
    nty = cdiv(height, ts)
    lo = row_lo
    hi = nty if row_hi is None else row_hi
    if conics is None:
        tx0 = np.clip(np.floor((m[:, 0] - r) / ts), 0, ntx)
        tx1 = np.clip(np.ceil((m[:, 0] + r) / ts), 0, ntx)
        ty0 = np.clip(np.floor((m[:, 1] - r) / ts), lo, hi)
        ty1 = np.clip(np.ceil((m[:, 1] + r) / ts), lo, hi)
        nt = np.maximum(tx1 - tx0, 0) * np.maximum(ty1 - ty0, 0)
        return np.where(r > 0, nt, 0).astype(np.int64)
    c = np.asarray(conics, np.float64)
    op = np.asarray(opacities, np.float64)
    ca, cb, cc = c[:, 0], c[:, 1], c[:, 2]
    ca_s = np.maximum(ca, 1e-12)
    det_s = np.maximum(ca * cc - cb * cb, 1e-20)
    Q = 2.0 * (np.log(255.0 * np.maximum(op, 1e-12)) + 1e-3)
    xe = np.minimum(r, np.sqrt(np.maximum(Q, 0) * np.maximum(cc, 1e-12) / det_s)
                    + _WINDOW_EPS)
    ye = np.minimum(r, np.sqrt(np.maximum(Q, 0) * ca_s / det_s) + _WINDOW_EPS)
    tx0 = np.clip(np.floor((m[:, 0] - xe) / ts), 0, ntx)
    tx1 = np.clip(np.ceil((m[:, 0] + xe) / ts), 0, ntx)
    ty0 = np.clip(np.floor((m[:, 1] - ye) / ts), lo, hi)
    ty1 = np.clip(np.ceil((m[:, 1] + ye) / ts), lo, hi)
    nx = np.maximum(tx1 - tx0, 0)
    ny = np.maximum(ty1 - ty0, 0)
    w_px = (np.abs(cb) * ts + 2.0 * np.sqrt(np.maximum(Q, 0) * ca_s)) / ca_s \
        + 2.0 * _WINDOW_EPS
    wt = np.minimum(np.ceil(w_px / ts) + 1, nx)
    nt = ny * wt
    return np.where((r > 0) & (op >= OPACITY_CULL), nt, 0).astype(np.int64)


# Half-pixel slack (px) on sheared-window bounds: dwarfs f32 rounding
# differences between the window formulas and the per-tile cull test, so a
# tile the cull keeps is always inside the enumeration window.
_WINDOW_EPS = 0.5


def _gate_q(opacities):
    """Contribution-gate Mahalanobis threshold: alpha = op*exp(-q/2) crosses
    1/255 at q = 2*ln(255*op) (+ the cull's f32 slack). Clamped at 0:
    sub-gate opacities are removed by OPACITY_CULL before this matters, and
    a negative Q would NaN the sqrt-based window extents."""
    return jnp.maximum(
        2.0 * (jnp.log(255.0 * jnp.maximum(opacities, 1e-12)) + 1e-3), 0.0)


def _tile_rects(means2d, conics, opacities, radii, width, height, ts, max_t,
                row_lo: int = 0, row_hi: Optional[int] = None):
    """Sheared-window tile geometry per gaussian.

    Instead of the radius bbox (nx*ny tiles, most of which a thin ellipse
    never touches), each gaussian enumerates ny rows of a constant-width
    window that follows the ellipse axis. Width bound: per tile row of
    height ts, kept tiles span at most drift + max chord =
    ``|cb|*ts/ca + 2*sqrt(Q/ca)`` pixels (center(dy) = -cb*dy/ca moves
    |cb|/ca px per dy; the chord at fixed dy is 2*sqrt(ca*Q - det*dy^2)/ca
    <= 2*sqrt(Q/ca)). Rows/columns come from the exact gate-ellipse AABB
    (x extent sqrt(Q*cc/det), y extent sqrt(Q*ca/det)) intersected with the
    radius bbox, so behavior is a strict subset of the old bbox enumeration.

    ``row_lo/row_hi`` clip the enumerated tile rows to a horizontal band
    (the band-split sort, ``sort_bands``): the gaussian's footprint within
    [row_lo, row_hi) only. Defaults cover the full grid.
    Returns (ntx, nty, tx0, ty0, nx, wt, n_tiles, n_capped)."""
    ntx = cdiv(width, ts)
    nty = cdiv(height, ts)
    if row_hi is None:
        row_hi = nty
    valid = (radii > 0) & (opacities >= OPACITY_CULL)
    r = radii.astype(jnp.float32)
    mx, my = means2d[:, 0], means2d[:, 1]
    ca, cb, cc = conics[:, 0], conics[:, 1], conics[:, 2]
    ca_s = jnp.maximum(ca, 1e-12)
    det_s = jnp.maximum(ca * cc - cb * cb, 1e-20)
    Q = _gate_q(opacities)
    xe = jnp.minimum(r, jnp.sqrt(Q * jnp.maximum(cc, 1e-12) / det_s) + _WINDOW_EPS)
    ye = jnp.minimum(r, jnp.sqrt(Q * ca_s / det_s) + _WINDOW_EPS)
    tx0 = jnp.clip(jnp.floor((mx - xe) / ts), 0, ntx).astype(jnp.int32)
    tx1 = jnp.clip(jnp.ceil((mx + xe) / ts), 0, ntx).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((my - ye) / ts), row_lo, row_hi).astype(jnp.int32)
    ty1 = jnp.clip(jnp.ceil((my + ye) / ts), row_lo, row_hi).astype(jnp.int32)
    nx = jnp.where(valid, jnp.maximum(tx1 - tx0, 0), 0)
    ny = jnp.where(valid, jnp.maximum(ty1 - ty0, 0), 0)
    w_px = (jnp.abs(cb) * ts + 2.0 * jnp.sqrt(Q * ca_s)) / ca_s + 2.0 * _WINDOW_EPS
    # min in float BEFORE the int cast: w_px can overflow int32 for
    # degenerate near-singular conics.
    wt = jnp.minimum(jnp.ceil(w_px / ts) + 1.0,
                     nx.astype(jnp.float32)).astype(jnp.int32)
    n_tiles = ny * wt
    n_capped = jnp.minimum(n_tiles, max_t)
    return ntx, nty, tx0, ty0, nx, wt, n_tiles, n_capped


def _slot_tiles(tx0, ty0, nx, wt, n_capped, s, ntx, ts, sentinel, ellipse):
    """Tile id of slot ``s`` per gaussian, sheared-window enumeration.
    Pure elementwise broadcasting: callers pass (1, G) rows with an (S, 1)
    slot iota (lanes on the large G axis) — or any compatible layout —
    and get the broadcast shape back. ``ellipse=(mx, my, ca, cb, cc, op)``.

    Slot s -> (row r, column c) of the gaussian's ny x wt window. The
    window's per-row base is a conservative lower bound on the leftmost
    tile the gate-ellipse can touch in that row (min chord center over the
    row band minus the max half-chord), clipped into the gaussian's AABB —
    every tile the cull below keeps is inside the window (see _tile_rects
    for the width bound).

    A slot whose tile rect provably cannot reach the kernels' 1/255
    contribution gate is then sentineled out: with alpha(p) = op*exp(-q/2),
    q = d^T conic d, the EXACT minimum of the convex quadratic q over the
    tile rect is closed-form — 0 if the mean lies inside, else the min over
    the 4 edges (each a 1-D quadratic with a clamped stationary point).
    ``q_min/2 > ln(255*op)`` guarantees every pixel in the tile is below
    the gate the kernels (and the oracle) already apply, so culling is
    bit-exact. gsplat's CUDA binning keeps the full radius bbox (reference
    call site gsplat_backend.py:83-97), which for thin anisotropic splats
    wastes most of its intersections on tiles the ellipse never touches."""
    mx, my, ca, cb, cc, op = ellipse
    fts = jnp.float32(ts)
    wt_safe = jnp.maximum(wt, 1)
    r = s // wt_safe
    c = s - r * wt_safe

    ca_s = jnp.maximum(ca, 1e-12)
    cc_s = jnp.maximum(cc, 1e-12)
    det = ca * cc - cb * cb
    Q = _gate_q(op)

    # Conservative leftmost kept x in this row band [dyl, dyl+ts]:
    # chord center -cb*dy/ca drifts |cb|*ts/(2*ca) around the band middle;
    # half-chord sqrt(ca*Q - det*dy^2)/ca peaks at the band dy nearest 0.
    dyl = (ty0 + r).astype(jnp.float32) * fts - my
    dyc = dyl + 0.5 * fts
    dym = jnp.clip(0.0, dyl, dyl + fts)
    half_chord = jnp.sqrt(jnp.maximum(ca * Q - det * dym * dym, 0.0)) / ca_s
    dxlo = (-cb * dyc - 0.5 * jnp.abs(cb) * fts) / ca_s - half_chord - _WINDOW_EPS
    txlo = jnp.floor((mx + dxlo) / fts).astype(jnp.int32)
    base = jnp.clip(txlo, tx0, tx0 + nx - wt_safe)

    tx = base + c
    ty = ty0 + r
    tid = ty * ntx + tx
    keep = s < n_capped

    # Exact conservative ellipse-tile cull over the slot's pixel rect
    # [xl, xl+ts] x [yl, yl+ts] (covers every pixel-center convention).
    dxl_t = tx.astype(jnp.float32) * fts - mx
    dxh_t = dxl_t + fts
    dyl_t = ty.astype(jnp.float32) * fts - my
    dyh_t = dyl_t + fts

    def q(qx, qy):
        return ca * qx * qx + 2.0 * cb * qx * qy + cc * qy * qy

    def edge_x(qx):   # dx fixed at an x-edge; optimal dy clamped to rect
        return q(qx, jnp.clip(-cb * qx / cc_s, dyl_t, dyh_t))

    def edge_y(qy):
        return q(jnp.clip(-cb * qy / ca_s, dxl_t, dxh_t), qy)

    q_min = jnp.minimum(jnp.minimum(edge_x(dxl_t), edge_x(dxh_t)),
                        jnp.minimum(edge_y(dyl_t), edge_y(dyh_t)))
    inside = (dxl_t <= 0) & (dxh_t >= 0) & (dyl_t <= 0) & (dyh_t >= 0)
    q_min = jnp.where(inside, 0.0, q_min)
    keep = keep & ~(q_min > Q)
    return jnp.where(keep, tid, sentinel)


_PACK_C = 8192  # columns per pack-kernel block (512 KB out block in VMEM)


def _pack_kernel(*refs, C, M):
    """One grid step packs C columns of the 11 sorted quantity rows into the
    (16, C) SoA block: rows 0..9 data, row 10 = 1.0, row 11 = gaussian id,
    rows 12..15 = 0. Columns past M (the pad tail the rasterizer's aligned
    window reads run into) are zeroed, bit-identical to the jnp.stack +
    jnp.pad this kernel replaces — which XLA lowered to ~10 ms of strided
    copies at the 1M-gaussian benchmark (measured; see BENCH.md) where this
    single bandwidth-bound pass costs ~1 ms."""
    ins, out = refs[:-1], refs[-1]
    b = pl.program_id(0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) + b * C
    ok = col < M
    for i in range(10):          # mx, my, ca, cb, cc, op, r, g, b, depth
        out[i:i + 1, :] = jnp.where(ok, ins[i][...], 0.0)
    out[10:11, :] = jnp.where(ok, 1.0, 0.0)
    out[11:12, :] = jnp.where(ok, ins[10][...], 0.0)
    out[12:16, :] = jnp.zeros((4, C), jnp.float32)


@functools.lru_cache(maxsize=None)
def _make_pack(M, pad, interpret):
    C = _PACK_C
    Mout = cdiv(M + pad, C) * C
    n_in_blocks = cdiv(M, C)

    def in_map(b):
        return (0, jnp.minimum(b, n_in_blocks - 1))

    return pl.pallas_call(
        functools.partial(_pack_kernel, C=C, M=M),
        grid=(Mout // C,),
        in_specs=[pl.BlockSpec((1, C), in_map, memory_space=pltpu.VMEM)
                  for _ in range(11)],
        out_specs=pl.BlockSpec((16, C), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, Mout), jnp.float32),
        interpret=interpret,
    )


def pack_soa(quantity_rows, pad: int, interpret: Optional[bool] = None):
    """Stack the 11 sorted (M,) quantity arrays [mx, my, ca, cb, cc, op, r,
    g, b, depth, gid] into the kernel-ready (16, >= M + pad) SoA (layout in
    the module docstring) with one bandwidth-bound Pallas pass."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M = quantity_rows[0].shape[0]
    call = _make_pack(M, pad, bool(interpret))
    return call(*(q.reshape(1, M) for q in quantity_rows))


def _pack_rows_kernel(*refs, C, M, R, sentinel):
    """Pack R sorted (1, C) row blocks into a (16, C) block: row 0 = segment
    key (columns past M get ``sentinel`` so the ascending-key invariant the
    segsum sweep relies on survives the pad), rows 1..R-1 = payloads (pad
    zeros), rows R..15 = zeros."""
    ins, out = refs[:-1], refs[-1]
    b = pl.program_id(0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) + b * C
    ok = col < M
    out[0:1, :] = jnp.where(ok, ins[0][...], sentinel)
    for i in range(1, R):
        out[i:i + 1, :] = jnp.where(ok, ins[i][...], 0.0)
    out[R:16, :] = jnp.zeros((16 - R, C), jnp.float32)


@functools.lru_cache(maxsize=None)
def _make_pack_rows(M, R, sentinel, interpret):
    C = _PACK_C
    Mout = cdiv(M, C) * C
    n_in_blocks = cdiv(M, C)

    def in_map(b):
        return (0, jnp.minimum(b, n_in_blocks - 1))

    return pl.pallas_call(
        functools.partial(_pack_rows_kernel, C=C, M=M, R=R, sentinel=sentinel),
        grid=(Mout // C,),
        in_specs=[pl.BlockSpec((1, C), in_map, memory_space=pltpu.VMEM)
                  for _ in range(R)],
        out_specs=pl.BlockSpec((16, C), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, Mout), jnp.float32),
        interpret=interpret,
    )


def pack_rows(rows, sentinel: float, interpret: Optional[bool] = None):
    """Pack R <= 16 sorted (M,) arrays (row 0 = ascending segment key) into
    the (16, >= M) segsum-ready buffer with one bandwidth-bound Pallas pass.
    ``jnp.stack`` + ``jnp.concatenate`` here lowered to ~10 ms of strided
    copies at the 1M-gaussian bench (same pathology pack_soa fixed in
    binning); this pass is a straight bandwidth copy."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = len(rows)
    assert 1 <= R <= 16
    M = rows[0].shape[0]
    call = _make_pack_rows(M, R, float(sentinel), bool(interpret))
    return call(*(q.reshape(1, M) for q in rows))


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
    class_budgets: Optional[Tuple[int, ...]] = None,
    depth_bits: int = 0,
    sort_buckets: int = 0,
    bucket_headroom: float = 1.5,
    sort_bands: int = 0,
    interpret: Optional[bool] = None,
    _skip_final_sort: bool = False,
) -> TileBinning:
    """Bin + depth-sort N screen-space gaussians, carrying their render
    quantities through the sort. Returns the kernel-ready SoA and segment
    tables. Not differentiable by itself — wrapped in the rasterizer's
    custom_vjp (gradients come back through the sort-based reduction).

    ``class_budgets=None`` selects the dense N*MAX_T slot layout; a tuple of
    per-class gaussian budgets (ascending caps 1, 2, 4, ..., MAX_T) selects
    the compact layout whose sort size is ``total_slots(...)``.

    ``depth_bits > 0`` packs (tile_id << depth_bits | quantized_depth) into
    ONE int32 sort key instead of the exact two-key lexicographic compare —
    only the blend ORDER of nearly-equal depths quantizes (the kernels still
    see exact depths); the classic CUDA pipelines quantize depth into their
    radix keys the same way. 13-bit tile ids + 16-bit depth fit int32.

    ``sort_buckets = B > 0`` (power of two) replaces the one flat M-entry
    sort with the Pallas bucket partition (``ops/partition.py``) by
    ``tile % B`` plus B independent per-bucket sorts batched in ONE
    ``lax.sort(dimension=1)`` call — measured ~2 ns/entry at rows <= 1M vs
    ~10 ns/entry for the flat 4M+ sort (BENCH.md). The interleaved modulo
    assignment balances buckets by construction; per-bucket capacity is
    ``M/B * bucket_headroom`` and overflow is counted in
    ``n_bucket_dropped`` (never silent). Bucket order within each tile is
    exact (tile, depth) — ``depth_bits`` is ignored on this path (it is a
    flat-sort cost knob; the batched sort pays little for the second key).

    ``sort_bands = K > 1`` splits the screen into K horizontal tile-row
    bands, each enumerated and sorted independently (``_band_binned``) —
    the XLA-only way to ride the short-sort rate: disjoint tile ranges
    concatenate back into global tile order with no partition kernel.
    Exclusive with ``sort_buckets``; ``depth_bits`` is ignored (bands use
    the exact two-key sort).
    """
    N = means2d.shape[0]
    assert N < (1 << 24), "gaussian ids must be exact in f32"
    ts = tile_size
    max_t = max_tiles_per_gaussian
    ntx = cdiv(width, ts)
    nty = cdiv(height, ts)
    T = ntx * nty
    gauss_f32 = jnp.arange(N, dtype=jnp.float32)

    if sort_bands and sort_bands > 1 and not _skip_final_sort:
        assert not sort_buckets, "sort_bands and sort_buckets are exclusive"
        return _band_binned(
            means2d, conics, colors, opacities, depths, radii, gauss_f32,
            width, height, ts, chunk, max_t, class_budgets, int(sort_bands),
            ntx, nty, T, interpret)

    tile_key, quantity_cols, n_isect, n_budget_dropped, n_dropped = (
        _enumerate_slots(
            means2d, conics, colors, opacities, depths, radii, gauss_f32,
            width, height, ts, max_t, class_budgets, ntx, T))

    M = tile_key.shape[0]
    n_bucket_dropped = jnp.zeros((), jnp.int32)
    if sort_buckets and not _skip_final_sort:
        return _bucket_binned(
            tile_key, quantity_cols, T, M, chunk, int(sort_buckets),
            float(bucket_headroom), n_isect, n_dropped, n_budget_dropped,
            interpret)
    if _skip_final_sort:
        # Profiling-only: bypass the big sort (output is NOT render-valid).
        sorted_ops = (tile_key,) + quantity_cols
        query = jnp.arange(T + 1, dtype=jnp.int32)
    elif depth_bits:
        assert (T + 1) < (1 << (31 - depth_bits)), \
            "tile grid too large for the combined sort key"
        levels = (1 << depth_bits) - 1
        depth_col = quantity_cols[0]
        real = tile_key < T
        inf = jnp.float32(jnp.inf)
        dmin = jnp.min(jnp.where(real, depth_col, inf))
        dmax = jnp.max(jnp.where(real, depth_col, -inf))
        scale = levels / jnp.maximum(dmax - dmin, 1e-20)
        qd = jnp.clip((depth_col - dmin) * scale, 0, levels).astype(jnp.int32)
        key = tile_key * (1 << depth_bits) + jnp.where(real, qd, 0)
        sorted_ops = jax.lax.sort((key,) + quantity_cols, num_keys=1)
        query = jnp.arange(T + 1, dtype=jnp.int32) * (1 << depth_bits)
    else:
        sorted_ops = jax.lax.sort((tile_key,) + quantity_cols, num_keys=2)
        query = jnp.arange(T + 1, dtype=jnp.int32)
    s_depth = sorted_ops[1]
    (s_mx, s_my, s_ca, s_cb, s_cc, s_op, s_r, s_g, s_b, s_gid) = sorted_ops[2:]

    tile_starts = jnp.searchsorted(sorted_ops[0], query).astype(jnp.int32)
    counts = tile_starts[1:] - tile_starts[:-1]
    chunks_per_tile = cdiv(counts, chunk)
    padded_starts = (
        chunk * (jnp.cumsum(chunks_per_tile) - chunks_per_tile)
    ).astype(jnp.int32)

    # Pack into the kernel SoA, padded by >= 2*chunk so aligned window reads
    # never run off the end. Sentinel-slot entries sit past every tile's
    # segment and are additionally masked in-kernel by the counts. One
    # Pallas pass (pack_soa) — jnp.stack + jnp.pad lowered to ~10 ms of
    # strided copies here (measured at the 1M bench; see BENCH.md).
    soa = pack_soa(
        (s_mx, s_my, s_ca, s_cb, s_cc, s_op, s_r, s_g, s_b, s_depth, s_gid),
        pad=2 * chunk, interpret=interpret)
    return TileBinning(
        sorted_soa=soa,
        tile_starts=tile_starts,
        counts=counts,
        padded_starts=padded_starts,
        n_isect=n_isect,
        n_dropped=n_dropped,
        n_budget_dropped=n_budget_dropped,
        n_bucket_dropped=n_bucket_dropped,
    )


def _enumerate_slots(means2d, conics, colors, opacities, depths, radii,
                     gauss_f32, width, height, ts, max_t, class_budgets,
                     ntx, T, row_lo: int = 0, row_hi: Optional[int] = None):
    """Slot enumeration (dense or compact footprint-class expansion) over
    the tile rows [row_lo, row_hi) — the full grid by default, one band in
    the ``sort_bands`` path. Returns ``(tile_key, quantity_cols, n_isect,
    n_budget_dropped, n_dropped)`` with quantity_cols in SoA order
    (depth, mx, my, ca, cb, cc, op, r, g, b, gid)."""
    N = means2d.shape[0]
    _, _, tx0, ty0, nx, wt, n_tiles, n_capped = _tile_rects(
        means2d, conics, opacities, radii, width, height, ts, max_t,
        row_lo=row_lo, row_hi=row_hi)
    n_dropped = jnp.sum(n_tiles - n_capped)

    if class_budgets is None:
        # Dense slot enumeration, laid out (MAX_T, N) so the vector lanes ride
        # the large N axis (a (N, max_t) layout puts 16 lanes on the minor dim
        # — terribly tiled on TPU). Slot order is free: the big sort below is
        # the only consumer.
        s = jnp.arange(max_t, dtype=jnp.int32)[:, None]
        ell = (means2d[None, :, 0], means2d[None, :, 1], conics[None, :, 0],
               conics[None, :, 1], conics[None, :, 2], opacities[None, :])
        tile_key = _slot_tiles(
            tx0[None, :], ty0[None, :], nx[None, :], wt[None, :],
            n_capped[None, :], s, ntx, ts, T, ellipse=ell).reshape(-1)

        def expand(q):
            return jnp.broadcast_to(q[None, :], (max_t, N)).reshape(-1)

        quantity_cols = (
            expand(depths),
            expand(means2d[:, 0]), expand(means2d[:, 1]),
            expand(conics[:, 0]), expand(conics[:, 1]), expand(conics[:, 2]),
            expand(opacities),
            expand(colors[:, 0]), expand(colors[:, 1]), expand(colors[:, 2]),
            expand(gauss_f32),
        )
        n_isect = jnp.sum((tile_key < T).astype(jnp.int32))
        n_budget_dropped = jnp.zeros((), jnp.int32)
    else:
        caps = class_caps(max_t)
        L = len(caps)
        budgets = tuple(int(b) for b in class_budgets)
        assert len(budgets) == L

        # Footprint class: smallest cap >= n_capped; empty gaussians go to a
        # virtual class L that gets no slots at all.
        caps_arr = jnp.asarray(caps, jnp.int32)
        cls = jnp.sum((n_capped[:, None] > caps_arr[None, :]).astype(jnp.int32),
                      axis=1)
        cls = jnp.where(n_capped > 0, cls, L)

        # ONE N-sized payload sort groups gaussians by class (payloads are
        # ~free on TPU; this sort is MAX_T times smaller than the slot sort).
        ops = jax.lax.sort(
            (cls, depths,
             means2d[:, 0], means2d[:, 1],
             conics[:, 0], conics[:, 1], conics[:, 2],
             opacities,
             colors[:, 0], colors[:, 1], colors[:, 2],
             gauss_f32,
             tx0, ty0, nx, wt, n_capped),
            num_keys=1,
        )
        cls_s = ops[0]
        quantities_s = ops[1:12]   # depth, mx, my, ca, cb, cc, op, r, g, b, gid
        tx0_s, ty0_s, nx_s, wt_s, ncap_s = ops[12:17]

        counts_per_class = jnp.sum(
            (cls[:, None] == jnp.arange(L, dtype=jnp.int32)[None, :]).astype(jnp.int32),
            axis=0)                                     # (L,)
        starts_per_class = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_per_class)])[:L]

        # Budget-overflow accounting (tiles of gaussians beyond a class's
        # static budget are dropped for this render — counted, never silent).
        starts_of = jnp.zeros((N,), jnp.int32)
        budget_of = jnp.zeros((N,), jnp.int32)
        for c in range(L):
            starts_of = jnp.where(cls_s == c, starts_per_class[c], starts_of)
            budget_of = jnp.where(cls_s == c, budgets[c], budget_of)
        rank_in_class = jnp.arange(N, dtype=jnp.int32) - starts_of
        over = (rank_in_class >= budget_of) & (cls_s < L)
        # Overflow is counted in (conservative) bbox tiles — over-budget
        # gaussians are never expanded, so their ellipse-culled count is
        # unknown; alarming high beats alarming late.
        n_budget_dropped = jnp.sum(jnp.where(over, ncap_s, 0))

        # Pad so the per-class dynamic slices below never clamp (start <= N,
        # size <= max budget); padded rows carry n_capped = 0.
        pad = max(max(budgets), 1)
        quantities_p = tuple(jnp.pad(q, (0, pad)) for q in quantities_s)
        tx0_p = jnp.pad(tx0_s, (0, pad))
        ty0_p = jnp.pad(ty0_s, (0, pad))
        nx_p = jnp.pad(nx_s, (0, pad))
        wt_p = jnp.pad(wt_s, (0, pad))
        ncap_p = jnp.pad(ncap_s, (0, pad))

        key_parts = []
        q_parts = [[] for _ in range(11)]
        for c in range(L):
            NC = budgets[c]
            if NC == 0:
                continue
            cap_c = caps[c]
            start_c = starts_per_class[c]
            in_class = (jnp.arange(NC, dtype=jnp.int32)
                        < jnp.minimum(counts_per_class[c], NC))

            def sl(a, _s=start_c, _n=NC):
                return jax.lax.dynamic_slice_in_dim(a, _s, _n, axis=0)

            # (cap_c, NC) layout: lanes ride the 128-aligned budget axis, not
            # the tiny cap_c axis (1..max_t lanes would cripple TPU tiling).
            # Slot order within the concatenation is free — the big sort is
            # the only consumer.
            s = jnp.arange(cap_c, dtype=jnp.int32)[:, None]
            ncap_c = jnp.where(in_class, sl(ncap_p), 0)
            # quantities_p order: depth, mx, my, ca, cb, cc, op, r, g, b, gid
            ell = tuple(sl(quantities_p[qi])[None, :] for qi in (1, 2, 3, 4, 5, 6))
            tid = _slot_tiles(
                sl(tx0_p)[None, :], sl(ty0_p)[None, :], sl(nx_p)[None, :],
                sl(wt_p)[None, :], ncap_c[None, :], s, ntx, ts, T, ellipse=ell)
            key_parts.append(tid.reshape(-1))
            for qi in range(11):
                q_parts[qi].append(
                    jnp.broadcast_to(sl(quantities_p[qi])[None, :],
                                     (cap_c, NC)).reshape(-1))
        tile_key = jnp.concatenate(key_parts)
        quantity_cols = tuple(jnp.concatenate(p) for p in q_parts)
        n_isect = jnp.sum((tile_key < T).astype(jnp.int32))

    return tile_key, quantity_cols, n_isect, n_budget_dropped, n_dropped


def _band_binned(means2d, conics, colors, opacities, depths, radii,
                 gauss_f32, width, height, ts, chunk, max_t, class_budgets,
                 K, ntx, nty, T, interpret):
    """Band-split binning: K independent (tile, depth) sorts over disjoint
    horizontal tile-row bands, concatenated in band order.

    Tiles in different bands never interleave in the global tile order
    (tile = ty*ntx + tx, bands are contiguous ty ranges), so per-band sorts
    concatenated ARE the global per-tile order — and ``lax.sort`` is
    strongly superlinear in row length (measured ~11 ns/entry for the
    12-operand sort at 4.7M vs ~6 ns/entry at 600k slices; BENCH.md), so K
    short sorts beat one flat sort with zero new kernels and no data
    movement. Each band re-enumerates the footprints clipped to its rows
    (``_tile_rects(row_lo, row_hi)``): a gaussian spanning a band boundary
    expands in both bands — boundary-crossing inflation, typically a few
    percent at 16 px tiles.

    ``class_budgets`` (one tuple) is shared by every band: per-class
    budgets must cover the heaviest band (the trainer measures per-band
    class histograms and takes the max). Per-band sort size is
    ``total_slots(N, max_t, class_budgets)``; the concatenated SoA is K of
    those. Per-band overflow (budget and tile-cap) sums into the global
    counters. Sentinel slots sink to each band's tail — interior to the
    concatenated stream but past every tile's segment, exactly like the
    flat path's single tail.
    """
    band_h = cdiv(nty, K)
    streams = []
    n_isect = jnp.zeros((), jnp.int32)
    n_budget_dropped = jnp.zeros((), jnp.int32)
    n_dropped = jnp.zeros((), jnp.int32)
    starts_parts, counts_parts = [], []
    off = 0
    for k in range(K):
        lo = min(k * band_h, nty)
        hi = min((k + 1) * band_h, nty)
        tile_key, quantity_cols, n_is_k, n_bd_k, n_dr_k = _enumerate_slots(
            means2d, conics, colors, opacities, depths, radii, gauss_f32,
            width, height, ts, max_t, class_budgets, ntx, T,
            row_lo=lo, row_hi=hi)
        n_isect = n_isect + n_is_k
        n_budget_dropped = n_budget_dropped + n_bd_k
        n_dropped = n_dropped + n_dr_k
        sorted_ops = jax.lax.sort((tile_key,) + quantity_cols, num_keys=2)
        # Band k holds tiles [lo*ntx, hi*ntx); sentinels carry T > hi*ntx
        # (for the last band the hi*ntx == T query still lands at the
        # sentinel run's start), so band-local searchsorted gives exact
        # per-tile starts/counts.
        query = jnp.arange(lo * ntx, hi * ntx + 1, dtype=jnp.int32)
        ss = jnp.searchsorted(sorted_ops[0], query).astype(jnp.int32)
        starts_parts.append(ss[:-1] + off)
        counts_parts.append(ss[1:] - ss[:-1])
        streams.append(sorted_ops)
        off += tile_key.shape[0]

    tile_starts = jnp.concatenate(
        starts_parts + [jnp.full((1,), off, jnp.int32)])
    counts = jnp.concatenate(counts_parts)
    chunks_per_tile = cdiv(counts, chunk)
    padded_starts = (
        chunk * (jnp.cumsum(chunks_per_tile) - chunks_per_tile)
    ).astype(jnp.int32)

    # Concatenate the band streams row-wise, then pack (one bandwidth-bound
    # pass; the concat itself fuses into pack_soa's blocked reads).
    rows = []
    for qi in (2, 3, 4, 5, 6, 7, 8, 9, 10, 1, 11):
        # SoA row order: mx my ca cb cc op r g b depth gid; sorted_ops is
        # (key, depth, mx, my, ca, cb, cc, op, r, g, b, gid).
        rows.append(jnp.concatenate([s[qi] for s in streams]))
    soa = pack_soa(tuple(rows), pad=2 * chunk, interpret=interpret)
    return TileBinning(
        sorted_soa=soa,
        tile_starts=tile_starts,
        counts=counts,
        padded_starts=padded_starts,
        n_isect=n_isect,
        n_dropped=n_dropped,
        n_budget_dropped=n_budget_dropped,
        n_bucket_dropped=jnp.zeros((), jnp.int32),
    )


def _bucket_binned(tile_key, quantity_cols, T, M, chunk, B, headroom,
                   n_isect, n_dropped, n_budget_dropped, interpret):
    """Partition-then-batched-sort binning (see isect_and_sort docstring).

    tile % B interleaving: consecutive tile ids (adjacent in x) spread
    round-robin over buckets, so per-bucket loads track M/B closely on any
    real scene. Concatenated buckets are NOT in global tile order — they
    don't need to be: the kernels address segments through tile_starts,
    which the per-bucket searchsorted below computes in bucket-local
    coordinates plus the bucket offset."""
    from gaussian_splatting_tpu.ops.partition import partition_soa, quantum_for

    C = 512
    sent = float(T)
    # Partition input: row 0 = tile key, row 1 = depth (2nd sort key AND a
    # payload), rows 2..10 = quantities, row 11 = gid. quantity_cols order:
    # depth, mx, my, ca, cb, cc, op, r, g, b, gid. pack_rows pads the width
    # to a _PACK_C multiple with key = sent, which drop_key_above discards
    # in-kernel along with the budget-slack slots.
    rows = (tile_key.astype(jnp.float32),) + quantity_cols
    packed = pack_rows(rows, sentinel=sent, interpret=interpret)
    q = quantum_for(C, B, headroom)
    cap = (packed.shape[1] // C) * q
    out, counts_b, drops_b = partition_soa(
        packed, B, q, key_row=0, sentinel=sent,
        drop_key_above=sent, C=C, interpret=interpret)

    # B independent (tile, depth)-sorts in ONE batched lax.sort call; pad
    # columns carry key = T and sink to each bucket's tail.
    ops = tuple(out[r] for r in range(12))
    srt = jax.lax.sort(ops, num_keys=2, dimension=1)
    keys_s = srt[0]                                   # (B, cap)
    s_depth = srt[1]
    (s_mx, s_my, s_ca, s_cb, s_cc, s_op, s_r, s_g, s_b, s_gid) = srt[2:]

    # Per-bucket segment table: bucket k holds tiles {k, k+B, k+2B, ...};
    # query each tile's key (and T as the final count query — pads carry T).
    Tq = cdiv(T, B)
    karr = jnp.arange(B, dtype=jnp.int32)[:, None]
    jarr = jnp.arange(Tq + 1, dtype=jnp.int32)[None, :]
    queries = jnp.minimum(karr + jarr * B, T).astype(jnp.float32)  # (B, Tq+1)
    ss = jax.vmap(lambda a, q: jnp.searchsorted(a, q))(keys_s, queries)
    ss = ss.astype(jnp.int32)
    offs = karr * cap
    starts_g = ss[:, :-1] + offs                       # (B, Tq)
    counts_g = ss[:, 1:] - ss[:, :-1]
    # De-interleave to tile order: tile t = j*B + k <- [k, j].
    tile_starts = jnp.swapaxes(starts_g, 0, 1).reshape(-1)[:T]
    counts = jnp.swapaxes(counts_g, 0, 1).reshape(-1)[:T]
    tile_starts = jnp.concatenate(
        [tile_starts, jnp.full((1,), B * cap, jnp.int32)])

    chunks_per_tile = cdiv(counts, chunk)
    padded_starts = (
        chunk * (jnp.cumsum(chunks_per_tile) - chunks_per_tile)
    ).astype(jnp.int32)

    soa = pack_soa(
        (s_mx.reshape(-1), s_my.reshape(-1), s_ca.reshape(-1),
         s_cb.reshape(-1), s_cc.reshape(-1), s_op.reshape(-1),
         s_r.reshape(-1), s_g.reshape(-1), s_b.reshape(-1),
         s_depth.reshape(-1), s_gid.reshape(-1)),
        pad=2 * chunk, interpret=interpret)
    return TileBinning(
        sorted_soa=soa,
        tile_starts=tile_starts,
        counts=counts,
        padded_starts=padded_starts,
        n_isect=n_isect - jnp.sum(drops_b),
        n_dropped=n_dropped,
        n_budget_dropped=n_budget_dropped,
        n_bucket_dropped=jnp.sum(drops_b),
    )


def chunk_queue(counts: jnp.ndarray, chunk: int, w_cap: int):
    """Flat chunk work-queue for the rasterization kernels.

    The round-3 kernels swept each tile's chunks in an in-program
    ``while_loop``; measured on v5e (scratch/probe_kernel_r4.py [2]), the
    loop costs ~2.1 us/chunk while one-chunk-per-grid-step runs at
    ~1.2 us/chunk — the loop's data-dependent cond (a vector reduce ->
    scalar -> branch per chunk) stalls the pipeline, and Mosaic pipelines
    *grid steps* far better than loop iterations. So the kernels take a
    flat queue: work item w -> (tile, chunk-within-tile), tile-major, so
    consecutive steps hit the same revolving output block.

    Returns (wtile (w_cap,) int32, cum (T+1,) int32, n_work () int32):
    ``wtile[w]`` is the tile of work item w (clamped to T-1 for the pad
    tail past ``n_work``; pad steps are no-ops in-kernel), ``cum`` the
    exclusive chunk-count prefix over tiles (``ci = w - cum[wtile[w]]``).
    ``w_cap`` must upper-bound total chunks: cdiv-sum <= n_slots//chunk + T.
    Empty tiles never enter the queue — callers must zero their output
    blocks (the kernel's pad steps deliberately do not touch them).
    """
    T = counts.shape[0]
    chunks_per_tile = cdiv(counts, chunk)
    cum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(chunks_per_tile).astype(jnp.int32)])
    n_work = cum[T]
    w = jnp.arange(w_cap, dtype=jnp.int32)
    wtile = jnp.searchsorted(cum[1:], w, side="right").astype(jnp.int32)
    wtile = jnp.minimum(wtile, T - 1)
    return wtile, cum, n_work


def reduce_padded_grads(grad_soa: jnp.ndarray, n_gaussians: int,
                        n_written: jnp.ndarray, interpret=None,
                        with_depth: bool = True, sort_slices: int = 0):
    """Per-gaussian gradient reduction — sort-based, scatter-free.

    grad_soa: (16, pcap) backward-kernel output; row 0 carries the gaussian
    id of each entry (f32, exact), rows 1..10 the per-entry gradients
    [dmx, dmy, dA, dB, dC, dop, dr, dg, db, ddepth]. Entries past
    ``n_written`` are uninitialized; in-range pad entries carry id = N
    (sentinel) with zero grads. Returns a dict of (N,) arrays.

    Method: payload sort by id, then ONE Pallas sweep summing each id's run
    into its output column (``segsum.segment_sum_sorted``). Round 1 used
    cumsum + searchsorted + take here; the searchsorted alone cost more
    than the sort (see segsum.py).

    ``with_depth=False`` drops the ddepth payload from the sort (each sort
    operand costs ~4.3 ms at the 1M bench) and returns zero ddepth — valid
    whenever the caller guarantees the depth output has no cotangent (the
    photometric training step; see rasterize_tiled(depth_grad=False)).

    ``sort_slices = K > 1``: the reduce needs per-gaussian SUMS, not a
    global order — and sums are associative. Slice the stream into K
    static contiguous segments, sort each separately (``lax.sort`` cost is
    strongly superlinear in row length — K small sorts beat one big one;
    BENCH.md), segsum each slice, add the K (16, N) outputs. Exact (f32
    summation order changes, like any re-bucketing), drop-free (unlike the
    round-2 bucket-partition reduce, which this replaces), zero new
    kernels.
    """
    from gaussian_splatting_tpu.ops.segsum import segment_sum_sorted

    pcap = grad_soa.shape[1]
    n_pay = 10 if with_depth else 9
    K = max(int(sort_slices), 1)
    if pcap % K != 0:
        K = 1  # grad_cap not sliceable at this K; fall back to the flat sort
    m = pcap // K
    parts = []
    for i in range(K):
        pos_ok = jnp.arange(i * m, (i + 1) * m) < n_written
        sl = lambda r: jax.lax.slice_in_dim(grad_soa[r], i * m, (i + 1) * m)
        key = jnp.where(pos_ok, sl(0), float(n_gaussians))
        payloads = tuple(jnp.where(pos_ok, sl(r), 0.0)
                         for r in range(1, 1 + n_pay))
        sorted_ops = jax.lax.sort((key,) + payloads, num_keys=1)
        stacked = pack_rows(sorted_ops, sentinel=float(n_gaussians),
                            interpret=interpret)
        parts.append(segment_sum_sorted(stacked, n_gaussians,
                                        interpret=interpret))
    sums = parts[0] if K == 1 else sum(parts[1:], start=parts[0])
    return {
        "dmx": sums[1], "dmy": sums[2],
        "dca": sums[3], "dcb": sums[4], "dcc": sums[5],
        "dop": sums[6],
        "dr": sums[7], "dg": sums[8], "db": sums[9],
        "ddepth": sums[10] if with_depth
        else jnp.zeros((n_gaussians,), jnp.float32),
    }
