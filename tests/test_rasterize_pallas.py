"""Pallas tiled rasterizer vs the pure-JAX oracle: pixels and gradients.

Runs in Pallas interpret mode on CPU; the identical kernels compile for TPU
(validated separately by bench/parity scripts on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu.core.cameras import look_at, make_intrinsics
from gaussian_splatting_tpu.core.sh import rgb_to_sh0
from gaussian_splatting_tpu.ops.rasterize_ref import rasterize_reference
from gaussian_splatting_tpu.ops.rasterize_pallas import rasterize_tiled
from gaussian_splatting_tpu.ops.tiling import isect_and_sort
from gaussian_splatting_tpu.ops.render import render


def _screen_gaussians(rng, n, width, height, radius_scale=1.0, opacity_range=(0.2, 0.9)):
    means2d = rng.uniform([0, 0], [width, height], size=(n, 2))
    L = rng.normal(size=(n, 2, 2)) * 1.5 * radius_scale
    cov = L @ np.swapaxes(L, 1, 2) + np.eye(2)[None] * 1.0
    inv = np.linalg.inv(cov)
    conics = np.stack([inv[:, 0, 0], inv[:, 0, 1], inv[:, 1, 1]], axis=1)
    colors = rng.uniform(size=(n, 3))
    opac = rng.uniform(*opacity_range, size=(n,))
    depths = rng.uniform(1.0, 10.0, size=(n,))
    lam = np.linalg.eigvalsh(cov).max(axis=1)
    radii = np.ceil(3 * np.sqrt(lam)).astype(np.int32)
    return tuple(
        jnp.asarray(a, jnp.float32) if a.dtype != np.int32 else jnp.asarray(a)
        for a in (means2d, conics, colors, opac, depths, radii)
    )


def _brute_force_counts(means2d, conics, opac, radii, width, height, ts,
                        with_ellipse_cull=True):
    """Numpy mirror of the binning: clipped radius bbox, minus tiles the
    conservative ellipse cull proves below the 1/255 alpha gate."""
    ntx, nty = -(-width // ts), -(-height // ts)
    m = np.asarray(means2d, np.float64)
    c = np.asarray(conics, np.float64)
    o = np.asarray(opac, np.float64)
    r = np.asarray(radii).astype(float)
    counts = np.zeros((nty * ntx,), np.int64)
    for i in range(m.shape[0]):
        if r[i] <= 0 or o[i] < 1.0 / 255.0:
            continue
        tx0 = int(np.clip(np.floor((m[i, 0] - r[i]) / ts), 0, ntx))
        tx1 = int(np.clip(np.ceil((m[i, 0] + r[i]) / ts), 0, ntx))
        ty0 = int(np.clip(np.floor((m[i, 1] - r[i]) / ts), 0, nty))
        ty1 = int(np.clip(np.ceil((m[i, 1] + r[i]) / ts), 0, nty))
        ca, cb, cc = c[i]
        q = lambda x, y: ca * x * x + 2 * cb * x * y + cc * y * y
        for ty in range(ty0, ty1):
            for tx in range(tx0, tx1):
                if with_ellipse_cull:
                    dxl, dyl = tx * ts - m[i, 0], ty * ts - m[i, 1]
                    dxh, dyh = dxl + ts, dyl + ts
                    if dxl <= 0 <= dxh and dyl <= 0 <= dyh:
                        qmin = 0.0
                    else:
                        qmin = min(
                            q(dxl, np.clip(-cb * dxl / cc, dyl, dyh)),
                            q(dxh, np.clip(-cb * dxh / cc, dyl, dyh)),
                            q(np.clip(-cb * dyl / ca, dxl, dxh), dyl),
                            q(np.clip(-cb * dyh / ca, dxl, dxh), dyh))
                    if 0.5 * qmin > np.log(255.0 * max(o[i], 1e-12)) + 1e-3:
                        continue
                counts[ty * ntx + tx] += 1
    return counts


def test_isect_tiles_counts(rng):
    """Binning bookkeeping: segment counts match a brute-force check
    (radius bbox minus the exact conservative ellipse-tile cull)."""
    width, height, ts = 64, 48, 16
    args = _screen_gaussians(rng, 50, width, height)
    means2d, conics, colors, opac, depths, radii = args
    out = isect_and_sort(means2d, conics, colors, opac, depths, radii,
                        width, height, ts, chunk=128, max_tiles_per_gaussian=32)
    ntx, nty = 4, 3
    expected = _brute_force_counts(means2d, conics, opac, radii,
                                   width, height, ts)
    bbox = _brute_force_counts(means2d, conics, opac, radii,
                               width, height, ts, with_ellipse_cull=False)
    assert expected.sum() < bbox.sum()  # the cull actually removes tiles here
    np.testing.assert_array_equal(np.asarray(out.counts), expected)
    assert int(out.n_dropped) == 0
    assert int(out.n_isect) == expected.sum()
    # Gradient-buffer starts are chunk-aligned; segment starts consistent.
    assert (np.asarray(out.padded_starts) % 128 == 0).all()
    starts = np.asarray(out.tile_starts)
    np.testing.assert_array_equal(np.diff(starts), expected)
    # Depth order within each tile's segment.
    depths_sorted = np.asarray(out.sorted_soa[9])
    for t in range(nty * ntx):
        seg = depths_sorted[starts[t]:starts[t + 1]]
        assert (np.diff(seg) >= 0).all()


@pytest.mark.parametrize("shape", [(64, 48), (40, 24)])
def test_pallas_forward_matches_oracle(rng, shape):
    width, height = shape
    args = _screen_gaussians(rng, 70, width, height)
    ref = rasterize_reference(*args, width, height, tile_size=16)
    img, alpha, depth = rasterize_tiled(
        *args, width, height, tile_size=16, chunk=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref.image), atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha), atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth), atol=1e-4)


@pytest.mark.slow
def test_pallas_multichunk_and_early_stop(rng):
    """A dense opaque cluster forces multiple chunks per tile and hits the
    early-termination path."""
    width = height = 32
    n = 300
    means2d = jnp.asarray(
        np.concatenate([
            rng.uniform([4, 4], [28, 28], size=(n - 50, 2)),
            np.full((50, 2), 16.0) + rng.normal(size=(50, 2)),
        ]), jnp.float32)
    conics = jnp.tile(jnp.asarray([[0.3, 0.05, 0.4]], jnp.float32), (n, 1))
    colors = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    opac = jnp.asarray(
        np.concatenate([rng.uniform(0.3, 0.6, n - 50), np.full(50, 0.97)]), jnp.float32)
    depths = jnp.asarray(rng.uniform(1, 10, n), jnp.float32)
    radii = jnp.full((n,), 8, jnp.int32)
    args = (means2d, conics, colors, opac, depths, radii)

    binning = isect_and_sort(means2d, conics, colors, opac, depths, radii,
                            width, height, 16, chunk=128, max_tiles_per_gaussian=32)
    assert int(np.asarray(binning.counts).max()) > 128  # multi-chunk exercised

    ref = rasterize_reference(*args, width, height, tile_size=16)
    assert float(ref.alpha.max()) > 0.999  # early stop exercised
    img, alpha, depth = rasterize_tiled(
        *args, width, height, tile_size=16, chunk=128, interpret=True
    )
    # Pixels whose transmittance lands exactly at the 1e-4 early-stop
    # threshold can flip the discrete inclusion mask between the per-chunk
    # and global formulations (f32 rounding of exp-of-sums); tolerance covers
    # that boundary ambiguity.
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref.image), atol=1e-3)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha), atol=1e-3)


def test_pallas_gradients_match_oracle(rng):
    """Analytic Pallas backward == autodiff through the oracle, for all
    screen-space inputs (means2d, conics, colors, opacities) via a loss over
    image + alpha + depth."""
    width, height = 48, 32
    args = _screen_gaussians(rng, 60, width, height)
    means2d, conics, colors, opac, depths, radii = args
    timg = jnp.asarray(rng.uniform(size=(height, width, 3)), jnp.float32)

    def loss(fn, means2d, conics, colors, opac, depths):
        img, alpha, depth = fn(means2d, conics, colors, opac, depths)
        return (jnp.sum((img - timg) ** 2) + 0.3 * jnp.sum(alpha**2)
                + 0.05 * jnp.sum(depth**2))

    def f_ref(m, c, col, o, d):
        out = rasterize_reference(m, c, col, o, d, radii, width, height, tile_size=16)
        return out.image, out.alpha, out.depth

    def f_pal(m, c, col, o, d):
        return rasterize_tiled(m, c, col, o, d, radii, width, height,
                               tile_size=16, chunk=128, interpret=True)

    diff_args = (means2d, conics, colors, opac, depths)
    g_ref = jax.grad(lambda *a: loss(f_ref, *a), argnums=(0, 1, 2, 3, 4))(*diff_args)
    g_pal = jax.grad(lambda *a: loss(f_pal, *a), argnums=(0, 1, 2, 3, 4))(*diff_args)
    names = ["means2d", "conics", "colors", "opacities", "depths"]
    for name, gr, gp in zip(names, g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        assert np.isfinite(gp).all(), name
        scale = np.abs(gr).max() + 1e-8
        np.testing.assert_allclose(gp, gr, atol=2e-4 * scale, rtol=1e-3,
                                   err_msg=f"grad mismatch: {name}")


@pytest.mark.slow
def test_compact_binning_matches_dense(rng):
    """Compact footprint-class binning == dense slot layout, pixels AND
    gradients, when every class has enough budget."""
    width, height = 64, 48
    args = _screen_gaussians(rng, 80, width, height)
    from gaussian_splatting_tpu.ops.tiling import class_caps
    n = 80
    budgets = tuple(n for _ in class_caps(32))

    def f(mode_budgets, m, c, col, o, d):
        return rasterize_tiled(
            m, c, col, o, d, args[5], width, height, tile_size=16,
            chunk=128, max_tiles_per_gaussian=32,
            class_budgets=mode_budgets, interpret=True)

    m, c, col, o, d, _ = args
    img_d, alpha_d, dep_d = f(None, m, c, col, o, d)
    img_c, alpha_c, dep_c = f(budgets, m, c, col, o, d)
    np.testing.assert_allclose(np.asarray(img_c), np.asarray(img_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(alpha_c), np.asarray(alpha_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dep_c), np.asarray(dep_d), atol=1e-6)

    timg = jnp.asarray(rng.uniform(size=(height, width, 3)), jnp.float32)

    def loss(bud, *a):
        img, alpha, depth = f(bud, *a)
        return jnp.sum((img - timg) ** 2) + 0.3 * jnp.sum(alpha**2)

    g_d = jax.grad(lambda *a: loss(None, *a), argnums=(0, 1, 2, 3, 4))(m, c, col, o, d)
    g_c = jax.grad(lambda *a: loss(budgets, *a), argnums=(0, 1, 2, 3, 4))(m, c, col, o, d)
    for name, gd, gc in zip(["means2d", "conics", "colors", "opac", "depths"], g_d, g_c):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gd), atol=1e-6,
                                   err_msg=f"compact grad mismatch: {name}")


@pytest.mark.slow
def test_bucketed_sort_matches_flat(rng):
    """Partition-bucketed binning + sliced gradient reduce == the flat
    sorts: pixels bit-close, gradients allclose (summation grouping in the
    segsum windows differs, so exact equality is not required), both in
    dense and compact class-budget modes."""
    width, height = 64, 48
    args = _screen_gaussians(rng, 80, width, height)
    m, c, col, o, d, radii = args
    from gaussian_splatting_tpu.ops.tiling import class_caps
    budgets = tuple(80 for _ in class_caps(32))

    def f(buckets, cb, m, c, col, o, d):
        return rasterize_tiled(
            m, c, col, o, d, radii, width, height, tile_size=16,
            chunk=128, max_tiles_per_gaussian=32, class_budgets=cb,
            sort_buckets=buckets, bucket_headroom=1.5,
            reduce_slices=(4 if buckets else 0), interpret=True)

    for cb in (None, budgets):
        img_f, alpha_f, dep_f = f(0, cb, m, c, col, o, d)
        img_b, alpha_b, dep_b = f(4, cb, m, c, col, o, d)
        np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_f),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(alpha_b), np.asarray(alpha_f),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(dep_b), np.asarray(dep_f),
                                   atol=1e-6)

    timg = jnp.asarray(rng.uniform(size=(height, width, 3)), jnp.float32)

    def loss(buckets, *a):
        img, alpha, depth = f(buckets, budgets, *a)
        return (jnp.sum((img - timg) ** 2) + 0.3 * jnp.sum(alpha**2)
                + 0.05 * jnp.sum(depth**2))

    g_f = jax.grad(lambda *a: loss(0, *a), argnums=(0, 1, 2, 3, 4))(m, c, col, o, d)
    g_b = jax.grad(lambda *a: loss(4, *a), argnums=(0, 1, 2, 3, 4))(m, c, col, o, d)
    for name, gf, gb in zip(["means2d", "conics", "colors", "opac", "depths"],
                            g_f, g_b):
        scale = np.abs(np.asarray(gf)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gf),
                                   atol=1e-6 * scale, rtol=1e-5,
                                   err_msg=f"bucketed grad mismatch: {name}")


@pytest.mark.slow
def test_bucketed_binning_overflow_counted(rng):
    """Starved bucket capacities (headroom << 1) must drop intersections
    with an accounted stat, finite render, and exact occupancy reporting
    through rasterize_grad_meta."""
    from gaussian_splatting_tpu.ops.rasterize_pallas import rasterize_grad_meta

    width, height = 64, 48
    # Dense scene: enough intersections that a 512-entry bucket (the cap's
    # C-alignment floor) genuinely starves. Low opacity avoids early
    # termination dropping backward entries on its own.
    m, c, col, o, d, radii = _screen_gaussians(rng, 400, width, height,
                                               radius_scale=2.0,
                                               opacity_range=(0.05, 0.3))
    img, alpha, depth, stats = rasterize_tiled(
        m, c, col, o, d, radii, width, height, tile_size=16, chunk=128,
        max_tiles_per_gaussian=16, sort_buckets=2, bucket_headroom=0.05,
        interpret=True, with_stats=True)
    assert int(stats["n_budget_dropped"]) > 0   # bucket drops fold in here
    assert np.isfinite(np.asarray(img)).all()
    # Ample headroom: no drops, same stats keys as the flat path.
    *_, stats_ok = rasterize_tiled(
        m, c, col, o, d, radii, width, height, tile_size=16, chunk=128,
        max_tiles_per_gaussian=16, sort_buckets=2, bucket_headroom=2.0,
        interpret=True, with_stats=True)
    assert int(stats_ok["n_budget_dropped"]) == 0
    assert set(stats_ok) == {"n_isect", "n_dropped", "n_budget_dropped",
                             "n_grad_dropped"}
    # n_isect reports KEPT intersections: kept + dropped == the unstarved
    # total (the quantum partition drops per-chunk overflow, counted).
    assert (int(stats["n_isect"]) + int(stats["n_budget_dropped"])
            == int(stats_ok["n_isect"]))
    assert int(stats["n_isect"]) > 0
    # The probe reports reduce-bucket drops when the reduce is starved:
    # grad_buffer_frac shrinks grad_cap so each reduce bucket caps at C.
    nw, nd, gcap = rasterize_grad_meta(
        m, c, col, o, d, radii, width, height, tile_size=16, chunk=128,
        max_tiles_per_gaussian=16, sort_buckets=2, bucket_headroom=1.0,
        grad_buffer_frac=0.1, interpret=True)
    assert int(nd) > 0
    nw2, nd2, _ = rasterize_grad_meta(
        m, c, col, o, d, radii, width, height, tile_size=16, chunk=128,
        max_tiles_per_gaussian=16, sort_buckets=2, bucket_headroom=1.5,
        interpret=True)
    assert int(nd2) == 0 and int(nw2) > 0


@pytest.mark.slow
def test_compact_budget_overflow_counted(rng):
    """Tight class budgets drop whole gaussians — the drops must be counted
    in n_budget_dropped and the render must stay finite."""
    width, height = 64, 48
    m, c, col, o, d, radii = _screen_gaussians(rng, 60, width, height)
    from gaussian_splatting_tpu.ops.tiling import class_caps
    # Starve every class: budget 4 gaussians per class.
    budgets = tuple(4 for _ in class_caps(16))
    img, alpha, depth, stats = rasterize_tiled(
        m, c, col, o, d, radii, width, height, tile_size=16, chunk=128,
        max_tiles_per_gaussian=16, class_budgets=budgets,
        interpret=True, with_stats=True)
    assert int(stats["n_budget_dropped"]) > 0
    assert int(stats["n_isect"]) > 0
    assert np.isfinite(np.asarray(img)).all()
    # Dense mode on the same scene reports zero budget drops.
    *_, stats_d = rasterize_tiled(
        m, c, col, o, d, radii, width, height, tile_size=16, chunk=128,
        max_tiles_per_gaussian=16, interpret=True, with_stats=True)
    assert int(stats_d["n_budget_dropped"]) == 0
    assert int(stats_d["n_isect"]) >= int(stats["n_isect"])


def test_tile_cap_overflow_counted(rng):
    """A deliberately truncating max_tiles cap reports nonzero n_dropped
    (VERDICT round-1: these drops were invisible during training)."""
    width, height = 64, 48
    m, c, col, o, d, radii = _screen_gaussians(rng, 40, width, height,
                                               radius_scale=6.0)
    *_, stats = rasterize_tiled(
        m, c, col, o, d, radii, width, height, tile_size=16, chunk=128,
        max_tiles_per_gaussian=2, interpret=True, with_stats=True)
    assert int(stats["n_dropped"]) > 0
    assert set(stats) == {"n_isect", "n_dropped", "n_budget_dropped",
                          "n_grad_dropped"}


@pytest.mark.slow
def test_grad_cap_overflow_counted_and_survivable(rng):
    """Dense mode caps the gradient buffer at grad_cap_mult*N entries; a
    heavy-overlap scene (every splat covers most tiles, low opacity so no
    early termination) overflows it. The forward stats must report a
    nonzero n_grad_dropped bound, the backward kernel must drop (not
    corrupt) the overflow, and the pixels must be unaffected (the cap only
    exists on the gradient path)."""
    width, height = 64, 48
    m, c, col, o, d, radii = _screen_gaussians(
        rng, 30, width, height, radius_scale=20.0, opacity_range=(0.05, 0.12))

    def f(max_t):
        return rasterize_tiled(m, c, col, o, d, radii, width, height,
                               tile_size=16, chunk=128,
                               max_tiles_per_gaussian=max_t,
                               interpret=True, with_stats=True)

    img16, _, _, stats16 = f(16)   # grad cap = min(16N, 8N) = 8N
    # The scene must genuinely exceed the cap: ~12 tiles per splat.
    assert int(stats16["n_isect"]) > 8 * m.shape[0]
    assert int(stats16["n_grad_dropped"]) > 0

    def loss(max_t, *a):
        img, alpha, _, _ = rasterize_tiled(
            *a, radii, width, height, tile_size=16, chunk=128,
            max_tiles_per_gaussian=max_t, interpret=True, with_stats=True)
        return jnp.sum(img) + 0.3 * jnp.sum(alpha**2)

    g = jax.grad(lambda *a: loss(16, *a), argnums=(0, 1, 2, 3, 4))(
        m, c, col, o, d)
    for name, ga in zip(["means2d", "conics", "colors", "opac", "depths"], g):
        assert np.isfinite(np.asarray(ga)).all(), name

    # Pixels are identical with and without grad-buffer pressure: render
    # with max_t=8 halves n_slots (cap 8N -> no overflow on this scene is
    # NOT guaranteed, so compare against the oracle-checked f(16) pixels
    # via a bigger chunk instead — same forward math, different cap).
    img_big, _, _, stats_big = rasterize_tiled(
        m, c, col, o, d, radii, width, height, tile_size=16, chunk=256,
        max_tiles_per_gaussian=16, interpret=True, with_stats=True)
    np.testing.assert_allclose(np.asarray(img_big), np.asarray(img16),
                               atol=1e-5)


def test_quantized_depth_key(rng):
    """depth_bits packs (tile << bits | qdepth) into one int32 key. With
    well-separated depths the quantization can't reorder anything, so the
    render is bit-identical to the exact two-key sort; random depths stay
    visually equal."""
    width, height = 64, 48
    m, c, col, o, d, radii = _screen_gaussians(rng, 60, width, height)
    # Depths on a coarse grid: gaps >> range/2^16 -> identical order.
    d_sep = jnp.asarray((np.arange(60) % 16) * 0.5 + 1.0, jnp.float32)

    def f(depths, bits):
        return rasterize_tiled(m, c, col, o, depths, radii, width, height,
                               tile_size=16, chunk=128, depth_bits=bits,
                               interpret=True)

    img_e, alpha_e, _ = f(d_sep, 0)
    img_q, alpha_q, _ = f(d_sep, 16)
    np.testing.assert_array_equal(np.asarray(img_q), np.asarray(img_e))
    np.testing.assert_array_equal(np.asarray(alpha_q), np.asarray(alpha_e))

    img_e, *_ = f(d, 0)
    img_q, *_ = f(d, 16)
    np.testing.assert_allclose(np.asarray(img_q), np.asarray(img_e), atol=2e-3)


@pytest.mark.slow
def test_opacity_cull_is_exact(rng):
    """Gaussians with opacity < 1/255 are culled in binning; pixels and
    gradients must equal the oracle (whose alpha-skip gate zeroes them)."""
    width, height = 48, 32
    m, c, col, o, d, radii = _screen_gaussians(rng, 50, width, height)
    o = o.at[::3].set(1e-3)  # below the 1/255 gate
    timg = jnp.asarray(rng.uniform(size=(height, width, 3)), jnp.float32)

    def loss(fn, *a):
        img, alpha, _ = fn(*a)
        return jnp.sum((img - timg) ** 2) + 0.1 * jnp.sum(alpha**2)

    def f_ref(*a):
        out = rasterize_reference(*a, radii, width, height, tile_size=16)
        return out.image, out.alpha, out.depth

    def f_pal(*a):
        return rasterize_tiled(*a, radii, width, height, tile_size=16,
                               chunk=128, interpret=True)

    a = (m, c, col, o, d)
    np.testing.assert_allclose(float(loss(f_pal, *a)), float(loss(f_ref, *a)),
                               rtol=1e-5)
    g_ref = jax.grad(lambda *x: loss(f_ref, *x), argnums=(0, 3))(*a)
    g_pal = jax.grad(lambda *x: loss(f_pal, *x), argnums=(0, 3))(*a)
    for name, gr, gp in zip(["means2d", "opacities"], g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        scale = np.abs(gr).max() + 1e-8
        np.testing.assert_allclose(gp, gr, atol=2e-4 * scale, rtol=1e-3,
                                   err_msg=f"grad mismatch: {name}")
    # Culled gaussians get exactly zero opacity gradient.
    assert np.all(np.asarray(g_pal[1])[::3] == 0.0)


@pytest.mark.slow
def test_ellipse_cull_exact(rng):
    """The conservative ellipse-tile cull removes a large fraction of bbox
    tiles for anisotropic gaussians yet leaves pixels AND gradients equal to
    the (cull-free, per-pixel) oracle — the cull only drops tiles whose every
    pixel sits below the 1/255 alpha gate both renderers already apply."""
    width, height = 96, 64
    n = 40
    # Long thin gaussians at random orientations: circular radius bboxes
    # cover many tiles the ellipse never touches.
    means2d = jnp.asarray(rng.uniform([0, 0], [width, height], (n, 2)), jnp.float32)
    theta = rng.uniform(0, np.pi, n)
    s_long, s_short = rng.uniform(12, 25, n), rng.uniform(1.0, 2.5, n)
    R = np.stack([np.stack([np.cos(theta), -np.sin(theta)], -1),
                  np.stack([np.sin(theta), np.cos(theta)], -1)], -2)
    cov = R @ (np.stack([s_long, s_short], -1)[..., None]**2
               * np.eye(2)) @ np.swapaxes(R, 1, 2)
    inv = np.linalg.inv(cov)
    conics = jnp.asarray(
        np.stack([inv[:, 0, 0], inv[:, 0, 1], inv[:, 1, 1]], 1), jnp.float32)
    colors = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.9, n), jnp.float32)
    depths = jnp.asarray(rng.uniform(1, 10, n), jnp.float32)
    radii = jnp.asarray(np.ceil(3 * s_long), jnp.int32)

    counts = _brute_force_counts(means2d, conics, opac, radii, width, height, 16)
    bbox = _brute_force_counts(means2d, conics, opac, radii, width, height, 16,
                               with_ellipse_cull=False)
    assert counts.sum() < 0.75 * bbox.sum()  # the cull is doing real work

    args = (means2d, conics, colors, opac, depths)
    timg = jnp.asarray(rng.uniform(size=(height, width, 3)), jnp.float32)

    def loss(fn, *a):
        img, alpha, _ = fn(*a)
        return jnp.sum((img - timg) ** 2) + 0.1 * jnp.sum(alpha**2)

    def f_ref(*a):
        out = rasterize_reference(*a, radii, width, height, tile_size=16)
        return out.image, out.alpha, out.depth

    def f_pal(*a):
        return rasterize_tiled(*a, radii, width, height, tile_size=16,
                               chunk=128, max_tiles_per_gaussian=64,
                               interpret=True)

    np.testing.assert_allclose(float(loss(f_pal, *args)),
                               float(loss(f_ref, *args)), rtol=1e-5)
    g_ref = jax.grad(lambda *x: loss(f_ref, *x), argnums=(0, 1, 3))(*args)
    g_pal = jax.grad(lambda *x: loss(f_pal, *x), argnums=(0, 1, 3))(*args)
    for name, gr, gp in zip(["means2d", "conics", "opacities"], g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        scale = np.abs(gr).max() + 1e-8
        np.testing.assert_allclose(gp, gr, atol=2e-4 * scale, rtol=1e-3,
                                   err_msg=f"grad mismatch: {name}")


@pytest.mark.slow
def test_full_render_pallas_vs_ref_3d(rng):
    """End-to-end 3D: same camera/params through both backends, image + grads."""
    width = height = 32
    view = look_at(eye=(0.5, -0.3, -4.0), target=(0.0, 0.0, 0.0))
    K = make_intrinsics(width, height, focal_px=40.0)
    n = 40
    means = jnp.asarray(rng.normal(size=(n, 3)) * 0.8, jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    log_scales = jnp.asarray(np.log(rng.uniform(0.1, 0.4, size=(n, 3))), jnp.float32)
    logit_op = jnp.asarray(rng.normal(size=(n, 1)), jnp.float32)
    sh = jnp.concatenate([
        rgb_to_sh0(jnp.asarray(rng.uniform(size=(n, 1, 3)), jnp.float32)),
        jnp.asarray(rng.normal(size=(n, 15, 3)) * 0.05, jnp.float32)], axis=1)
    timg = jnp.asarray(rng.uniform(size=(height, width, 3)), jnp.float32)

    def loss(backend, *params):
        out = render(*params, view, K, width, height, sh_degree=3,
                     backend=backend, tile_size=16)
        return jnp.mean((out.render - timg) ** 2)

    params = (means, quats, log_scales, logit_op, sh)
    l_ref = float(loss("ref", *params))
    l_pal = float(loss("pallas", *params))
    np.testing.assert_allclose(l_pal, l_ref, rtol=1e-5)

    g_ref = jax.grad(lambda *p: loss("ref", *p), argnums=(0, 1, 2, 3, 4))(*params)
    g_pal = jax.grad(lambda *p: loss("pallas", *p), argnums=(0, 1, 2, 3, 4))(*params)
    for name, gr, gp in zip(["means", "quats", "scales", "opac", "sh"], g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        scale = np.abs(gr).max() + 1e-8
        np.testing.assert_allclose(gp, gr, atol=3e-4 * scale, rtol=2e-3,
                                   err_msg=f"grad mismatch: {name}")


def test_squeeze_budgets_under_pow2():
    from gaussian_splatting_tpu.ops.tiling import squeeze_budgets_under_pow2

    caps = (1, 2, 4)
    # Total 1100*1 + 600*2 + 500*4 = 4300, pow2 floor 4096: 4.7% trim -> in.
    budgets = (1152, 640, 512)   # 4480 slots
    hard = (1024, 512, 384)      # 3584 slots
    out = squeeze_budgets_under_pow2(budgets, hard, caps)
    assert sum(b * c for b, c in zip(out, caps)) <= 4096
    assert all(o >= h for o, h in zip(out, hard))
    assert all(o <= b for o, b in zip(out, budgets))

    # Hard minimum above the boundary -> unchanged.
    hard_big = (1152, 640, 512)
    out2 = squeeze_budgets_under_pow2(budgets, hard_big, caps)
    assert out2 == budgets

    # Trim larger than max_trim -> unchanged.
    budgets3 = (2048, 1024, 1024)  # 8192... exactly pow2 -> unchanged
    out3 = squeeze_budgets_under_pow2(budgets3, (0, 0, 0), caps)
    assert out3 == budgets3
    budgets4 = (2048, 1536, 1280)  # 10240, pow2lo 8192: 20% trim > 10% cap
    out4 = squeeze_budgets_under_pow2(budgets4, (0, 0, 0), caps)
    assert out4 == budgets4


@pytest.mark.slow
def test_grad_buffer_frac_exact_and_starved(rng):
    """grad_buffer_frac < 1 shrinks the gradient buffer (and with it the
    reduce sort). (a) With enough headroom for the measured occupancy the
    gradients are bit-identical to the exact buffer and the occupancy probe
    reports zero drops; (b) starved, the probe reports drops and the
    gradients stay finite (drops are counted, never corrupting)."""
    from gaussian_splatting_tpu.ops.rasterize_pallas import rasterize_grad_meta

    width, height = 64, 48
    m, c, col, o, d, radii = _screen_gaussians(
        rng, 200, width, height, radius_scale=4.0, opacity_range=(0.05, 0.15))

    def loss(frac, *a):
        img, alpha, depth = rasterize_tiled(
            *a, radii, width, height, tile_size=16, chunk=128,
            grad_buffer_frac=frac, interpret=True)
        return (jnp.sum(img) + 0.3 * jnp.sum(alpha ** 2)
                + 0.05 * jnp.sum(depth ** 2))

    nw, nd, cap = rasterize_grad_meta(
        m, c, col, o, d, radii, width, height, tile_size=16, chunk=128,
        interpret=True)
    assert int(nd) == 0 and int(nw) > 300  # heavy-overlap scene, no drops
    g1 = jax.grad(lambda *a: loss(1.0, *a), argnums=(0, 1, 2, 3, 4))(
        m, c, col, o, d)

    bound_exact = min(200 * 16, 8 * 200)
    frac_fit = min(1.0, (int(nw) + 3 * 128) / bound_exact)
    assert frac_fit < 1.0  # the shrunk path is actually exercised
    nw2, nd2, cap2 = rasterize_grad_meta(
        m, c, col, o, d, radii, width, height, tile_size=16, chunk=128,
        grad_buffer_frac=frac_fit, interpret=True)
    assert int(cap2) < int(cap) and int(nd2) == 0 and int(nw2) == int(nw)
    g2 = jax.grad(lambda *a: loss(frac_fit, *a), argnums=(0, 1, 2, 3, 4))(
        m, c, col, o, d)
    for name, a1, a2 in zip(["means2d", "conics", "colors", "opac", "depths"],
                            g1, g2):
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2),
                                      err_msg=f"shrunk-buffer grad: {name}")

    # Starved: the minimum buffer (one chunk + sentinel pad) must drop.
    nw3, nd3, _ = rasterize_grad_meta(
        m, c, col, o, d, radii, width, height, tile_size=16, chunk=128,
        grad_buffer_frac=1e-6, interpret=True)
    assert int(nd3) > 0
    g3 = jax.grad(lambda *a: loss(1e-6, *a), argnums=(0, 1, 2, 3, 4))(
        m, c, col, o, d)
    for name, a3 in zip(["means2d", "conics", "colors", "opac", "depths"], g3):
        assert np.isfinite(np.asarray(a3)).all(), name


def test_chunk_queue_construction():
    """tiling.chunk_queue: tile-major work items, empty tiles skipped,
    clamped pad tail."""
    from gaussian_splatting_tpu.ops.tiling import chunk_queue

    counts = jnp.asarray([300, 0, 256, 1, 0], jnp.int32)  # chunks: 2,0,1,1,0
    wtile, cum, n_work = chunk_queue(counts, 256, w_cap=8)
    assert int(n_work) == 4
    np.testing.assert_array_equal(np.asarray(cum), [0, 2, 2, 3, 4, 4])
    # Work items: tile 0 x2, tile 2, tile 3; pad tail clamps to T-1.
    np.testing.assert_array_equal(np.asarray(wtile),
                                  [0, 0, 2, 3, 4, 4, 4, 4])
    # ci recovery: w - cum[wtile[w]] for real items.
    ws = np.arange(4)
    ci = ws - np.asarray(cum)[np.asarray(wtile)[:4]]
    np.testing.assert_array_equal(ci, [0, 1, 0, 0])

    # All-empty: n_work == 0, everything clamps.
    wtile0, cum0, n0 = chunk_queue(jnp.zeros((3,), jnp.int32), 256, w_cap=4)
    assert int(n0) == 0
    np.testing.assert_array_equal(np.asarray(wtile0), [2, 2, 2, 2])


def test_queue_modes_bit_identical(rng):
    """The flat-queue kernels (default) against the round-3 while-loop
    kernels and the direct-DMA queue variant: forward AND gradients must be
    bit-identical — three lowerings of one algorithm (probe-backed on
    hardware too; scratch/probe_queue_r4.py)."""
    width = height = 48
    args = _screen_gaussians(rng, 120, width, height)
    radii = args[5]

    def run(queue, direct):
        def loss(*a):
            img, alpha, depth = rasterize_tiled(
                *a, radii, width, height, tile_size=16, chunk=128,
                interpret=True, queue=queue, direct_dma=direct)
            return jnp.sum(img * img) + jnp.sum(alpha), img
        (l, img), g = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True)(*args[:5])
        return float(l), np.asarray(img), [np.asarray(x) for x in g]

    l_loop, img_loop, g_loop = run(False, False)
    for queue, direct in ((True, False), (True, True)):
        l, img, g = run(queue, direct)
        assert l == l_loop
        np.testing.assert_array_equal(img, img_loop)
        for a, b in zip(g, g_loop):
            np.testing.assert_array_equal(a, b)


def test_band_sort_matches_flat(rng):
    """Band-split binning (sort_bands=K) == the flat sort: per-tile entry
    multisets identical (n_isect equal), pixels bit-close, gradients
    allclose. Uneven division (nty % K != 0) covered."""
    width, height = 64, 80  # nty = 5 tile rows -> bands of 3 + 2
    args = _screen_gaussians(rng, 90, width, height)
    m, c, col, o, d, radii = args
    from gaussian_splatting_tpu.ops.tiling import class_caps
    budgets = tuple(90 for _ in class_caps(32))

    def f(bands, cb, m, c, col, o, d):
        return rasterize_tiled(
            m, c, col, o, d, radii, width, height, tile_size=16,
            chunk=128, max_tiles_per_gaussian=32, class_budgets=cb,
            sort_bands=bands, interpret=True)

    for cb in (None, budgets):
        img_f, alpha_f, dep_f = f(0, cb, m, c, col, o, d)
        for K in (2, 3, 5):
            img_b, alpha_b, dep_b = f(K, cb, m, c, col, o, d)
            np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_f),
                                       atol=1e-6, err_msg=f"K={K} cb={cb is not None}")
            np.testing.assert_allclose(np.asarray(alpha_b),
                                       np.asarray(alpha_f), atol=1e-6)
            np.testing.assert_allclose(np.asarray(dep_b), np.asarray(dep_f),
                                       atol=1e-6)

    # Binning-level parity: identical per-tile counts and intersection total.
    b_flat = isect_and_sort(m, c, col, o, d, radii, width, height, 16, 128,
                            32, class_budgets=budgets, interpret=True)
    b_band = isect_and_sort(m, c, col, o, d, radii, width, height, 16, 128,
                            32, class_budgets=budgets, sort_bands=3,
                            interpret=True)
    assert int(b_flat.n_isect) == int(b_band.n_isect) > 0
    np.testing.assert_array_equal(np.asarray(b_flat.counts),
                                  np.asarray(b_band.counts))

    timg = jnp.asarray(rng.uniform(size=(height, width, 3)), jnp.float32)

    def loss(bands, *a):
        img, alpha, depth = f(bands, budgets, *a)
        return (jnp.sum((img - timg) ** 2) + 0.3 * jnp.sum(alpha**2)
                + 0.05 * jnp.sum(depth**2))

    g_f = jax.grad(lambda *a: loss(0, *a), argnums=(0, 1, 2, 3, 4))(m, c, col, o, d)
    g_b = jax.grad(lambda *a: loss(3, *a), argnums=(0, 1, 2, 3, 4))(m, c, col, o, d)
    for name, gf, gb in zip(["means2d", "conics", "colors", "opac", "depths"],
                            g_f, g_b):
        scale = np.abs(np.asarray(gf)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gf),
                                   atol=1e-6 * scale, rtol=1e-5,
                                   err_msg=f"band grad mismatch: {name}")
