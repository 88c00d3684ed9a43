"""Sort-based gradient reduction vs direct per-gaussian summation, including
the f32 cumsum-difference precision at realistic sizes.

Gradient-stream layout (backward kernel contract): row 0 = gaussian id
(the sort key), rows 1..10 = per-entry gradients."""

import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu.ops.tiling import reduce_padded_grads


def _grad_stream(rng, N, pcap, n_written, wide=True):
    ids = rng.integers(0, N, size=(pcap,)).astype(np.float32)
    grads = np.zeros((16, pcap), np.float32)
    mag = (np.exp(rng.normal(size=(pcap,)) * 2).astype(np.float32)
           if wide else 1.0)
    grads[1:11] = rng.normal(size=(10, pcap)).astype(np.float32) * mag
    grads[0] = ids
    # Junk (NaN) past n_written must not leak.
    grads[1:11, n_written:] = np.nan
    grads[0, n_written:] = float(N + 11.0)
    return ids, grads


KEYS = ["dmx", "dmy", "dca", "dcb", "dcc", "dop", "dr", "dg", "db", "ddepth"]


@pytest.mark.parametrize("slices", [0, 4])
def test_reduce_matches_direct_sum(rng, slices):
    N, pcap = 2000, 100_096  # 256-aligned width, like the kernel's grad_cap
    n_written = 80_000
    ids, grads = _grad_stream(rng, N, pcap, n_written)

    out = reduce_padded_grads(jnp.asarray(grads), N, jnp.int32(n_written),
                              sort_slices=slices)

    direct = np.zeros((10, N), np.float64)
    for q in range(10):
        np.add.at(direct[q], ids[:n_written].astype(int),
                  grads[1 + q, :n_written].astype(np.float64))

    for q, k in enumerate(KEYS):
        got = np.asarray(out[k])
        assert np.isfinite(got).all(), k
        scale = np.abs(grads[1 + q, :n_written]).sum() + 1e-6
        np.testing.assert_allclose(got, direct[q], atol=3e-6 * scale,
                                   rtol=1e-4, err_msg=k)


def test_reduce_sliced_matches_flat(rng):
    """The sliced reduce (per-slice sorts + segsums, summed) == the flat
    reduce, to f32 summation-order tolerance. Slicing is drop-free: every
    entry lands in exactly one static slice."""
    N, pcap = 1000, 50_176
    n_written = 40_000
    _, grads = _grad_stream(rng, N, pcap, n_written, wide=False)
    flat = reduce_padded_grads(jnp.asarray(grads), N, jnp.int32(n_written))
    for K in (7, 8):  # 7 does not divide pcap -> exercises the K=1 fallback
        sliced = reduce_padded_grads(jnp.asarray(grads), N,
                                     jnp.int32(n_written), sort_slices=K)
        for k in KEYS:
            np.testing.assert_allclose(np.asarray(sliced[k]),
                                       np.asarray(flat[k]),
                                       atol=1e-4, rtol=1e-5, err_msg=k)


def test_reduce_without_depth_payload(rng):
    """with_depth=False (the photometric training step, which never
    differentiates the depth channel) must reproduce every non-depth sum
    bit-for-bit — the dropped sort payload cannot perturb the others — and
    return exactly zero ddepth."""
    N, pcap = 500, 19_968
    n_written = 18_000
    _, grads = _grad_stream(rng, N, pcap, n_written, wide=False)

    full = reduce_padded_grads(jnp.asarray(grads), N, jnp.int32(n_written))
    slim = reduce_padded_grads(jnp.asarray(grads), N, jnp.int32(n_written),
                               with_depth=False)
    for k in KEYS[:9]:
        np.testing.assert_array_equal(np.asarray(full[k]),
                                      np.asarray(slim[k]), err_msg=k)
    assert (np.asarray(slim["ddepth"]) == 0).all()


@pytest.mark.slow
def test_rasterize_depth_grad_flag(rng):
    """rasterize_tiled(depth_grad=False): identical non-depth gradients to
    the default path, zero d_depths — valid because the test loss (like the
    training loss) never reads the depth output."""
    import jax

    from gaussian_splatting_tpu.ops.rasterize_pallas import rasterize_tiled

    N, W, H = 200, 64, 64
    means2d = jnp.asarray(rng.uniform([0, 0], [W, H], size=(N, 2)), jnp.float32)
    conics = jnp.asarray(
        np.stack([np.full(N, 0.15), np.zeros(N), np.full(N, 0.15)], 1),
        jnp.float32)
    colors = jnp.asarray(rng.uniform(size=(N, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, size=(N,)), jnp.float32)
    depths = jnp.asarray(rng.uniform(1, 10, size=(N,)), jnp.float32)
    radii = jnp.full((N,), 8, jnp.int32)

    def loss(m, c, col, o, d, depth_grad):
        img, alpha, _ = rasterize_tiled(m, c, col, o, d, radii, W, H,
                                        depth_grad=depth_grad)
        return jnp.sum(img * img) + jnp.sum(alpha)

    g_full = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        means2d, conics, colors, opac, depths, True)
    g_slim = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        means2d, conics, colors, opac, depths, False)
    for a, b, name in zip(g_full, g_slim,
                          ["means2d", "conics", "colors", "opac", "depths"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    assert (np.asarray(g_slim[4]) == 0).all()


def test_reduce_empty_segments(rng):
    """Gaussians with no entries get exactly zero gradients."""
    N, pcap = 100, 4096
    ids = np.full((pcap,), 7.0, np.float32)  # all entries -> gaussian 7
    grads = np.zeros((16, pcap), np.float32)
    grads[1] = 1.0
    grads[0] = ids
    out = reduce_padded_grads(jnp.asarray(grads), N, jnp.int32(pcap))
    dmx = np.asarray(out["dmx"])
    assert dmx[7] == 4096.0
    assert (np.delete(dmx, 7) == 0).all()
