"""Sort-based gradient reduction vs direct per-gaussian summation, including
the f32 cumsum-difference precision at realistic sizes."""

import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.ops.tiling import reduce_padded_grads


def test_reduce_matches_direct_sum(rng):
    N, pcap = 2000, 100_000
    n_written = 80_000
    ids = rng.integers(0, N, size=(pcap,)).astype(np.float32)
    grads = np.zeros((16, pcap), np.float32)
    grads[:10] = rng.normal(size=(10, pcap)).astype(np.float32) * \
        np.exp(rng.normal(size=(pcap,)) * 2).astype(np.float32)  # wide dynamic range
    grads[11] = ids
    # Junk (NaN) past n_written must not leak.
    grads[:10, n_written:] = np.nan
    grads[11, n_written:] = 12345.0

    out = reduce_padded_grads(jnp.asarray(grads), N, jnp.int32(n_written))

    direct = np.zeros((10, N), np.float64)
    for q in range(10):
        np.add.at(direct[q], ids[:n_written].astype(int), grads[q, :n_written].astype(np.float64))

    keys = ["dmx", "dmy", "dca", "dcb", "dcc", "dop", "dr", "dg", "db", "ddepth"]
    for q, k in enumerate(keys):
        got = np.asarray(out[k])
        assert np.isfinite(got).all(), k
        scale = np.abs(grads[q, :n_written]).sum() + 1e-6  # cumsum magnitude bound
        np.testing.assert_allclose(got, direct[q], atol=3e-6 * scale, rtol=1e-4,
                                   err_msg=k)


def test_reduce_empty_segments(rng):
    """Gaussians with no entries get exactly zero gradients."""
    N, pcap = 100, 4096
    ids = np.full((pcap,), 7.0, np.float32)  # all entries -> gaussian 7
    grads = np.zeros((16, pcap), np.float32)
    grads[0] = 1.0
    grads[11] = ids
    out = reduce_padded_grads(jnp.asarray(grads), N, jnp.int32(pcap))
    dmx = np.asarray(out["dmx"])
    assert dmx[7] == 4096.0
    assert (np.delete(dmx, 7) == 0).all()
