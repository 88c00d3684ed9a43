"""partition_soa == numpy stable bucket partition (order, counts, drops,
pad contract)."""

import numpy as np
import jax.numpy as jnp

from gaussian_splatting_tpu.ops.partition import partition_soa


def _np_partition(x, caps, bucket_row, key_row, sentinel):
    B = len(caps)
    M = x.shape[1]
    bid = np.clip(x[bucket_row].astype(np.int64), 0, B - 1)
    out = np.zeros((16, sum(caps)), np.float32)
    out[key_row, :] = sentinel
    counts = np.zeros(B, np.int64)
    drops = np.zeros(B, np.int64)
    off = np.concatenate([[0], np.cumsum(caps)])
    for j in range(M):
        b = bid[j]
        if counts[b] < caps[b]:
            out[:, off[b] + counts[b]] = x[:, j]
            counts[b] += 1
        else:
            drops[b] += 1
    return out, counts, drops


def _roundtrip(M, B, caps, C, seed, skew=None):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(16, M)).astype(np.float32)
    if skew is None:
        bid = rng.integers(0, B, size=M)
    else:
        bid = np.minimum(rng.geometric(skew, size=M) - 1, B - 1)
    x[15, :] = bid.astype(np.float32)
    sentinel = 1e9
    ref_out, ref_counts, ref_drops = _np_partition(x, caps, 15, 0, sentinel)
    out, counts, drops = partition_soa(
        jnp.asarray(x), caps, bucket_row=15, key_row=0, sentinel=sentinel,
        C=C, interpret=True)
    np.testing.assert_array_equal(np.asarray(counts), ref_counts)
    np.testing.assert_array_equal(np.asarray(drops), ref_drops)
    np.testing.assert_array_equal(np.asarray(out), ref_out)


def test_partition_balanced():
    # no overflow: generous equal caps
    _roundtrip(M=1024, B=4, caps=(512, 512, 512, 512), C=128, seed=0)


def test_partition_overflow_counted():
    # bucket 0 gets ~half the columns but capacity for only 128
    _roundtrip(M=1024, B=8, caps=(128,) * 8, C=128, seed=1, skew=0.5)


def test_partition_empty_and_full_buckets():
    rng = np.random.default_rng(2)
    M, B, C = 512, 4, 128
    x = rng.normal(size=(16, M)).astype(np.float32)
    x[15, :] = 2.0  # everything to bucket 2
    caps = (128, 128, 512, 128)
    ref = _np_partition(x, caps, 15, 0, -1.0)
    out, counts, drops = partition_soa(
        jnp.asarray(x), caps, bucket_row=15, key_row=0, sentinel=-1.0,
        C=C, interpret=True)
    np.testing.assert_array_equal(np.asarray(counts), ref[1])
    np.testing.assert_array_equal(np.asarray(out), ref[0])


def test_partition_bucket_mod_and_filters():
    """bucket_mod (in-kernel key-modulo buckets) + n_valid prefix discard +
    drop_key_above sentinel discard + per-bucket sentinels."""
    rng = np.random.default_rng(4)
    M, B, C = 1024, 8, 128
    n_valid = 900
    key_max = 700.0
    keys = rng.integers(0, 1000, size=M).astype(np.float32)
    x = rng.normal(size=(16, M)).astype(np.float32)
    x[0, :] = keys
    sentinels = tuple(10_000.0 + k for k in range(B))

    # numpy reference: keep prefix < n_valid AND key < key_max; bucket by
    # int(key) % B.
    ref = np.zeros((16, B * 256), np.float32)
    counts = np.zeros(B, np.int64)
    for k in range(B):
        ref[0, k * 256:(k + 1) * 256] = sentinels[k]
    for j in range(n_valid):
        if keys[j] >= key_max:
            continue
        b = int(keys[j]) % B
        ref[:, b * 256 + counts[b]] = x[:, j]
        counts[b] += 1

    out, cnts, drops = partition_soa(
        jnp.asarray(x), (256,) * B, bucket_mod=B, key_row=0,
        sentinel=sentinels, n_valid=jnp.int32(n_valid),
        drop_key_above=key_max, C=C, interpret=True)
    np.testing.assert_array_equal(np.asarray(cnts), counts)
    np.testing.assert_array_equal(np.asarray(drops), 0)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_partition_bucket_mod_shift():
    """bucket_shift: bucket from the high bits of a combined key."""
    rng = np.random.default_rng(5)
    M, B, C, bits = 512, 4, 128, 4
    tile = rng.integers(0, 32, size=M)
    sub = rng.integers(0, 1 << bits, size=M)
    keys = (tile << bits | sub).astype(np.float32)
    x = rng.normal(size=(16, M)).astype(np.float32)
    x[0, :] = keys
    ref_bid = tile % B
    out, cnts, _ = partition_soa(
        jnp.asarray(x), (256,) * B, bucket_mod=B, bucket_shift=bits,
        key_row=0, sentinel=1e9, C=C, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(cnts), np.bincount(ref_bid, minlength=B))
    for k in range(B):
        got = np.asarray(out[0, k * 256:k * 256 + int(cnts[k])])
        want = keys[ref_bid == k]
        np.testing.assert_array_equal(got, want)


def test_partition_then_batched_sort_matches_flat_sort():
    """The intended use: bucket by key-range, per-bucket sort, concat ==
    one flat sort (keys unique so order is fully determined)."""
    import jax

    rng = np.random.default_rng(3)
    M, B, C = 2048, 4, 128
    cap = 1024
    keys = rng.permutation(M).astype(np.float32)  # unique
    x = rng.normal(size=(16, M)).astype(np.float32)
    x[0, :] = keys
    x[15, :] = np.floor(keys / (M / B))          # range buckets
    out, counts, _ = partition_soa(
        jnp.asarray(x), (cap,) * B, bucket_row=15, key_row=0,
        sentinel=float(M), C=C, interpret=True)
    # per-bucket sort by key row (pads carry sentinel=M, sink to the end)
    bl = np.stack([np.asarray(out[:, k * cap:(k + 1) * cap]) for k in range(B)])
    srt = jax.vmap(lambda a: jax.lax.sort(tuple(a), num_keys=1))(
        jnp.asarray(bl))
    srt = np.concatenate([np.stack(
        [np.asarray(srt[r][k]) for r in range(16)]) for k in range(B)], axis=1)
    # strip pads: real columns are where key < M
    real = srt[0] < M
    got = srt[:, real]
    want = np.asarray(x)[:, np.argsort(keys)]
    np.testing.assert_array_equal(got, want)
