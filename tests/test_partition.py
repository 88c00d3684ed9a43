"""partition_soa (the quantum-scatter bucket partition) == numpy reference
(placement, counts, drops, sentinel/validity pad contract), and the
load-bearing integration property: partition + batched per-bucket sort ==
one flat sort."""

import numpy as np
import jax.numpy as jnp

from gaussian_splatting_tpu.ops.partition import partition_soa, quantum_for


def _np_qpartition(x, B, q, C, key_row, sentinels, n_valid=None,
                   drop_key_above=None, shift=0):
    """Reference for the quantum layout: chunk g's bucket-b entries land at
    columns [g*q, g*q + fill) in input order; pads carry the bucket
    sentinel on the key row, zero payload, and validity 0 on row 15."""
    M = x.shape[1]
    n_chunks = M // C
    cap = n_chunks * q
    out = np.zeros((16, B, cap), np.float32)
    for b in range(B):
        out[key_row, b, :] = sentinels[b]
    counts = np.zeros(B, np.int64)
    drops = np.zeros(B, np.int64)
    nv = M if n_valid is None else n_valid
    for g in range(n_chunks):
        fill = np.zeros(B, np.int64)
        for j in range(g * C, (g + 1) * C):
            if j >= nv:
                continue
            k = x[key_row, j]
            if drop_key_above is not None and k >= drop_key_above:
                continue
            b = (int(k) >> shift) & (B - 1)
            if fill[b] < q:
                col = g * q + fill[b]
                out[:15, b, col] = x[:15, j]
                out[15, b, col] = 1.0  # validity carrier replaces row 15
                fill[b] += 1
                counts[b] += 1
            else:
                drops[b] += 1
    return out, counts, drops


def _roundtrip(M, B, q, C, seed, key_max=997.0, n_valid=None,
               drop_key_above=None, shift=0, sentinels=None):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(16, M)).astype(np.float32)
    x[0, :] = rng.integers(0, int(key_max), size=M).astype(np.float32)
    if sentinels is None:
        sentinels = (float(key_max),) * B
    ref = _np_qpartition(x, B, q, C, 0, sentinels, n_valid=n_valid,
                         drop_key_above=drop_key_above, shift=shift)
    out, counts, drops = partition_soa(
        jnp.asarray(x), B, q, key_row=0, sentinel=sentinels, C=C,
        bucket_shift=shift, n_valid=n_valid, drop_key_above=drop_key_above,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(counts), ref[1])
    np.testing.assert_array_equal(np.asarray(drops), ref[2])
    np.testing.assert_array_equal(np.asarray(out), ref[0])


def test_partition_balanced():
    # q = 2x the balanced mean C/B: no per-chunk overflow at uniform keys
    _roundtrip(M=1024, B=4, q=64, C=128, seed=0)


def test_partition_overflow_counted():
    # geometric keys pile onto bucket 0; q = C/B leaves no headroom
    rng = np.random.default_rng(1)
    M, B, C, q = 1024, 8, 128, 16
    x = rng.normal(size=(16, M)).astype(np.float32)
    keys = np.minimum(rng.geometric(0.5, size=M) - 1, 500)
    x[0, :] = keys.astype(np.float32)
    sent = (1000.0,) * B
    ref = _np_qpartition(x, B, q, C, 0, sent)
    out, counts, drops = partition_soa(
        jnp.asarray(x), B, q, key_row=0, sentinel=sent, C=C, interpret=True)
    assert int(np.asarray(drops).sum()) > 0, "test must force overflow"
    np.testing.assert_array_equal(np.asarray(counts), ref[1])
    np.testing.assert_array_equal(np.asarray(drops), ref[2])
    np.testing.assert_array_equal(np.asarray(out), ref[0])


def test_partition_filters_and_per_bucket_sentinels():
    """n_valid prefix discard + drop_key_above sentinel discard + one
    sentinel per bucket (the gradient-reduce contract)."""
    B = 8
    _roundtrip(M=1024, B=B, q=32, C=128, seed=4, n_valid=900,
               drop_key_above=700.0,
               sentinels=tuple(10_000.0 + k for k in range(B)))


def test_partition_bucket_shift():
    """bucket_shift: bucket from the high bits of a combined key."""
    rng = np.random.default_rng(5)
    M, B, C, bits, q = 512, 4, 128, 4, 64
    tile = rng.integers(0, 32, size=M)
    sub = rng.integers(0, 1 << bits, size=M)
    x = rng.normal(size=(16, M)).astype(np.float32)
    x[0, :] = (tile << bits | sub).astype(np.float32)
    out, cnts, _ = partition_soa(
        jnp.asarray(x), B, q, bucket_shift=bits,
        key_row=0, sentinel=1e9, C=C, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(cnts), np.bincount(tile % B, minlength=B))
    for k in range(B):
        got = np.asarray(out[0, k])
        got = got[np.asarray(out[15, k]) > 0.5]
        want = x[0, tile % B == k]
        np.testing.assert_array_equal(got, want)


def test_quantum_for():
    assert quantum_for(512, 8, 1.5) == 96    # 8*96/512 = 1.5, 768 % 128 = 0
    assert quantum_for(512, 8, 1.15) == 80
    assert quantum_for(256, 8, 1.5) == 48
    assert quantum_for(512, 16, 1.5) == 48
    for C, B, h in ((512, 8, 1.3), (256, 8, 2.0), (128, 4, 1.5)):
        q = quantum_for(C, B, h)
        assert B * q >= h * C and (B * q) % 128 == 0


def test_partition_then_batched_sort_matches_flat_sort():
    """The intended use: partition by key-modulo buckets, per-bucket sort,
    de-interleave == one flat sort (keys unique so order is fully
    determined; pads sink to each bucket's tail)."""
    import jax

    rng = np.random.default_rng(3)
    M, B, C = 2048, 4, 128
    q = 2 * (C // B)  # 2x headroom: no drops for the modulo assignment
    keys = rng.permutation(M).astype(np.float32)  # unique
    x = rng.normal(size=(16, M)).astype(np.float32)
    x[0, :] = keys
    out, counts, drops = partition_soa(
        jnp.asarray(x), B, q, key_row=0,
        sentinel=float(M), C=C, interpret=True)
    assert int(np.asarray(drops).sum()) == 0
    assert int(np.asarray(counts).sum()) == M
    srt = jax.lax.sort(tuple(out[r] for r in range(16)), num_keys=1,
                       dimension=1)
    srt = np.stack([np.asarray(s) for s in srt])  # (16, B, cap)
    # bucket k holds keys {k, k+B, ...} sorted ascending; de-interleave
    got = np.concatenate([srt[:15, k, :int(counts[k])] for k in range(B)],
                         axis=1)
    want = np.asarray(x)[:15][:, np.argsort(keys)]
    order = np.argsort(got[0], kind="stable")
    np.testing.assert_array_equal(got[:, order], want)
