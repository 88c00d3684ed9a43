"""Scatter-free per-gaussian gradient reduction as Pallas kernels.

Round 1 reduced the backward kernel's per-entry gradients to per-gaussian
sums with a full payload ``lax.sort`` by gaussian id + segmented cumsum —
~150 ms at the 1M-gaussian benchmark (the sort is bitonic and pays ~14 ns
per pow2-padded entry; reference counterpart: the atomics in gsplat's CUDA
backward, call site ``gsplat_backend.py:83-97``). But a reduction does not
need a sort. This module does it in two passes, both TPU-native:

1. BUCKET pass: entries are routed into ~R-gaussian-id-range buckets
   (R = 4096). A per-block digit histogram (dense compares, no scatter)
   plus a tiny XLA exclusive scan gives every (block, bucket) run an
   8-aligned destination; inside the kernel each 256-entry chunk is grouped
   by bucket with ONE MXU matmul against a rank-built one-hot permutation
   matrix (the systolic array is the "scatter" engine), and each run leaves
   as one contiguous DMA. Run padding carries neighboring-run entries whose
   gaussian ids fall outside the bucket's range — they self-identify and
   are masked in pass 2, so no sentinel fills are needed.
2. REDUCE pass: per bucket, accumulate a (10, R) partial-sum tile as
   chunked MXU matmuls ``grads (10, C) @ onehot(local_gid) (C, R)`` and
   write it straight into the (10, N) output block — aligned, scatter-free,
   and with no searchsorted/cumsum epilogue at all.

Entry positions >= n_written hold uninitialized memory; both passes route
them (and any non-finite ids) to a trash bucket that pass 2 never reads.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_splatting_tpu.ops.tiling import cdiv

ROWS = 16
GID_ROW = 11
RANGE = 4096          # gaussian ids per bucket (pass-2 matmul width)
RUN_ALIGN = 8         # lane alignment of (block, bucket) runs
N_GRAD = 10           # gradient rows reduced per entry


def _bucket_of(gid, pos_ok, n_buckets):
    """Bucket index of each entry; trash bucket for masked/garbage slots."""
    ok = pos_ok & (gid >= 0.0) & (gid < jnp.float32(n_buckets * RANGE))
    b = jnp.floor(gid * (1.0 / RANGE))
    return jnp.where(ok, b, jnp.float32(n_buckets)).astype(jnp.int32)


def _count_kernel(soa_ref, counts_ref, *, block_s, n_buckets, n_written_static):
    """Histogram of bucket ids for one S-entry block (dense compares)."""
    j = pl.program_id(0)
    gid = soa_ref[0, :]                                   # (S,)
    pos = j * block_s + jax.lax.broadcasted_iota(
        jnp.int32, (block_s,), 0)
    b = _bucket_of(gid, pos < n_written_static, n_buckets)  # (S,)
    # (B+1, S) one-hot -> row sums. B+1 <= a few hundred rows.
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_buckets + 1, block_s), 0)
    counts_ref[0, :] = jnp.sum((b[None, :] == rows).astype(jnp.int32), axis=1)


def _scatter_kernel(bases_ref, nw_ref, soa_hbm, out_hbm, vin, vout, sem_in,
                    sem_out, *, block_s, chunk, n_buckets):
    """Group one block by bucket (MXU permutation per chunk) and DMA each
    (block, bucket) run to its 8-aligned destination."""
    j = pl.program_id(0)
    base_off = j * block_s
    n_chunks = block_s // chunk
    nw = nw_ref[0]

    cp = pltpu.make_async_copy(
        soa_hbm.at[:, pl.ds(base_off, block_s)], vin, sem_in)
    cp.start()
    cp.wait()

    lanes_c = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    iota_cc = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)

    def chunk_body(c, cursors):
        # cursors: (n_buckets+1, 1) int32 — next free slot per bucket,
        # relative to nothing (absolute HBM positions).
        data = vin[:, pl.ds(c * chunk, chunk)]            # (16, C)
        pos = base_off + c * chunk + lanes_c              # (1, C)
        gid = data[GID_ROW:GID_ROW + 1, :]
        b = _bucket_of(gid, pos < nw, n_buckets)          # (1, C)

        rows = jax.lax.broadcasted_iota(
            jnp.int32, (n_buckets + 1, chunk), 0)
        onehot = (b == rows).astype(jnp.float32)          # (B+1, C)
        ranks_incl = _cumsum_lanes(onehot, chunk)         # (B+1, C)
        cnt = ranks_incl[:, chunk - 1:chunk]              # (B+1, 1)

        # Chunk-local destination: bucket-major packing within the chunk.
        base_excl = _cumsum_rows_exclusive(cnt)           # (B+1, 1)
        rank = jnp.sum(onehot * (ranks_incl - 1.0), axis=0, keepdims=True)
        cbase = jnp.sum(onehot * base_excl, axis=0, keepdims=True)
        dest = (rank + cbase).astype(jnp.int32)           # (1, C)

        P = (dest.reshape(chunk, 1) == iota_cc).astype(jnp.float32)
        grouped = jax.lax.dot_general(
            data, P, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (16, C)
        vout[:, :chunk] = grouped

        # DMA each bucket's run to cursors[b]; runs start 8-aligned because
        # every cursor advances by a multiple of 8 (padded run length).
        cnt_i = cnt.astype(jnp.int32)
        base_i = base_excl.astype(jnp.int32)

        def dma_bucket(bb, _):
            length = cnt_i[bb, 0]

            @pl.when(length > 0)
            def _():
                src = base_i[bb, 0]
                dst = cursors[bb, 0]
                # Padded length: overshoot copies neighboring-run entries
                # whose gids fall outside bucket bb — masked in pass 2.
                plen = ((length + RUN_ALIGN - 1) // RUN_ALIGN) * RUN_ALIGN
                cp2 = pltpu.make_async_copy(
                    vout.at[:, pl.ds(src, chunk)],
                    out_hbm.at[:, pl.ds(pl.multiple_of(dst, RUN_ALIGN),
                                        chunk)],
                    sem_out)
                del plen  # fixed-size chunk DMA; tail masked in pass 2
                cp2.start()
                cp2.wait()
            return 0

        jax.lax.fori_loop(0, n_buckets + 1, dma_bucket, 0)
        pad = ((cnt_i + RUN_ALIGN - 1) // RUN_ALIGN) * RUN_ALIGN
        return cursors + pad

    init = bases_ref[j]                                    # (B+1,) int32
    jax.lax.fori_loop(0, n_chunks, chunk_body, init.reshape(-1, 1))
