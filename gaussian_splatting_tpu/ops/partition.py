"""Pallas bucket-partition: the TPU-native "radix scatter" primitive.

Splits a (16, M) column-SoA into B buckets by a per-column bucket id
derived from the sort key, with static per-bucket capacities and counted
(never silent) overflow. This is the primitive a CUDA pipeline gets from
radix-sort scatter passes and that XLA:TPU has no fast equivalent for
(large scatters measured ~40M elem/s, tiling.py).

Why it exists: ``lax.sort`` cost on TPU is strongly superlinear in row
length (measured: 12-operand sorts run ~2 ns/entry at M <= 1M but
~10 ns/entry at M >= 4M — BENCH.md). Binning only needs per-TILE order
and the gradient reduce only needs per-GAUSSIAN runs, so a cheap B-way
split by tile/gid lets the big sort run as a BATCHED (B, M/B) sort at
the small-row rate. The reference counterpart is the radix binning
inside gsplat's CUDA rasterizer (gsplat_backend.py:83-97).

Method — the "quantum scatter" layout. Every (16, C) input chunk owns a
static per-bucket quantum of ``q`` output columns; there is NO
cross-chunk state on the write path (the round-2 design appended to
per-bucket VMEM rings with RMW + double-buffered flushes and spent
49-67 ms at 4.7M entries; this kernel is two one-hot MXU matmuls per
chunk, fully pipelined). Per chunk:

  1. bucket ids: ``(int(key) >> bucket_shift) & (B - 1)`` — the
     interleaved modulo assignment whose per-bucket loads are balanced
     by construction.
  2. chunk-local stable ranks from ONE (C, C) lower-tri matmul over the
     (C, B) bucket one-hot (lax.cumsum has no Mosaic lowering; the
     matmul rides the MXU).
  3. every column goes to output column ``bid*q + rank`` of the chunk's
     (16, B*q) window via ONE (16, C) @ (C, B*q) one-hot permutation
     matmul (segsum.py's scatter trick, exact for one-hot operands);
     columns whose rank overflows ``q`` land on a parked pad column and
     are counted as drops.
  4. unwritten output columns get the bucket's ``sentinel`` on the key
     row and zero payload — the batched per-bucket sort that follows at
     every call site sinks them to the bucket's tail, which is exactly
     where the ring design would have put them.

The price is headroom: the output (and the following sort) is
``B*q/C`` times the input. The win is a partition kernel that runs at
HBM streaming speed instead of serializing on per-bucket ring state.

Output layout: (16, B, cap) with cap = (M/C)*q; chunk g's bucket-b
columns live at ``[g*q, g*q + kept)`` in input order, so scanning a
bucket left-to-right visits its entries in input order (stable).
Row 15 of the output is the validity mask (1.0 = real column, 0.0 =
pad); whatever the caller had on input row 15 is NOT carried through.

Discard filters (columns removed entirely — no bucket, no drop count):
``n_valid`` (traced scalar prefetch) discards everything past a dynamic
prefix — the unwritten tail of the backward kernel's gradient stream;
``drop_key_above`` (static) discards sentinel columns by key —
binning's budget-slack slots.
"""

import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PREC = jax.lax.Precision.HIGHEST


def _tri_incl_bf16(n):
    """Lower-triangular ones L[j, k] = 1 for k <= j: ``L @ onehot`` gives
    the inclusive prefix count of each bucket over a chunk's columns.
    bf16 operands are exact for 0/1 matrices with f32 accumulation."""
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    return (row >= col).astype(jnp.bfloat16)


def _qpart_kernel(nv_ref, x_ref, out_ref, counts_ref, drops_ref, smem, *,
                  C, B, q, W, Wp, n_chunks, key_row, sentinels,
                  bucket_shift, drop_key_above):
    g = pl.program_id(0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

    @pl.when(g == 0)
    def _():
        for b in range(B):
            smem[0, b] = 0
            smem[1, b] = 0

    data = x_ref[...]                                         # (16, C)
    key_f = data[key_row:key_row + 1, :]
    key_i = key_f.astype(jnp.int32)
    if bucket_shift:
        key_i = jax.lax.shift_right_logical(key_i, bucket_shift)
    bid = jnp.bitwise_and(key_i, B - 1)                       # (1, C)

    keep = (g * C + lanes) < nv_ref[0]
    if drop_key_above is not None:
        keep = keep & (key_f < jnp.float32(drop_key_above))
    data = jnp.where(keep, data, 0.0)
    # row 15 becomes the validity carrier through the permutation matmul
    # (pads can only be told apart from valid columns by it).
    data = jnp.concatenate([data[:15, :], keep.astype(jnp.float32)], axis=0)

    # Stable chunk-local ranks: ONE (C, C) @ (C, B) MXU matmul.
    # (keep is cast to f32 BEFORE the (C, 1) reshape: Mosaic only supports
    # minor-dim insertion reshapes for 32-bit types, not i1 masks.)
    bcols = jax.lax.broadcasted_iota(jnp.int32, (C, B), 1)
    keep_col = keep.astype(jnp.float32).reshape(C, 1)
    onehot = (bid.reshape(C, 1) == bcols).astype(
        jnp.float32) * keep_col                               # (C, B)
    incl = jax.lax.dot_general(                               # (C, B) exact:
        _tri_incl_bf16(C), onehot.astype(jnp.bfloat16),       # 0/1 inputs,
        (((1,), (0,)), ((), ())),                             # f32 accum
        preferred_element_type=jnp.float32)
    rank = incl - onehot                                      # exclusive
    rankv = jnp.sum(onehot * rank, axis=1)                    # (C,)
    cntb = incl[C - 1:C, :]                                   # (1, B)

    # Permute all 16 rows to output columns bid*q + rank; rank overflow is
    # parked on pad column W (in [W, Wp), discarded) and counted.
    dest = bid[0].astype(jnp.float32) * q + rankv             # (C,)
    dest = jnp.where(rankv >= q, jnp.float32(W), dest)
    lanesWp = jax.lax.broadcasted_iota(jnp.int32, (C, Wp), 1)
    perm = (dest.astype(jnp.int32).reshape(C, 1)
            == lanesWp).astype(jnp.float32)                   # (C, Wp)
    part = jax.lax.dot_general(                               # (16, Wp)
        data, perm, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PREC)

    # Sentinel the key row of unwritten columns (validity row tells them
    # apart from real columns whose key happens to equal the sentinel).
    lanesW = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    region = lanesW // q
    sent = jnp.zeros((1, W), jnp.float32)
    for b in range(B):
        sent = jnp.where(region == b, jnp.float32(sentinels[b]), sent)
    validW = part[15:16, :W] > 0.5
    key_out = jnp.where(validW, part[key_row:key_row + 1, :W], sent)
    if key_row == 0:
        assembled = jnp.concatenate([key_out, part[1:, :W]], axis=0)
    else:
        assembled = jnp.concatenate(
            [part[:key_row, :W], key_out, part[key_row + 1:, :W]], axis=0)
    out_ref[...] = assembled

    kept = jnp.minimum(cntb, jnp.float32(q))
    for b in range(B):
        smem[0, b] = smem[0, b] + kept[0, b].astype(jnp.int32)
        smem[1, b] = smem[1, b] + (cntb[0, b] - kept[0, b]).astype(jnp.int32)

    @pl.when(g == n_chunks - 1)
    def _():
        for b in range(B):
            counts_ref[0, b] = smem[0, b]
            drops_ref[0, b] = smem[1, b]


@functools.lru_cache(maxsize=None)
def _make_qpart(M, C, B, q, key_row, sentinels, bucket_shift,
                drop_key_above, interpret):
    n_chunks = M // C
    W = B * q
    Wp = W + 128  # one extra lane block parks rank-overflow columns
    return pl.pallas_call(
        functools.partial(_qpart_kernel, C=C, B=B, q=q, W=W, Wp=Wp,
                          n_chunks=n_chunks, key_row=key_row,
                          sentinels=sentinels, bucket_shift=bucket_shift,
                          drop_key_above=drop_key_above),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec((16, C), lambda g, *_: (0, g),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((16, W), lambda g, *_: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[pltpu.SMEM((2, B), jnp.int32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((16, n_chunks * W), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        interpret=interpret,
    )


def partition_soa(x: jnp.ndarray, n_buckets: int, quantum: int, *,
                  key_row: int = 0,
                  sentinel: Union[float, Sequence[float]], C: int = 512,
                  bucket_shift: int = 0, n_valid=None,
                  drop_key_above: Optional[float] = None,
                  interpret: Optional[bool] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stable B-way bucket partition of a (16, M) column-SoA.

    Column j's bucket is ``(int(x[key_row, j]) >> bucket_shift) & (B-1)``
    (B = ``n_buckets``, a power of two). Each (16, C) input chunk owns
    ``quantum`` output columns per bucket, so bucket capacity is
    ``cap = (M/C) * quantum`` and a chunk contributing more than
    ``quantum`` columns to one bucket drops the excess (counted).
    Choose ``quantum`` as headroom over the balanced mean C/B — e.g.
    q = 1.5 * C/B absorbs per-chunk fluctuation at +4 sigma for
    binomial-like key streams.

    ``sentinel`` (scalar, or one per bucket) fills the key row of pad
    columns (payload rows are zero). ``n_valid`` (traced scalar)
    discards columns past a dynamic prefix; ``drop_key_above`` (static)
    discards columns whose key is >= the threshold — both are removed
    entirely (no bucket, no drop count).

    Returns ``(out, counts, drops)``: out is (16, B, cap); scanning
    bucket b's columns left-to-right visits its kept entries in input
    order, interleaved with sentinel pads (a per-bucket sort by the key
    row sinks the pads — every call site sorts anyway; ``lax.sort`` is
    stable, so the combined partition+sort equals the flat sort).
    Output row 15 is the validity mask (1.0 real / 0.0 pad); input
    row 15 is NOT carried through. counts/drops are (B,) int32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = int(n_buckets)
    q = int(quantum)
    assert x.shape[0] == 16
    assert 0 <= key_row < 15, "row 15 is the validity carrier"
    assert B >= 2 and (B & (B - 1)) == 0, "n_buckets must be a power of two"
    M = x.shape[1]
    assert M % C == 0, "pad M to a multiple of C first"
    assert (B * q) % 128 == 0, \
        "B*quantum must be lane-aligned (a multiple of 128)"
    assert B * q <= 4 * C, "headroom B*q/C > 4 is never worth the sort"
    if isinstance(sentinel, (int, float)):
        sentinels = (float(sentinel),) * B
    else:
        sentinels = tuple(float(s) for s in sentinel)
        assert len(sentinels) == B
    nv = jnp.full((1,), M, jnp.int32) if n_valid is None else (
        jnp.asarray(n_valid, jnp.int32).reshape(1))
    call = _make_qpart(
        M, C, B, q, int(key_row), sentinels, int(bucket_shift),
        float(drop_key_above) if drop_key_above is not None else None,
        bool(interpret))
    out, counts, drops = call(nv, x)
    n_chunks = M // C
    # (16, n_chunks, B, q) -> (16, B, n_chunks*q): one XLA transpose.
    rows = jnp.swapaxes(out.reshape(16, n_chunks, B, q), 1, 2).reshape(
        16, B, n_chunks * q)
    return rows, counts[0], drops[0]


def quantum_for(C: int, B: int, headroom: float) -> int:
    """Smallest lane-aligned quantum with B*q >= headroom * C."""
    import math

    q_min = headroom * C / B
    step = 128 // math.gcd(B, 128)
    return max(int(-(-q_min // step)) * step, step)
