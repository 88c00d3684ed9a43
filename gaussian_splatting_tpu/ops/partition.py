"""Pallas bucket-partition: the TPU-native "radix scatter" primitive.

Splits a (16, M) column-SoA into B buckets by a per-column bucket id,
preserving within-bucket input order (stable), with static per-bucket
capacities and counted (never silent) overflow. This is the primitive a
CUDA pipeline gets from radix-sort scatter passes and that XLA:TPU has no
fast equivalent for (large scatters measured ~40M elem/s, tiling.py:9).

Why it exists: ``lax.sort`` cost on TPU is strongly superlinear in row
length (measured: 12-operand sorts run ~2 ns/entry at M <= 1M but
~10 ns/entry at M >= 4M — BENCH.md). Binning only needs per-TILE order
and the gradient reduce only needs per-GAUSSIAN runs, so a cheap B-way
split by tile/gid lets the big sort run as a BATCHED (B, M/B) sort at
the small-row rate. The reference counterpart is the radix binning
inside gsplat's CUDA rasterizer (gsplat_backend.py:83-97).

Method, per C-column input chunk (grid is sequential on the one core):
  1. bucket ids come either from a designated SoA row (``bucket_row``) or
     are derived in-kernel from the sort key (``bucket_mod``: pow2-modulo
     of the key, optionally right-shifted first — the interleaved
     assignment whose per-bucket loads are balanced by construction).
  2. chunk-local stable partition: dest_j = base[b_j] + rank_of_j_in_its_
     bucket; ranks/bases from ONE (C, C) upper-tri MXU matmul over the
     (C, B) bucket one-hot; the permutation applies to all 16 rows with
     ONE (16, C) @ (C, C) one-hot MXU matmul (segsum.py's scatter trick).
     Discarded columns (see 5) are zeroed and parked on dest 0, where
     they add zero to whichever kept column compacts there.
  3. each bucket's now-contiguous run appends to its (16, 2C) VMEM ring
     (dynamic roll + column-mask RMW, the rasterizer's staging idiom);
     full C-column ring halves flush to HBM with async DMAs through a
     per-bucket double-buffered bounce (the ring shifts immediately; the
     bounce keeps the DMA source stable).
  4. columns that would exceed a bucket's static capacity are dropped and
     counted, mirroring the class-budget accounting.
  5. two discard filters drop columns entirely (no bucket, no count):
     ``n_valid`` (traced scalar prefetch) discards everything past a
     dynamic prefix — the unwritten tail of the backward kernel's
     gradient stream; ``drop_key_above`` (static) discards sentinel
     columns by key — binning's budget-slack slots.

Output: (16, sum(caps)) with bucket k's columns at
``sum(caps[:k]) + [0, counts[k])`` in input order; tail columns of each
bucket are zero with bucket k's ``sentinel`` on the key row (a later
per-bucket sort sinks them; zero payload is the same pad contract as
pack_soa/pack_rows). Capacities must be multiples of C.
"""

import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PREC = jax.lax.Precision.HIGHEST


def _tri_incl(n):
    """Lower-triangular ones L[j, k] = 1 for k <= j: ``L @ onehot`` gives
    the inclusive prefix count of each bucket over entries."""
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    return (row >= col).astype(jnp.float32)


def _tri_strict_upper(n):
    """Strict upper-triangular ones U[j, k] = 1 for j < k: ``x @ U`` is an
    EXCLUSIVE prefix sum along lanes (lax.cumsum has no Pallas TPU
    lowering; this one matmul replaces it)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    return (row < col).astype(jnp.float32)


def _partition_kernel(nv_ref, x_ref, out_hbm, counts_ref, drops_ref, rings,
                      bounce, sems, smem, *, C, B, caps_c, n_chunks,
                      bucket_row, key_row, sentinels, bucket_mod,
                      bucket_shift, drop_key_above):
    """One grid step partitions one (16, C) chunk into B VMEM rings.

    SMEM state rows: 0 = ring cursor (< C), 1 = C-blocks flushed,
    2 = dropped columns — one column per bucket."""
    g = pl.program_id(0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * C), 1)

    @pl.when(g == 0)
    def _():
        for b in range(B):
            smem[0, b] = 0
            smem[1, b] = 0
            smem[2, b] = 0
            rings[b] = jnp.zeros((16, 2 * C), jnp.float32)

    data = x_ref[...]                                             # (16, C)
    key_f = data[key_row:key_row + 1, :]                          # (1, C)
    if bucket_mod is not None:
        key_i = key_f.astype(jnp.int32)
        if bucket_shift:
            key_i = jax.lax.shift_right_logical(key_i, bucket_shift)
        bid = jnp.bitwise_and(key_i, B - 1)                       # (1, C)
    else:
        bid = jnp.clip(data[bucket_row:bucket_row + 1, :].astype(jnp.int32),
                       0, B - 1)                                  # (1, C)

    # Discard filters: dropped columns are zeroed (so their dest-0 parking
    # spot accumulates nothing) and excluded from the bucket one-hot.
    keep = (g * C + lanes) < nv_ref[0]                            # (1, C)
    if drop_key_above is not None:
        keep = keep & (key_f < jnp.float32(drop_key_above))
    data = jnp.where(keep, data, 0.0)

    # --- chunk-local stable partition via MXU one-hot (segsum's trick) ---
    # (keep is cast to f32 BEFORE the (C, 1) reshape: Mosaic only supports
    # minor-dim insertion reshapes for 32-bit types, not i1 masks.)
    bcols = jax.lax.broadcasted_iota(jnp.int32, (C, B), 1)
    keep_col = keep.astype(jnp.float32).reshape(C, 1)
    onehot_b = (bid.reshape(C, 1) == bcols).astype(
        jnp.float32) * keep_col                                   # (C, B)
    incl = jax.lax.dot_general(                                   # (C, B)
        _tri_incl(C), onehot_b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PREC)
    cnt = incl[C - 1:C, :]                                        # (1, B)
    base = jax.lax.dot_general(                                   # exclusive
        cnt, _tri_strict_upper(B), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PREC)      # (1, B)
    rank = incl - onehot_b                                        # exclusive
    dest = jnp.sum(onehot_b * (rank + base), axis=1)              # (C,)
    perm = (dest.astype(jnp.int32).reshape(C, 1)
            == lanes).astype(jnp.float32)                         # (C, C)
    part = jax.lax.dot_general(                                   # (16, C)
        data, perm, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PREC)

    # --- append each bucket's run to its ring, flush full halves ---
    part2 = jnp.concatenate([part, part], axis=1)                 # (16, 2C)
    cnt_i = cnt.astype(jnp.int32)
    base_i = base.astype(jnp.int32)

    offs_c = [0]
    for c in caps_c:
        offs_c.append(offs_c[-1] + c)

    def flush_dma(b, slot, blk_idx):
        return pltpu.make_async_copy(
            bounce.at[b, slot],
            out_hbm.at[:, pl.ds((offs_c[b] + blk_idx) * C, C)],
            sems.at[b, slot],
        )

    for b in range(B):
        nb = cnt_i[0, b]
        start = base_i[0, b]
        cur = smem[0, b]
        nfl = smem[1, b]
        room = caps_c[b] * C - (nfl * C + cur)
        take = jnp.minimum(nb, jnp.maximum(room, 0))
        smem[2, b] = smem[2, b] + (nb - take)

        # RMW append: roll the doubled chunk so column `start` lands on
        # `cur`; select columns [cur, cur + take).
        sh = jax.lax.rem(cur - start + 2 * C, 2 * C)
        rolled = pltpu.roll(part2, sh, 1)
        sel = (lanes2 >= cur) & (lanes2 < cur + take)
        rings[b] = jnp.where(sel, rolled, rings[b])
        cur = cur + take

        @pl.when(cur >= C)
        def _(b=b, cur=cur, nfl=nfl):
            slot = jax.lax.rem(nfl, 2)

            @pl.when(nfl >= 2)
            def _():
                flush_dma(b, slot, nfl - 2).wait()
            bounce[b, slot] = rings[b][:, :C]
            flush_dma(b, slot, nfl).start()
            rings[b] = jnp.concatenate(
                [rings[b][:, C:], jnp.zeros((16, C), jnp.float32)], axis=1)
            smem[0, b] = cur - C
            smem[1, b] = nfl + 1

        @pl.when(cur < C)
        def _(b=b, cur=cur):
            smem[0, b] = cur

    # --- last chunk: sentinel the tails, flush every remaining block ---
    @pl.when(g == n_chunks - 1)
    def _():
        for b in range(B):
            cur = smem[0, b]
            nfl = smem[1, b]
            # payload past the cursor is already zero (ring shifts insert
            # zeros and RMW writes only [cur, cur+take)); key row gets the
            # bucket's sentinel so a later per-bucket sort sinks pad columns.
            keyrow = rings[b][key_row:key_row + 1, :]
            rings[b, key_row:key_row + 1, :] = jnp.where(
                lanes2 >= cur, jnp.float32(sentinels[b]), keyrow)
            counts_ref[0, b] = nfl * C + cur
            drops_ref[0, b] = smem[2, b]

            def fl_body(i, nfl, b=b):
                slot = jax.lax.rem(nfl, 2)

                @pl.when(nfl >= 2)
                def _():
                    flush_dma(b, slot, nfl - 2).wait()
                # block 0 = ring lower half (data + sentinel tail); later
                # blocks = ring upper half (pure sentinel pad).
                bounce[b, slot] = jnp.where(
                    i == 0, rings[b][:, :C], rings[b][:, C:])
                flush_dma(b, slot, nfl).start()
                return nfl + 1

            smem[1, b] = jax.lax.fori_loop(
                0, caps_c[b] - nfl, fl_body, nfl)
        for b in range(B):
            nfl = smem[1, b]

            @pl.when(nfl >= 1)
            def _(b=b, nfl=nfl):
                flush_dma(b, jax.lax.rem(nfl - 1, 2), nfl - 1).wait()

            @pl.when(nfl >= 2)
            def _(b=b, nfl=nfl):
                flush_dma(b, jax.lax.rem(nfl - 2, 2), nfl - 2).wait()


@functools.lru_cache(maxsize=None)
def _make_partition(M, caps_c, C, bucket_row, key_row, sentinels,
                    bucket_mod, bucket_shift, drop_key_above, interpret):
    B = len(caps_c)
    n_chunks = M // C
    total = sum(caps_c) * C
    return pl.pallas_call(
        functools.partial(_partition_kernel, C=C, B=B, caps_c=caps_c,
                          n_chunks=n_chunks, bucket_row=bucket_row,
                          key_row=key_row, sentinels=sentinels,
                          bucket_mod=bucket_mod, bucket_shift=bucket_shift,
                          drop_key_above=drop_key_above),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec((16, C), lambda g, *_: (0, g),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((B, 16, 2 * C), jnp.float32),   # rings
                pltpu.VMEM((B, 2, 16, C), jnp.float32),    # bounce
                pltpu.SemaphoreType.DMA((B, 2)),
                pltpu.SMEM((3, B), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((16, total), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def partition_soa(x: jnp.ndarray, caps: Sequence[int], *,
                  bucket_row: Optional[int] = 15, key_row: int = 0,
                  sentinel: Union[float, Sequence[float]], C: int = 512,
                  bucket_mod: Optional[int] = None, bucket_shift: int = 0,
                  n_valid=None, drop_key_above: Optional[float] = None,
                  interpret: Optional[bool] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stable B-way bucket partition of a (16, M) column-SoA.

    Bucket assignment: with ``bucket_mod=B`` (power of two), column j's
    bucket is ``(int(x[key_row, j]) >> bucket_shift) & (B - 1)`` —
    computed in-kernel from the sort key, no bucket row needed. Otherwise
    ``x[bucket_row]`` holds each column's bucket id (exact f32 int in
    [0, B); out-of-range ids are clipped). ``caps[k]`` (multiple of C) is
    bucket k's static capacity.

    ``sentinel`` (scalar, or one per bucket) fills the key row of pad
    tails. ``n_valid`` (traced scalar) discards columns past a dynamic
    prefix; ``drop_key_above`` (static) discards columns whose key is >=
    the threshold — both are removed entirely (no bucket, no drop count).

    Returns ``(out, counts, drops)``: out is (16, sum(caps)) with bucket
    k's columns at ``sum(caps[:k]) + [0, counts[k])`` in input order, pad
    tails zero with the bucket's sentinel on ``key_row``; counts/drops
    are (B,) int32 (drops = capacity overflow only).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert x.shape[0] == 16
    assert 0 <= key_row < 16
    M = x.shape[1]
    assert M % C == 0, "pad M to a multiple of C first"
    caps_c = tuple(int(c) // C for c in caps)
    assert all(c * C == int(c0) for c, c0 in zip(caps_c, caps)), \
        "bucket capacities must be multiples of C"
    B = len(caps_c)
    if bucket_mod is not None:
        assert bucket_mod == B and (B & (B - 1)) == 0, \
            "bucket_mod must equal len(caps) and be a power of two"
    else:
        assert bucket_row is not None and 0 <= bucket_row < 16
        assert bucket_row != key_row
    if isinstance(sentinel, (int, float)):
        sentinels = (float(sentinel),) * B
    else:
        sentinels = tuple(float(s) for s in sentinel)
        assert len(sentinels) == B
    nv = jnp.full((1,), M, jnp.int32) if n_valid is None else (
        jnp.asarray(n_valid, jnp.int32).reshape(1))
    call = _make_partition(
        M, caps_c, C, int(bucket_row) if bucket_row is not None else 0,
        int(key_row), sentinels,
        int(bucket_mod) if bucket_mod is not None else None,
        int(bucket_shift),
        float(drop_key_above) if drop_key_above is not None else None,
        bool(interpret))
    out, counts, drops = call(nv, x)
    return out, counts[0], drops[0]
