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
  1. bucket ids b_j ride a designated SoA row (exact f32 ints in [0, B)).
  2. chunk-local stable partition: dest_j = base[b_j] + rank_of_j_in_its_
     bucket; ranks/bases from ONE (C, C) upper-tri MXU matmul over the
     (C, B) bucket one-hot; the permutation applies to all 16 rows with
     ONE (16, C) @ (C, C) one-hot MXU matmul (segsum.py's scatter trick).
  3. each bucket's now-contiguous run appends to its (16, 2C) VMEM ring
     (dynamic roll + column-mask RMW, the rasterizer's staging idiom);
     full C-column ring halves flush to HBM with async DMAs through a
     per-bucket double-buffered bounce (the ring shifts immediately; the
     bounce keeps the DMA source stable).
  4. columns that would exceed a bucket's static capacity are dropped and
     counted, mirroring the class-budget accounting.

Output: (16, sum(caps)) with bucket k's columns at
``sum(caps[:k]) + [0, counts[k])`` in input order; tail columns of each
bucket are zero with ``sentinel`` on the key row (a later per-bucket sort
sinks them; zero payload is the same pad contract as pack_soa/pack_rows).
Capacities must be multiples of C.
"""

import functools
from typing import Optional, Sequence, Tuple

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


def _partition_kernel(x_ref, out_hbm, counts_ref, drops_ref, rings, bounce,
                      sems, smem, *, C, B, caps_c, n_chunks, bucket_row,
                      key_row, sentinel):
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
    bid = jnp.clip(data[bucket_row:bucket_row + 1, :].astype(jnp.int32),
                   0, B - 1)                                      # (1, C)

    # --- chunk-local stable partition via MXU one-hot (segsum's trick) ---
    bcols = jax.lax.broadcasted_iota(jnp.int32, (C, B), 1)
    onehot_b = (bid.reshape(C, 1) == bcols).astype(jnp.float32)   # (C, B)
    incl = jax.lax.dot_general(                                   # (C, B)
        _tri_incl(C), onehot_b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PREC)
    cnt = incl[C - 1:C, :]                                        # (1, B)
    base = jnp.concatenate(                                       # exclusive
        [jnp.zeros((1, 1), jnp.float32),
         jax.lax.cumsum(cnt, axis=1)[:, :B - 1]], axis=1)         # (1, B)
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
            # sentinel so a later per-bucket sort sinks pad columns.
            keyrow = rings[b][key_row:key_row + 1, :]
            rings[b, key_row:key_row + 1, :] = jnp.where(
                lanes2 >= cur, jnp.float32(sentinel), keyrow)
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
def _make_partition(M, caps_c, C, bucket_row, key_row, sentinel, interpret):
    B = len(caps_c)
    n_chunks = M // C
    total = sum(caps_c) * C
    return pl.pallas_call(
        functools.partial(_partition_kernel, C=C, B=B, caps_c=caps_c,
                          n_chunks=n_chunks, bucket_row=bucket_row,
                          key_row=key_row, sentinel=sentinel),
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((16, C), lambda g: (0, g),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, 16, 2 * C), jnp.float32),   # rings
            pltpu.VMEM((B, 2, 16, C), jnp.float32),    # bounce
            pltpu.SemaphoreType.DMA((B, 2)),
            pltpu.SMEM((3, B), jnp.int32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, total), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def partition_soa(x: jnp.ndarray, caps: Sequence[int], *, bucket_row: int = 15,
                  key_row: int = 0, sentinel: float, C: int = 512,
                  interpret: Optional[bool] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stable B-way bucket partition of a (16, M) column-SoA.

    ``x[bucket_row]`` holds each column's bucket id (exact f32 int in
    [0, B); out-of-range ids are clipped); ``caps[k]`` (multiple of C) is
    bucket k's static capacity. Returns ``(out, counts, drops)``: out is
    (16, sum(caps)) with bucket k's columns at ``sum(caps[:k]) +
    [0, counts[k])`` in input order, pad tails zero with ``sentinel`` on
    ``key_row``; counts/drops are (B,) int32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert x.shape[0] == 16
    M = x.shape[1]
    assert M % C == 0, "pad M to a multiple of C first"
    caps_c = tuple(int(c) // C for c in caps)
    assert all(c * C == int(c0) for c, c0 in zip(caps_c, caps)), \
        "bucket capacities must be multiples of C"
    call = _make_partition(M, caps_c, C, int(bucket_row), int(key_row),
                           float(sentinel), bool(interpret))
    out, counts, drops = call(x)
    return out, counts[0], drops[0]
