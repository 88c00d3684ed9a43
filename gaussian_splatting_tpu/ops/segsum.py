"""Pallas segmented-sum epilogue for the per-gaussian gradient reduction.

The backward pass tags every per-entry gradient with its gaussian id and the
XLA side sorts by id (``tiling.reduce_padded_grads``). Round 1 finished the
reduction with cumsum + searchsorted + take; honest chained timing showed
``searchsorted`` alone costs more than the entire sort (~130-540 ms at the
1M-gaussian benchmark vs 82 ms for the 11-operand sort — the 23-step binary
search is a serial chain of 1M random gathers, the one primitive this
codebase otherwise avoids). This kernel replaces the whole epilogue with ONE
sequential sweep over the sorted buffer (~5-10 ms):

- The output (16, N_pad) is produced window-by-window, C gid-columns at a
  time, in ascending gid order. Because the input is sorted by gid, window k
  [k*C, (k+1)*C) is complete as soon as the chunk in hand holds no gid below
  (k+1)*C anymore — flush it (aligned DMA), zero the buffer, move on.
  Windows nobody touches flush as zeros, which also yields zero gradients
  for gaussians with no visible entries.
- Entries scatter into the open window with one MXU matmul per (chunk,
  window) pair: ``grads (16, C) @ onehot(gid - k*C) (C, C)`` — duplicate
  gids ADD into the same column, so there is no segment bookkeeping, no
  ranks, and no carry between chunks (a gid spanning chunks simply keeps
  adding into the still-open window).
- Sentinel/garbage entries arrive pre-masked by the XLA caller (gid = N,
  grads = 0); they scatter zeros into (or skip past) the final window.

The reference counterpart is the atomic scatter-add in gsplat's CUDA
backward (reference call site ``gsplat_backend.py:83-97``).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_splatting_tpu.ops.tiling import cdiv

_PREC = jax.lax.Precision.HIGHEST

# SMEM state layout (persists across grid steps):
_K = 0        # open window index
_SLOT = 1     # double-buffer slot of the open window
_NF = 2       # total flushes started
_LASTK0 = 3   # window index of slot 0's outstanding flush
_LASTK1 = 4   # window index of slot 1's outstanding flush


def _segsum_kernel(soa_ref, out_hbm, w, wsem, smem, *, C, n_chunks,
                   n_windows):
    """One grid step = one C-entry chunk of the gid-sorted (16, M) buffer."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        smem[_K] = 0
        smem[_SLOT] = 0
        smem[_NF] = 0
        w[0] = jnp.zeros_like(w[0])
        w[1] = jnp.zeros_like(w[1])

    data = soa_ref[...]                  # (16, C) current chunk
    gi = data[0:1, :].astype(jnp.int32)  # (1, C) segment ids, ascending
    chunk_min = jnp.min(gi)
    chunk_max = jnp.max(gi)

    def flush_dma(slot, k):
        return pltpu.make_async_copy(
            w.at[slot],
            out_hbm.at[:, pl.ds(k * C, C)],
            wsem.at[slot],
        )

    def flush_once(k, slot, nf):
        """Flush the open window (k, slot); open window k+1 zeroed on the
        other slot. Every flush is waited exactly once: by its successor
        here (before its buffer is zeroed for reuse), or by the final
        retire at the end of the last chunk."""
        flush_dma(slot, k).start()
        smem[_LASTK0 + slot] = k

        @pl.when(nf >= 1)
        def _():
            flush_dma(1 - slot, smem[_LASTK0 + (1 - slot)]).wait()
        w[1 - slot] = jnp.zeros_like(w[1 - slot])
        return k + 1, 1 - slot, nf + 1

    def flush_while(pred_of_k, k, slot, nf):
        def cond(carry):
            kk = carry[0]
            return (kk < n_windows) & pred_of_k(kk)

        def body(carry):
            return flush_once(*carry)

        return jax.lax.while_loop(cond, body, (k, slot, nf))

    k, slot, nf = smem[_K], smem[_SLOT], smem[_NF]

    # 1) Windows entirely below this chunk's smallest gid are complete
    #    (untouched ones flush as zeros).
    k, slot, nf = flush_while(lambda kk: (kk + 1) * C <= chunk_min,
                              k, slot, nf)

    # 2) Scatter the chunk into the open window; while the chunk extends
    #    past the window end, the window is complete — flush and continue.
    lanes = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)

    def scat_cond(carry):
        done, kk, _, _ = carry
        return jnp.logical_not(done) & (kk < n_windows)

    def scat_body(carry):
        _, k, slot, nf = carry
        onehot = ((gi.reshape(C, 1) - k * C) == lanes).astype(jnp.float32)
        contrib = jax.lax.dot_general(
            data, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC)
        w[slot] = w[slot] + contrib

        last = chunk_max < (k + 1) * C

        # lax.cond with ref effects is not supported in kernels — predicate
        # the flush with pl.when and mirror the carry update with where.
        @pl.when(jnp.logical_not(last))
        def _():
            flush_once(k, slot, nf)

        k = jnp.where(last, k, k + 1)
        slot = jnp.where(last, slot, 1 - slot)
        nf = jnp.where(last, nf, nf + 1)
        return last, k, slot, nf

    _, k, slot, nf = jax.lax.while_loop(
        scat_cond, scat_body, (jnp.bool_(False), k, slot, nf))

    # 3) Last chunk: flush the open window and every remaining (zero) one,
    #    then retire the final outstanding flush.
    @pl.when(b == n_chunks - 1)
    def _():
        k3, slot3, nf3 = flush_while(lambda kk: kk < n_windows, k, slot, nf)

        @pl.when(nf3 >= 1)
        def _():
            last_slot = 1 - slot3
            flush_dma(last_slot, smem[_LASTK0 + last_slot]).wait()
        smem[_K], smem[_SLOT], smem[_NF] = k3, slot3, nf3

    @pl.when(b < n_chunks - 1)
    def _():
        smem[_K], smem[_SLOT], smem[_NF] = k, slot, nf


@functools.lru_cache(maxsize=None)
def _make_segsum(M, N, C, interpret):
    n_chunks = cdiv(M, C)
    n_windows = cdiv(N, C)
    n_pad = n_windows * C

    return pl.pallas_call(
        functools.partial(_segsum_kernel, C=C, n_chunks=n_chunks,
                          n_windows=n_windows),
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((16, C), lambda b: (0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 16, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((5,), jnp.int32),
        ],
        out_shape=jax.ShapeDtypeStruct((16, n_pad), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def segment_sum_sorted(stacked: jnp.ndarray, n_segments: int, C: int = 256,
                       interpret: bool = None) -> jnp.ndarray:
    """Sum columns of a segment-sorted (16, M) buffer per segment id.

    Row 0 must carry the (ascending) segment id of each column as an exact
    f32 integer in [0, n_segments] (id == n_segments = masked sentinel,
    must carry zero payload). Returns (16, n_segments): column g = sum of
    input columns with id g (row 0 of the output = g * count — ignore it).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert stacked.shape[0] == 16
    M = stacked.shape[1]
    Mp = cdiv(M, C) * C
    if Mp != M:
        pad = jnp.zeros((16, Mp - M), stacked.dtype)
        pad = pad.at[0, :].set(float(n_segments))
        stacked = jnp.concatenate([stacked, pad], axis=1)
    out = _make_segsum(Mp, n_segments, C, bool(interpret))(stacked)
    return out[:, :n_segments]
