"""Round-5 probe: per-descriptor cost of small dynamic-offset VMEM->HBM
DMAs — the write primitive of the two-pass exact partition
(docs/ROADMAP_R5.md). The design wants per (chunk, bucket) copies of a
static (16, W) window from VMEM staging to a dynamic column offset of an
HBM bucket plane: B copies per grid step, n_chunks steps. Whether that
partition beats the quantum kernel is decided ALMOST ENTIRELY by the DMA
issue/retire overhead at W in {128, 256, 512} and B in {64, 256}.

Two kernel variants:
  serial : start+wait per copy (upper bound on cost)
  lagged : start all with an 8-deep rotating semaphore ring, wait lagged
           by 8 (the real kernel's shape)

Usage (axon TPU): python scratch/probe_dma_rate_r5.py
Prints us/DMA and effective GB/s for each (B, W, variant).
"""

import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_splatting_tpu.utils.profiling import time_fn_device

RING = 8


def _kernel(base_ref, x_ref, out_ref, sem, *, B, W, cap, lagged):
    g = pl.program_id(0)

    def issue(b, _):
        off = base_ref[g * B + b]
        dma = pltpu.make_async_copy(
            x_ref.at[:, pl.ds(0, W)],
            out_ref.at[:, pl.ds(b * cap + off, W)],
            sem.at[b % RING] if lagged else sem.at[0],
        )
        dma.start()
        if lagged:
            @pl.when(b >= RING - 1)
            def _():
                bw = b - (RING - 1)
                off2 = base_ref[g * B + bw]
                pltpu.make_async_copy(
                    x_ref.at[:, pl.ds(0, W)],
                    out_ref.at[:, pl.ds(bw * cap + off2, W)],
                    sem.at[bw % RING],
                ).wait()
        else:
            dma.wait()
        return 0

    jax.lax.fori_loop(0, B, issue, 0)
    if lagged:
        def drain(b, _):
            off2 = base_ref[g * B + b]
            pltpu.make_async_copy(
                x_ref.at[:, pl.ds(0, W)],
                out_ref.at[:, pl.ds(b * cap + off2, W)],
                sem.at[b % RING],
            ).wait()
            return 0
        jax.lax.fori_loop(B - (RING - 1), B, drain, 0)


@functools.lru_cache(maxsize=None)
def make(n_chunks, C, B, W, cap, lagged):
    return pl.pallas_call(
        functools.partial(_kernel, B=B, W=W, cap=cap, lagged=lagged),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((16, C), lambda g, *_: (0, g),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((RING,))],
        ),
        out_shape=jax.ShapeDtypeStruct((16, B * cap), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )


def main():
    M = 4_718_592
    for B, C in ((256, 32768), (256, 65536), (64, 32768)):
        n_chunks = M // C
        for W in (128, 256, 512):
            cap = ((M // B + 4096) // 128) * 128 + W
            x = jnp.ones((16, n_chunks * C), jnp.float32)
            # offsets: chunk g's bucket-b run starts at g*(C//B) rounded to 8
            base = (jnp.arange(n_chunks, dtype=jnp.int32)[:, None]
                    * (C // B // 8 * 8)
                    + jnp.zeros((1, B), jnp.int32)).reshape(-1)
            for lagged in (False, True):
                call = make(n_chunks, C, B, W, cap, lagged)

                def fn(s, base, x, call=call):
                    return call(base, x + s * 0)[0, :128]

                try:
                    t = time_fn_device(fn, args=(base, x), reps=5)
                except Exception as e:
                    print(f"B={B} C={C} W={W} lagged={lagged}: FAIL {type(e).__name__}: {str(e)[:200]}")
                    continue
                n_dma = n_chunks * B
                by = n_dma * 16 * W * 4
                print(f"B={B} C={C} W={W} lagged={int(lagged)}: "
                      f"{t*1e3:8.2f} ms  {t/n_dma*1e6:6.3f} us/DMA  "
                      f"{by/t/2**30:7.1f} GiB/s  ({n_dma} DMAs)")


if __name__ == "__main__":
    main()
