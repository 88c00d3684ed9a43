"""Prototype: Pallas arbitrary-gather kernel via two-step tpu.dynamic_gather
from a VMEM-resident table.

Gathers out[j] = table[idx[j]] for M indices from an N-entry table:
- table stored (R, 128), R = N/128
- step A: rows = take_along_axis(table, row_idx, axis=0)   [sublane gather]
- step B: out  = take_along_axis(rows, col_idx, axis=1)    [lane gather]

Run: python scratch/probe_gather.py [cpu]
"""

import sys
import time

import jax

if "cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = jax.default_backend() == "cpu"
print("backend:", jax.default_backend())

N = 131_072          # table entries (1024 x 128)
R = N // 128
M = 3_670_016        # gathered entries
BLK = R * 128        # indices per grid step must be table-shaped


def kernel(idx_ref, table_hbm, out_ref, table_vmem, sem):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        dma = pltpu.make_async_copy(table_hbm, table_vmem, sem)
        dma.start()
        dma.wait()

    idx = idx_ref[0]                     # (R, 128) int32 flat indices
    row_idx = idx // 128                 # (16, 128)
    col_idx = idx % 128
    table = table_vmem[:]                # (R, 128)
    # Step A: for each output position (r, c), fetch table[row_idx[r,c], c].
    rows = jnp.take_along_axis(table, row_idx, axis=0, mode="promise_in_bounds")
    # Step B: pick the right lane.
    out_ref[0] = jnp.take_along_axis(rows, col_idx, axis=1, mode="promise_in_bounds")


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(R, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, size=(M,)), jnp.int32)
    idx2d = idx.reshape(M // BLK, R, 128)

    fn = pl.pallas_call(
        kernel,
        grid=(M // BLK,),
        in_specs=[
            pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M // BLK, R, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, 128), jnp.float32), pltpu.SemaphoreType.DMA(())],
        interpret=INTERPRET,
    )
    f = jax.jit(lambda i2, t: fn(i2, t))
    out = f(idx2d, table)
    expected = np.asarray(table).reshape(-1)[np.asarray(idx)]
    got = np.asarray(out).reshape(-1)
    err = np.abs(got - expected).max()
    print("correctness max err:", err)
    assert err == 0.0

    seeds = [jnp.asarray(np.roll(np.asarray(idx2d), i, axis=0)) for i in range(6)]
    jax.block_until_ready(f(seeds[-1], table))
    t0 = time.time()
    for i in range(5):
        out = f(seeds[i], table)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 5
    print(f"pallas gather: {dt*1e3:.2f} ms for {M} -> {M/dt/1e9:.2f} G elem/s")

    # XLA reference gather
    flat = table.reshape(-1)
    g = jax.jit(lambda i2: flat[i2.reshape(-1)])
    jax.block_until_ready(g(seeds[-1]))
    t0 = time.time()
    for i in range(5):
        out = g(seeds[i])
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 5
    print(f"XLA gather:    {dt*1e3:.2f} ms for {M} -> {M/dt/1e9:.2f} G elem/s")


main()
