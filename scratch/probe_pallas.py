"""Probe: validate Pallas TPU API mechanics needed by the rasterizer kernels.

Run on CPU (interpret) and TPU (compiled):
  JAX_PLATFORMS=cpu python scratch/probe_pallas.py
  python scratch/probe_pallas.py
"""

import os
import sys

import jax

if "cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = jax.default_backend() == "cpu"
print("backend:", jax.default_backend(), "interpret:", INTERPRET)

T, K, P = 4, 128, 256  # tiles, chunk, pixels
CAP = T * K * 2


def prefix_sum_sublanes(x, n):
    """Inclusive prefix sum along axis 0 (sublanes) via Hillis-Steele:
    log2(n) steps of shift+masked-add. n = static number of rows (power of 2)."""
    assert (n & (n - 1)) == 0
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    d = 1
    while d < n:
        shifted = pltpu.roll(x, d, 0)
        x = jnp.where(row >= d, x + shifted, x)
        d *= 2
    return x


def kernel(starts_ref, counts_ref, isect_ref, out_ref):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    n_chunks = pl.cdiv(count, K)

    def body(scratch, sem):
        def loop(carry):
            i, acc, tcar = carry
            offset = pl.multiple_of(start + i * K, 128)
            dma = pltpu.make_async_copy(
                isect_ref.at[:, pl.ds(offset, K)], scratch, sem
            )
            dma.start()
            dma.wait()
            data = scratch[:]  # (16, K)
            alpha = jnp.clip(data[5:6, :].T * jnp.ones((K, P)), 0.0, 0.5)  # (K,P)
            l1m = jnp.log1p(-alpha)
            S = prefix_sum_sublanes(l1m, K)
            w = alpha * tcar * jnp.exp(S - l1m)
            extras = data[6:14, :]  # (8, K)
            acc = acc + jax.lax.dot_general(
                extras, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            tcar = tcar * jnp.exp(jnp.sum(l1m, axis=0, keepdims=True))
            return i + 1, acc, tcar

        def cond(carry):
            i, acc, tcar = carry
            return (i < n_chunks) & (jnp.max(tcar) > 1e-4)

        i0 = jnp.int32(0)
        acc0 = jnp.zeros((8, P), jnp.float32)
        t0 = jnp.ones((1, P), jnp.float32)
        _, acc, tcar = jax.lax.while_loop(cond, loop, (i0, acc0, t0))
        out_ref[0, 0:8, :] = acc
        out_ref[0, 8:9, :] = tcar
        out_ref[0, 9:16, :] = jnp.zeros((7, P), jnp.float32)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((16, K), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def run():
    rng = np.random.default_rng(0)
    isect = jnp.asarray(rng.uniform(0, 1, size=(16, CAP)), jnp.float32)
    starts = jnp.asarray([0, 2 * K, 4 * K, 6 * K], jnp.int32)
    counts = jnp.asarray([2 * K, K, 90, 0], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 16, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 16, P), jnp.float32),
        interpret=INTERPRET,
    )
    out = jax.jit(fn)(starts, counts, isect)
    out = np.asarray(out)
    print("out shape", out.shape, "finite:", np.isfinite(out).all())

    # Reference in numpy
    def ref():
        res = np.zeros((T, 16, P), np.float32)
        isect_np = np.asarray(isect)
        for t in range(T):
            acc = np.zeros((8, P), np.float32)
            tcar = np.ones((1, P), np.float32)
            cnt = int(counts[t])
            nch = -(-cnt // K)
            for i in range(nch):
                if tcar.max() <= 1e-4:
                    break
                data = isect_np[:, int(starts[t]) + i * K : int(starts[t]) + (i + 1) * K]
                alpha = np.clip(np.tile(data[5:6, :].T, (1, P)), 0, 0.5)
                l1m = np.log1p(-alpha)
                S = np.cumsum(l1m, axis=0)
                w = alpha * tcar * np.exp(S - l1m)
                acc = acc + data[6:14, :] @ w
                tcar = tcar * np.exp(l1m.sum(0, keepdims=True))
            res[t, 0:8] = acc
            res[t, 8:9] = tcar
        return res

    expected = ref()
    err = np.abs(out - expected).max()
    print("max err vs numpy:", err)
    assert err < 1e-3, "MISMATCH"
    print("PROBE OK")


run()
