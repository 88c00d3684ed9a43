"""In-situ reduce_padded_grads cost vs sort_slices K at the bench shape.

Run: python scratch/probe_reduce_slices.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.ops.tiling import reduce_padded_grads
from gaussian_splatting_tpu.utils.cache import enable_compile_cache
from gaussian_splatting_tpu.utils.profiling import time_fn_device

enable_compile_cache()
rng = np.random.default_rng(0)

N = 1_000_000
pcap = 4_082_176  # bench grad_cap at frac 0.865 (chunk-aligned, %16 == 0)
n_written = 3_779_328

grads = np.zeros((16, pcap), np.float32)
grads[0, :n_written] = rng.integers(0, N, size=(n_written,))
grads[0, n_written:] = float(N)
grads[1:11, :n_written] = rng.normal(size=(10, n_written)).astype(np.float32)
gj = jnp.asarray(grads)
nw = jnp.int32(n_written)

for K in (0, 4, 8, 16):
    def f(s, g, K=K):
        g = g.at[1].mul(1.0 + (s - 1.0) * 1e-9)
        return reduce_padded_grads(g, N, nw, with_depth=False,
                                   sort_slices=K, interpret=False)
    dt = time_fn_device(f, (gj,), reps=6)
    print(f"reduce K={K}: {dt*1e3:6.1f} ms", flush=True)
