"""Round-5 probe: the binning sort split into K independent band sorts.

lax.sort is strongly superlinear in row length (measured round 2-4:
~10 ns/entry for the 12-operand sort at 4.7M, 5.7 ns/entry for 590k
unrolled slices). Tiles in disjoint horizontal screen bands are
independent — per-band (tile, depth) sorts concatenated in band order
ARE the global tile order — so binning can ride the short-sort rate
with zero new kernels. This probe measures the 12-operand sort cost at
the bench shape (4.72M slots) as K unrolled band sorts, K in {1, 2, 4,
8, 16}, plus the batched-dimension variant for reference.

Run on the axon TPU: python scratch/probe_band_sort_r5.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.utils.profiling import time_fn_device

M = 4_718_592
N_OPS = 12  # 2 keys + 10 payloads, the binning sort shape


def main():
    key = jax.random.PRNGKey(0)

    def make_ops(s, m):
        # fresh pseudo-random keys each rep via the seed so nothing memoizes
        base = jax.random.uniform(key, (m,), jnp.float32)
        k0 = jnp.floor((base + s * 1e-3) % 1.0 * 8160.0)
        rest = [jnp.sin(base * (i + 2.0) + s) for i in range(N_OPS - 1)]
        return (k0,) + tuple(rest)

    for K in (1, 2, 4, 8, 16):
        m = M // K

        def fn(s, K=K, m=m):
            outs = []
            for i in range(K):
                ops = make_ops(s + i, m)
                # Return EVERY sorted operand: consuming only the key lets
                # XLA skip applying the permutation to the 11 payloads,
                # which is most of the cost (first probe version measured
                # 17 ms for the known-54 ms flat sort this way).
                outs.extend(jax.lax.sort(ops, num_keys=2))
            return outs

        t = time_fn_device(fn, reps=4)
        print(f"K={K:3d} unrolled sorts of {m}: {t*1e3:8.2f} ms "
              f"({t/M*1e9:5.2f} ns/entry)")

    for B in (8, 64, 256):
        m = M // B

        def fnb(s, B=B, m=m):
            base = jax.random.uniform(key, (B, m), jnp.float32)
            k0 = jnp.floor((base + s * 1e-3) % 1.0 * 8160.0)
            rest = [jnp.sin(base * (i + 2.0) + s) for i in range(N_OPS - 1)]
            return jax.lax.sort((k0,) + tuple(rest), num_keys=2,
                                dimension=1)

        t = time_fn_device(fnb, reps=4)
        print(f"B={B:3d} batched  rows of {m}: {t*1e3:8.2f} ms "
              f"({t/M*1e9:5.2f} ns/entry)")


if __name__ == "__main__":
    main()
