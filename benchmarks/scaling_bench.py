"""Multi-chip scaling harness — BASELINE config 5 scaffolding.

Measures the sharded train step's wall time across mesh shapes. On a real
multi-chip slice this yields true scaling efficiency; on a single chip or
virtual CPU devices it validates the sharded path end-to-end and reports the
(meaningless for speed, meaningful for correctness) timings.

Run: python benchmarks/scaling_bench.py [n_gaussians] [side]
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/scaling_bench.py 8192 128   # virtual-mesh validation

Multi-host (config 5, 1 -> N hosts over DCN): launch the same command on
every host with --multihost (or MULTIHOST=1) and the standard coordinator
env vars (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID; auto-detected on
TPU pods) — jax.devices() then spans hosts and the mesh shapes below cover
the global device count.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    args = [a for a in sys.argv[1:] if a != "--multihost"]
    only_shapes = None
    if "--shapes" in args:
        # Restrict to named mesh shapes, e.g. --shapes 2x4 (comma-separated):
        # the multi-host test runs one shape to keep CI wall-clock bounded.
        i = args.index("--shapes")
        only_shapes = {tuple(map(int, s.split("x")))
                       for s in args[i + 1].split(",")}
        del args[i:i + 2]
    if "--virtual" in args:
        # Self-contained virtual-mesh mode (CI): N host CPU devices,
        # no env wrangling needed. Must run before jax imports.
        i = args.index("--virtual")
        n_virt = int(args[i + 1])
        del args[i:i + 2]
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_virt}")
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    n = int(args[0]) if len(args) > 0 else 65536
    side = int(args[1]) if len(args) > 1 else 256

    if "--multihost" in sys.argv or os.environ.get("MULTIHOST"):
        from gaussian_splatting_tpu.parallel.mesh import init_multihost

        init_multihost()

    import jax
    import jax.numpy as jnp

    import jax

    if jax.default_backend() == "tpu":
        # The persistent cache is keyed loosely enough that CPU AOT loads
        # can pick up machine-mismatched blobs (observed: a stale entry
        # deadlocked the 8-virtual-device collectives) — TPU only.
        from gaussian_splatting_tpu.utils.cache import enable_compile_cache

        enable_compile_cache()

    from gaussian_splatting_tpu.models.gaussians import init_from_points
    from gaussian_splatting_tpu.parallel.mesh import make_mesh
    from gaussian_splatting_tpu.parallel.sharded_step import (
        make_sharded_train_step,
        pad_images_for_bands,
    )
    from gaussian_splatting_tpu.training.config import TrainingConfig
    from gaussian_splatting_tpu.training.optimizer import adam_init
    from gaussian_splatting_tpu.training.step import TrainState, ViewBatch

    n_dev = len(jax.devices())
    backend = "pallas" if jax.default_backend() == "tpu" else "ref"
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n, 3)).astype(np.float32)

    shapes = []
    d = 1
    while d <= n_dev:
        m = n_dev // d
        if d * m == n_dev and (only_shapes is None or (d, m) in only_shapes):
            shapes.append((d, m))
        d *= 2
    results = []
    base_time = None
    for (d, m) in shapes:
        C = ((n + 2047) // 2048) * 2048
        if C % m:
            C += m - C % m
        gauss = init_from_points(pts, None, n, capacity=C)
        state = TrainState(gauss=gauss, opt=adam_init(gauss.params),
                           iteration=jnp.zeros((), jnp.int32))
        B = 2 * d
        cfg = TrainingConfig(batch_size=B, backend=backend)
        mesh = make_mesh(data=d, model=m)
        step, band_h, h_pad = make_sharded_train_step(
            cfg, mesh, side, side, 0, backend, 2.0, donate=False)
        images = jnp.asarray(rng.uniform(size=(B, side, side, 3)), jnp.float32)
        vm = jnp.tile(jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)[None], (B, 1, 1))
        K = jnp.tile(jnp.asarray(
            [[side * 1.1, 0, side / 2], [0, side * 1.1, side / 2], [0, 0, 1]],
            jnp.float32)[None], (B, 1, 1))
        batch = ViewBatch(images=pad_images_for_bands(images, h_pad),
                          viewmats=vm, Ks=K)
        state, metrics = step(state, batch)   # compile
        jax.block_until_ready(metrics["loss"])
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            state, metrics = step(state, batch)
        jax.block_until_ready(metrics["loss"])
        dt = (time.time() - t0) / reps
        if base_time is None:
            base_time = dt
        results.append({
            "mesh": f"{d}x{m}", "batch": B, "step_ms": round(dt * 1e3, 1),
            "efficiency_vs_first": round(base_time / dt, 3),
        })
        print(f"mesh {d}x{m}: {dt*1e3:.1f} ms/step", file=sys.stderr)

    print(json.dumps({
        "metric": "sharded_step_scaling", "devices": n_dev,
        "platform": jax.default_backend(), "results": results,
    }))


if __name__ == "__main__":
    main()
