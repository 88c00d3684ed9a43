"""Round-5 probe: AOT HBM footprint of the train step at the EXACT shape
that OOM'd the round-4 config-4 run (scratch/r4_runs/config4.err).

The crashed compile: capacity 1,001,472 (the 1M-cap growth step), batch 4
at 1920x1080, sh_degree 0, pallas backend, max_tiles=32 with the
rebudgeted class budgets from the crash log, reduce_slices=4. It needed
16.77G of 15.75G HBM, with ~8.6G of that in (N,3,3) temps padded 56.9x
by the T(4,128) layout and more in 42.7x-padded (N,3) temps.

This probe AOT-compiles the same step (no execution, so it runs even
when the chip is busy) and prints the compiler's memory analysis. Run on
the axon TPU terminal:  python scratch/probe_hbm_1m_r5.py [capacity]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.models.gaussians import GaussianParams, GaussianState
from gaussian_splatting_tpu.training.config import TrainingConfig
from gaussian_splatting_tpu.training.optimizer import AdamState
from gaussian_splatting_tpu.training.step import TrainState, ViewBatch, make_train_step

CAP = int(sys.argv[1]) if len(sys.argv) > 1 else 1_001_472
W, H, B = 1920, 1080, 4
BUDGETS = (7296, 42624, 2176, 286976, 214144, 9600, 248832, 63488, 42112, 57088)


def sds(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


def main():
    cfg = TrainingConfig(
        batch_size=B, backend="pallas",
        max_tiles_per_gaussian=32, class_budgets=BUDGETS,
        reduce_slices=4, sh_degree_max=0,
    )
    params = GaussianParams(
        means=sds((CAP, 3)), quats=sds((CAP, 4)), log_scales=sds((CAP, 3)),
        logit_opacities=sds((CAP, 1)), features_dc=sds((CAP, 1, 3)),
        features_rest=sds((CAP, 15, 3)),
    )
    zeros_like = jax.tree_util.tree_map(lambda x: sds(x.shape, x.dtype), params)
    state = TrainState(
        gauss=GaussianState(
            params=params, alive=sds((CAP,), jnp.bool_),
            xyz_grad_accum=sds((CAP, 3)), xyz_grad_count=sds((CAP, 1)),
            max_radii2d=sds((CAP,), jnp.int32),
        ),
        opt=AdamState(mu=zeros_like, nu=zeros_like, step=sds((), jnp.int32)),
        iteration=sds((), jnp.int32),
        poses=None,
    )
    batch = ViewBatch(
        images=sds((B, H, W, 3)), viewmats=sds((B, 4, 4)), Ks=sds((B, 3, 3)),
        view_idx=sds((B,), jnp.int32),
    )
    step = make_train_step(cfg, W, H, sh_degree=0, backend="pallas",
                           scene_extent=2.4, donate=True)
    print(f"lowering train step at capacity {CAP}...", file=sys.stderr)
    lowered = step.lower(state, batch)
    print("compiling (AOT)...", file=sys.stderr)
    compiled = lowered.compile()
    try:
        ma = compiled.memory_analysis()
        print("memory analysis:", ma)
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "alias_size_in_bytes",
                  "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                print(f"  {k}: {v/2**30:.3f} GiB")
    except Exception as e:
        print("memory_analysis unavailable:", e)
    print("COMPILE OK at capacity", CAP)


if __name__ == "__main__":
    main()
