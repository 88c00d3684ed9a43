#!/usr/bin/env bash
# TPU training launcher — counterpart of the reference's slurm/train.sbatch
# (env-var parameterized, reference train.sbatch:24-54). Works on a TPU VM
# directly or under any scheduler that execs a shell on the host.
#
# Env knobs (defaults mirror the reference where applicable):
#   VIDEOS          space-separated input videos (required)
#   OUTPUT          output dir                     (default runs/$(date))
#   ITERATIONS      total train iterations         (default 300000)
#   BATCH_SIZE      views per step                 (default 4)
#   FRAME_STRIDE    SfM frame stride               (default 30)
#   INITIAL_GAUSSIANS / MAX_GAUSSIANS
#   FOCAL_35MM      35mm-equivalent focal prior    (reference sbatch default 24;
#                   unset -> the 1.2*max(W,H) heuristic)
#   MATCHER         sift | orb                     (default sift)
#   MESH_DATA / MESH_MODEL   device-mesh axes for multi-chip runs
#   RESUME          checkpoint .npz to resume from
set -euo pipefail

: "${VIDEOS:?set VIDEOS to one or more video paths}"
OUTPUT="${OUTPUT:-runs/$(date +%Y%m%d_%H%M%S)}"

args=(
  --videos ${VIDEOS}
  --output "${OUTPUT}"
  --iterations "${ITERATIONS:-300000}"
  --batch-size "${BATCH_SIZE:-4}"
  --frame-stride "${FRAME_STRIDE:-30}"
  --matcher "${MATCHER:-sift}"
)
[[ -n "${INITIAL_GAUSSIANS:-}" ]] && args+=(--initial-gaussians "${INITIAL_GAUSSIANS}")
[[ -n "${MAX_GAUSSIANS:-}" ]] && args+=(--max-gaussians "${MAX_GAUSSIANS}")
# Focal sentinel subtlety mirrored from the reference sbatch (:45-54):
# FOCAL_35MM="" means "use the pixel heuristic", unset means default prior.
if [[ -n "${FOCAL_35MM+x}" && -n "${FOCAL_35MM}" ]]; then
  args+=(--focal-35mm "${FOCAL_35MM}")
fi
[[ -n "${FOCAL_PX:-}" ]] && args+=(--focal-px "${FOCAL_PX}")
[[ -n "${MESH_DATA:-}" ]] && args+=(--mesh-data "${MESH_DATA}")
[[ -n "${MESH_MODEL:-}" ]] && args+=(--mesh-model "${MESH_MODEL}")
[[ -n "${RESUME:-}" ]] && args+=(--resume "${RESUME}")

mkdir -p "${OUTPUT}"
echo "launching: python -m gaussian_splatting_tpu.train_cli ${args[*]}"
exec python -m gaussian_splatting_tpu.train_cli "${args[@]}" 2>&1 | tee "${OUTPUT}/train.log"
