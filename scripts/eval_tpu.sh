#!/usr/bin/env bash
# Eval launcher — counterpart of slurm/eval.sbatch: auto-discovers the latest
# run when MODEL is not given (reference eval.sbatch:33-39).
set -euo pipefail

: "${VIDEOS:?set VIDEOS to the source video paths}"
if [[ -z "${MODEL:-}" ]]; then
  MODEL=$(ls -t runs/*/final.npz runs/*/checkpoint_*.npz 2>/dev/null | head -1 || true)
  [[ -n "${MODEL}" ]] || { echo "no checkpoint found under runs/"; exit 1; }
  echo "auto-discovered model: ${MODEL}"
fi
OUTPUT="${OUTPUT:-$(dirname "${MODEL}")/eval}"

exec python -m gaussian_splatting_tpu.eval_cli \
  --model "${MODEL}" \
  --videos ${VIDEOS} \
  --output "${OUTPUT}" \
  --num-views "${NUM_VIEWS:-12}" \
  --frame-stride "${FRAME_STRIDE:-30}"
