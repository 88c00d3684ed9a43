#!/bin/bash
# Round-4 hardware quality/scale runs (VERDICT #2, #3, #4), sequenced so
# they never contend for the single chip. Each writes a JSON log under
# scratch/r4_runs/. Fire-and-forget: bash scratch/run_quality_r4.sh &
set -u
cd /root/repo
mkdir -p scratch/r4_runs

echo "[$(date +%H:%M:%S)] pose-refine experiment: 6000 iters, poses ON"
timeout 10800 python benchmarks/train_synthetic_tpu.py 6000 --poses \
    > scratch/r4_runs/pose_on.json 2> scratch/r4_runs/pose_on.err
echo "[$(date +%H:%M:%S)] pose-refine control: 6000 iters, poses OFF"
timeout 10800 python benchmarks/train_synthetic_tpu.py 6000 \
    > scratch/r4_runs/pose_off.json 2> scratch/r4_runs/pose_off.err

echo "[$(date +%H:%M:%S)] config 3: 1080p video -> SfM -> 500k, 2000 iters"
timeout 14400 python benchmarks/config3_e2e_tpu.py 2000 \
    > scratch/r4_runs/config3.json 2> scratch/r4_runs/config3.err

echo "[$(date +%H:%M:%S)] config 4: densify to 1M alive"
# n_init 760k, topk 0.05, densify every 100 from step 150: reaches 1M
# within ~6 events (~750 steps); 1000 steps leaves trend room.
timeout 10800 python benchmarks/densify_scale_tpu.py 1000 1100000 1.0 0.05 760000 150 \
    > scratch/r4_runs/densify1m.json 2> scratch/r4_runs/densify1m.err
echo "[$(date +%H:%M:%S)] all done"
