#!/bin/bash
# Phase 2: scenes where sparse fine-tuning fails (insta-collision scenes).
# Recipe: dense kumar reward (exp distance + effort + obstacle penalty gives
# a collision-avoidance gradient) + NEO-prior replay bootstrap (safe,
# non-colliding transitions), resumed from the generalist.
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign
BASE=training/run_data/$GROUP/tqc_base

for scene in "$@"; do
  echo "=== phase2 finetune $scene (kumar + prior) ==="
  python tools/train.py \
    --stages $scene --max-ep-steps 100 --success-thresholds 1.0 \
    --max-timesteps 400000 --n-envs 64 --seed 0 \
    --reward-type kumar --prior-steps 20000 \
    --group $GROUP --name tqc_ft2_$scene \
    --resume $BASE/final.ckpt --no-resume-buffer --benchmark \
    2>&1 | tail -12
done
echo "=== phase2 done ==="
