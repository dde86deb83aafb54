#!/bin/bash
# Phase 6: wall curriculum, stages 2-3.  Resumes from the phase-5 best
# (0.82 eval success on wall_h1) and raises the wall: h22 (top 0.32, just
# past the blindness band that made h2's top 0.3 start in instant
# collision), then the canonical wall (top 0.4).
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign

python tools/train.py \
  --stages wall_h22 wall --max-ep-steps 100 100 \
  --success-thresholds 0.8 1.0 \
  --max-timesteps 600000 --n-envs 64 --seed 0 \
  --obs-max-distance 2.0 \
  --group $GROUP --name tqc_ft6_wall \
  --resume training/run_data/$GROUP/tqc_ft5_wall/best_model.ckpt \
  --no-resume-buffer --benchmark \
  2>&1 | tail -15
echo "=== phase6 done ==="
