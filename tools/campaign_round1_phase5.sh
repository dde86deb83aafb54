#!/bin/bash
# Phase 5: the wall scene via an obstacle-height curriculum.
# Random-start (phase 3) fails here: IK'd goal-side starts leave the arm
# wrapped ~5 cm from the wall, so ~100% of training episodes collide within
# a few steps, and the NEO prior is trapped in the local minimum behind the
# wall (0% success, 100% timeout).  Instead curriculum over the obstacle:
# stage 1 trains with a low wall (z half-extent 0.1, easy arc-over from the
# canonical fixed start), stage 2 raises it to 0.2, stage 3 is canonical.
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign
BASE=training/run_data/$GROUP/tqc_base

python tools/train.py \
  --stages wall_h1 wall_h2 wall --max-ep-steps 100 100 100 \
  --success-thresholds 0.8 0.8 1.0 \
  --max-timesteps 700000 --n-envs 64 --seed 0 \
  --obs-max-distance 2.0 \
  --group $GROUP --name tqc_ft5_wall \
  --resume $BASE/final.ckpt --no-resume-buffer --benchmark \
  2>&1 | tail -15
echo "=== phase5 done ==="
