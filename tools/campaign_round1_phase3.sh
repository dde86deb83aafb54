#!/bin/bash
# Phase 3: scenes whose fixed start pose defeats exploration (tunnel,
# library1, wall).  Recipe: two-stage curriculum — stage 1 trains on the
# <scene>_rs random-start variant (start pose IK'd into the scene's goal
# region, the trick the reference hand-writes for narrow_tunnel/industrial,
# reach_ao.py:310-317,395-400), stage 2 the canonical scene.  Sparse reward
# + HER, resumed from the generalist; benchmark uses the canonical scene.
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign
BASE=training/run_data/$GROUP/tqc_base

for scene in "$@"; do
  echo "=== phase3 finetune $scene (random-start curriculum) ==="
  python tools/train.py \
    --stages ${scene}_rs $scene --max-ep-steps 100 100 \
    --success-thresholds 0.8 1.0 \
    --max-timesteps 400000 --n-envs 64 --seed 0 \
    --group $GROUP --name tqc_ft3_$scene \
    --resume $BASE/final.ckpt --no-resume-buffer --benchmark \
    2>&1 | tail -15
done
echo "=== phase3 done ==="
