#!/bin/bash
# Phase 5: wall from scratch.  Fine-tuning from the generalist fails here —
# the resumed policy saturates its actions in this layout (mean effort ~9,
# ee speed ~2.7) and never recovers; a fresh policy with the random-start
# curriculum learns the scene directly.
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign

for scene in "$@"; do
  echo "=== phase5 scratch $scene (random-start curriculum) ==="
  python tools/train.py \
    --stages ${scene}_rs $scene --max-ep-steps 100 100 \
    --success-thresholds 0.8 1.0 \
    --max-timesteps 600000 --n-envs 64 --seed 0 \
    --group $GROUP --name tqc_scratch_$scene \
    --benchmark \
    2>&1 | tail -15
done
echo "=== phase5 done ==="
