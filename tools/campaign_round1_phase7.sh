#!/bin/bash
# Phase 7: per-scene fine-tunes for the remaining mid-tier benchmark scenes
# (the reference's train_benchmark_scenarios pass, train.py:66-93), with the
# obs distance cap (helps the randomized scenes, whose far-teleported
# inactive obstacles otherwise feed ~170-valued distances into the net).
# Each run benchmarks only its target scene: the campaign summarizer lets a
# fine-tune claim only the scene(s) it trained on, so the other 12 rows
# would be dead weight on the single chip.
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign
BASE=training/run_data/$GROUP/tqc_base

SCENES="${SCENES:-reachao2 reachao3 wangexp-3 reachao_rand reachao_rand_start library2 workshop}"

for scene in $SCENES; do
  name=tqc_ft7_$(echo "$scene" | tr '-' '_')
  echo "=== phase7 finetune $scene ==="
  python tools/train.py \
    --stages $scene --max-ep-steps 100 --success-thresholds 1.0 \
    --max-timesteps 300000 --n-envs 64 --seed 0 \
    --obs-max-distance 2.0 \
    --group $GROUP --name $name \
    --resume $BASE/final.ckpt --no-resume-buffer \
    2>&1 | tail -8
  timeout 3600 python tools/evaluate.py training/run_data/$GROUP/$name \
    --scenarios $scene --episodes 100 \
    --out training/run_data/$GROUP/$name/benchmark 2>&1 | tail -3
done
python tools/summarize_campaign.py training/run_data/$GROUP
echo "=== phase7 done ==="
