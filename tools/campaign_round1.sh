#!/bin/bash
# Round-1 training campaign: generalist curriculum + per-scene fine-tunes.
# Sequential — one TPU chip. Artifacts under training/run_data/round1_campaign/.
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign
BASE=training/run_data/$GROUP/tqc_base

echo "=== base generalist ==="
python tools/train.py \
  --stages reachao1 reachao2 reachao3 wangexp_3 \
  --success-thresholds 0.9 0.9 0.9 1.0 \
  --max-ep-steps 50 75 100 100 \
  --max-timesteps 600000 --n-envs 64 --seed 0 \
  --group $GROUP --name tqc_base --benchmark \
  2>&1 | tail -30

for scene in narrow_tunnel tunnel wall industrial library1 library2 workshop workshop2; do
  echo "=== finetune $scene ==="
  python tools/train.py \
    --stages $scene --max-ep-steps 100 --success-thresholds 1.0 \
    --max-timesteps 400000 --n-envs 64 --seed 0 \
    --group $GROUP --name tqc_ft_$scene \
    --resume $BASE/final.ckpt --no-resume-buffer --benchmark \
    2>&1 | tail -15
done
echo "=== campaign done ==="
