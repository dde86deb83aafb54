#!/bin/bash
# Phase 9: propagate the phase-8 finding — a stiffer collision penalty
# (-200, inside the reference sweep's -25..-500 range) fine-tuned from the
# base generalist lifted reachao2 from 0.84 to 0.94/0.05 — to the remaining
# scenes whose failure mode is collisions: reachao3/wangexp-3 (0.87/0.11)
# and reachao_rand (0.79/0.19).  Plus eval-only experiments on the hardest
# scene (reachao_rand_start): 2-member ensemble fusion and a BCF
# prior-confidence sweep.
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign
RD=training/run_data/$GROUP
BASE=$RD/tqc_base

# 1. reachao3 + wangexp-3 (functionally the same scene under default config;
#    one staged run claims both in the campaign summary).
echo "=== phase9 finetune reachao3/wangexp-3 ==="
python tools/train.py \
  --stages reachao3 wangexp-3 --success-thresholds 0.95 1.0 \
  --max-ep-steps 100 100 --max-timesteps 400000 --n-envs 64 --seed 0 \
  --obs-max-distance 2.0 --collision-reward -200 \
  --group $GROUP --name tqc_ft9_reachao3 \
  --resume $BASE/final.ckpt --no-resume-buffer 2>&1 | tail -6
timeout 3600 python tools/evaluate.py $RD/tqc_ft9_reachao3 \
  --scenarios reachao3 wangexp-3 --episodes 100 \
  --out $RD/tqc_ft9_reachao3/benchmark 2>&1 | tail -4

# 2. reachao_rand from base with the stiff penalty.
echo "=== phase9 finetune reachao_rand ==="
python tools/train.py \
  --stages reachao_rand --success-thresholds 1.0 \
  --max-ep-steps 100 --max-timesteps 500000 --n-envs 64 --seed 0 \
  --obs-max-distance 2.0 --collision-reward -200 \
  --group $GROUP --name tqc_ft9_reachao_rand \
  --resume $BASE/final.ckpt --no-resume-buffer 2>&1 | tail -6
timeout 3600 python tools/evaluate.py $RD/tqc_ft9_reachao_rand \
  --scenarios reachao_rand --episodes 100 \
  --out $RD/tqc_ft9_reachao_rand/benchmark 2>&1 | tail -3

# 3. Eval-only: rand_start ensemble (ft7 + ft8 members, Bayesian fusion).
echo "=== phase9 rand_start ensemble eval ==="
timeout 3600 python tools/evaluate.py \
  $RD/tqc_ft8_reachao_rand_start $RD/tqc_ft7_reachao_rand_start \
  --scenarios reachao_rand_start --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft8_reachao_rand_start/benchmark_ens 2>&1 | tail -3

# 4. Eval-only: BCF prior-confidence sweep on rand_start.
for sigma in 0.15 0.6; do
  echo "=== phase9 BCF sigma=$sigma ==="
  timeout 3600 python tools/evaluate.py $RD/tqc_ft8_reachao_rand_start \
    --scenarios reachao_rand_start --episodes 100 --strategy bcf \
    --prior-sigma $sigma \
    --out $RD/tqc_ft8_reachao_rand_start/benchmark_bcf_$sigma 2>&1 | tail -3
done

python tools/summarize_campaign.py $RD
echo "=== phase9 done ==="
