#!/bin/bash
# Phase 10: hardest-scene push via ensemble diversity. A second-seed
# rand_start specialist (same recipe as ft8, seed 1) gives a genuinely
# decorrelated member; then sweep member sets and fusion strategies.
# Plus: library1 cross-scene ensemble probe.
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign
RD=training/run_data/$GROUP

echo "=== phase10 finetune rand_start seed=1 ==="
python tools/train.py \
  --stages reachao_rand reachao_rand_start --success-thresholds 0.85 1.0 \
  --max-ep-steps 100 100 --max-timesteps 700000 --n-envs 64 --seed 1 \
  --obs-max-distance 2.0 --collision-reward -200 \
  --group $GROUP --name tqc_ft10_rand_start_s1 \
  --resume $RD/tqc_ft7_reachao_rand/best_model.ckpt --no-resume-buffer \
  2>&1 | tail -6
timeout 3600 python tools/evaluate.py $RD/tqc_ft10_rand_start_s1 \
  --scenarios reachao_rand_start --episodes 100 \
  --out $RD/tqc_ft10_rand_start_s1/benchmark 2>&1 | tail -3

echo "=== phase10 rand_start ensemble sweeps ==="
# 3 diverse members (two seeds + ft7)
timeout 3600 python tools/evaluate.py \
  $RD/tqc_ft8_reachao_rand_start $RD/tqc_ft10_rand_start_s1 \
  $RD/tqc_ft7_reachao_rand_start \
  --scenarios reachao_rand_start --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft8_reachao_rand_start/benchmark_ens_s1 2>&1 | tail -2
# 4 members incl. the rand specialist
timeout 3600 python tools/evaluate.py \
  $RD/tqc_ft8_reachao_rand_start $RD/tqc_ft10_rand_start_s1 \
  $RD/tqc_ft7_reachao_rand_start $RD/tqc_ft9_reachao_rand \
  --scenarios reachao_rand_start --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft8_reachao_rand_start/benchmark_ens_s1x4 2>&1 | tail -2
# alternative fusion on the best phase-9 member set
timeout 3600 python tools/evaluate.py \
  $RD/tqc_ft8_reachao_rand_start $RD/tqc_ft7_reachao_rand_start \
  $RD/tqc_ft9_reachao_rand \
  --scenarios reachao_rand_start --episodes 100 \
  --strategy weighted_aggregation \
  --out $RD/tqc_ft8_reachao_rand_start/benchmark_ens_wa 2>&1 | tail -2

echo "=== phase10 library1 cross-scene ensemble probe ==="
timeout 3600 python tools/evaluate.py \
  $RD/tqc_ft3_library1 $RD/tqc_ft7_library2 \
  --scenarios library1 --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft3_library1/benchmark_ens 2>&1 | tail -2

python tools/summarize_campaign.py $RD
echo "=== phase10 done ==="
