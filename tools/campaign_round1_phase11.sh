#!/bin/bash
# Phase 11: same-scene seed-diversity ensembles (the phase-9/10 finding:
# 2-3 same-scene specialists fused with Bayesian precision weighting beat
# every solo model; cross-scene members are harmful). Train seed-1 twins of
# the library1 and reachao2 specialists and a seed-2 rand_start twin, then
# fuse per scene.
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign
RD=training/run_data/$GROUP
BASE=$RD/tqc_base

echo "=== phase11 library1 seed=1 ==="
python tools/train.py \
  --stages library1 --success-thresholds 1.0 --max-ep-steps 100 \
  --max-timesteps 400000 --n-envs 64 --seed 1 --obs-max-distance 2.0 \
  --group $GROUP --name tqc_ft11_library1_s1 \
  --resume $BASE/final.ckpt --no-resume-buffer 2>&1 | tail -4
timeout 3600 python tools/evaluate.py $RD/tqc_ft11_library1_s1 \
  --scenarios library1 --episodes 100 \
  --out $RD/tqc_ft11_library1_s1/benchmark 2>&1 | tail -2
timeout 3600 python tools/evaluate.py \
  $RD/tqc_ft3_library1 $RD/tqc_ft11_library1_s1 \
  --scenarios library1 --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft3_library1/benchmark_ens_s1 2>&1 | tail -2

echo "=== phase11 reachao2 seed=1 ==="
python tools/train.py \
  --stages reachao2 --success-thresholds 1.0 --max-ep-steps 100 \
  --max-timesteps 400000 --n-envs 64 --seed 1 \
  --obs-max-distance 2.0 --collision-reward -200 \
  --group $GROUP --name tqc_ft11_reachao2_s1 \
  --resume $BASE/final.ckpt --no-resume-buffer 2>&1 | tail -4
timeout 3600 python tools/evaluate.py $RD/tqc_ft11_reachao2_s1 \
  --scenarios reachao2 --episodes 100 \
  --out $RD/tqc_ft11_reachao2_s1/benchmark 2>&1 | tail -2
timeout 3600 python tools/evaluate.py \
  $RD/tqc_ft8_reachao2 $RD/tqc_ft11_reachao2_s1 \
  --scenarios reachao2 --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft8_reachao2/benchmark_ens_s1 2>&1 | tail -2

echo "=== phase11 rand_start seed=2 ==="
python tools/train.py \
  --stages reachao_rand reachao_rand_start --success-thresholds 0.85 1.0 \
  --max-ep-steps 100 100 --max-timesteps 700000 --n-envs 64 --seed 2 \
  --obs-max-distance 2.0 --collision-reward -200 \
  --group $GROUP --name tqc_ft11_rand_start_s2 \
  --resume $RD/tqc_ft7_reachao_rand/best_model.ckpt --no-resume-buffer \
  2>&1 | tail -4
timeout 3600 python tools/evaluate.py $RD/tqc_ft11_rand_start_s2 \
  --scenarios reachao_rand_start --episodes 100 \
  --out $RD/tqc_ft11_rand_start_s2/benchmark 2>&1 | tail -2
# 5 members: 3 seeds + ft7 + the rand specialist
timeout 3600 python tools/evaluate.py \
  $RD/tqc_ft8_reachao_rand_start $RD/tqc_ft10_rand_start_s1 \
  $RD/tqc_ft11_rand_start_s2 $RD/tqc_ft7_reachao_rand_start \
  $RD/tqc_ft9_reachao_rand \
  --scenarios reachao_rand_start --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft8_reachao_rand_start/benchmark_ens_s2x5 2>&1 | tail -2
# 3 pure rand_start seeds
timeout 3600 python tools/evaluate.py \
  $RD/tqc_ft8_reachao_rand_start $RD/tqc_ft10_rand_start_s1 \
  $RD/tqc_ft11_rand_start_s2 \
  --scenarios reachao_rand_start --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft8_reachao_rand_start/benchmark_ens_3seeds 2>&1 | tail -2

python tools/summarize_campaign.py $RD
echo "=== phase11 done ==="
