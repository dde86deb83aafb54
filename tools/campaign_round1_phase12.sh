#!/bin/bash
# Phase 12: extend the same-scene seed-ensemble recipe to the remaining
# improvable scenes (reachao_rand 0.86, workshop 0.97, reachao1 0.97), and
# measure the NEO analytical prior solo on reachao_rand_start as a
# difficulty reference point for that scene's 0.72 ceiling.
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign
RD=training/run_data/$GROUP
BASE=$RD/tqc_base

train_twin () { # name scene seed extra...
  local name=$1 scene=$2 seed=$3; shift 3
  echo "=== phase12 $name ($scene seed=$seed) ==="
  python tools/train.py \
    --stages $scene --success-thresholds 1.0 --max-ep-steps 100 \
    --max-timesteps 400000 --n-envs 64 --seed $seed --obs-max-distance 2.0 \
    "$@" --group $GROUP --name $name \
    --resume $BASE/final.ckpt --no-resume-buffer 2>&1 | tail -4
  timeout 3600 python tools/evaluate.py $RD/$name \
    --scenarios $scene --episodes 100 --out $RD/$name/benchmark 2>&1 | tail -2
}

train_twin tqc_ft12_reachao_rand_s1 reachao_rand 1 --collision-reward -200
timeout 3600 python tools/evaluate.py \
  $RD/tqc_ft9_reachao_rand $RD/tqc_ft12_reachao_rand_s1 $RD/tqc_ft7_reachao_rand \
  --scenarios reachao_rand --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft9_reachao_rand/benchmark_ens_s1x3 2>&1 | tail -2

train_twin tqc_ft12_workshop_s1 workshop 1
timeout 3600 python tools/evaluate.py \
  $RD/tqc_ft7_workshop $RD/tqc_ft12_workshop_s1 \
  --scenarios workshop --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft7_workshop/benchmark_ens_s1 2>&1 | tail -2

train_twin tqc_ft12_reachao1_s1 reachao1 1
timeout 3600 python tools/evaluate.py \
  $RD/tqc_ft4_reachao1 $RD/tqc_ft12_reachao1_s1 \
  --scenarios reachao1 --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft4_reachao1/benchmark_ens_s1 2>&1 | tail -2

echo "=== phase12 NEO prior solo on rand_start (difficulty reference) ==="
timeout 3600 python tools/evaluate.py \
  --scenarios reachao_rand_start --episodes 100 --strategy prior \
  --out $RD/neo_prior_rand_start 2>&1 | tail -2

python tools/summarize_campaign.py $RD
echo "=== phase12 done ==="
