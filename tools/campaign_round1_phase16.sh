#!/bin/bash
# Phase 16: reachao_rand_start past 0.75.
# Phase 13 showed (a) large seed variance in the pose-prob curriculum
# (0.60/0.75/0.61), (b) Bayesian fusion there trades collisions for
# timeouts and lands BELOW the best solo.  So:
#   1. eval-only: decisive fusion strategies (confidence picks one
#      member's action per step; weighted_aggregation/mean as controls)
#      over the seed pool — cheap, no training;
#   2. two more curriculum seeds with double the final-stage budget
#      (500k; phase-13 stages always exhausted 250k without reaching
#      thresholds, so the budget — not the curriculum — was binding);
#   3. fusion sweep over the enlarged pool, keep the best.
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign
RD=training/run_data/$GROUP
PC=$RD/tqc_ft13_rand_start_pc

fuse () { # out strategy members...
  local out=$1 strat=$2; shift 2
  timeout 3600 python tools/evaluate.py "$@" \
    --scenarios reachao_rand_start --episodes 100 --strategy $strat \
    --out $PC/$out 2>&1 | tail -2
}

echo "=== phase16 eval-only fusion-strategy sweep (phase-13 seeds) ==="
fuse benchmark_ens_s01_conf confidence          $PC $PC"_s1"
fuse benchmark_ens_x3_conf  confidence          $PC $PC"_s1" $PC"_s2"
fuse benchmark_ens_x3_wa    weighted_aggregation $PC $PC"_s1" $PC"_s2"
fuse benchmark_ens_x3_mean  mean                $PC $PC"_s1" $PC"_s2"

long_pc () { # name seed
  local name=$1 seed=$2
  echo "=== phase16 $name (pose-prob curriculum, 500k final stage, seed=$seed) ==="
  python tools/train.py \
    --stages reachao_rand_start_p50 reachao_rand_start \
    --success-thresholds 0.9 1.0 --max-ep-steps 100 100 \
    --max-timesteps 500000 --n-envs 64 --seed $seed \
    --obs-max-distance 2.0 --collision-reward -200 \
    --group $GROUP --name $name \
    --resume $RD/tqc_ft9_reachao_rand/final.ckpt --no-resume-buffer \
    2>&1 | tail -4
  timeout 3600 python tools/evaluate.py $RD/$name \
    --scenarios reachao_rand_start --episodes 100 \
    --out $RD/$name/benchmark 2>&1 | tail -2
}

long_pc tqc_ft16_rand_start_pc_s3 3
long_pc tqc_ft16_rand_start_pc_s4 4

echo "=== phase16 enlarged-pool fusions ==="
fuse benchmark_ens_pool_conf confidence \
  $PC"_s1" $RD/tqc_ft16_rand_start_pc_s3 $RD/tqc_ft16_rand_start_pc_s4
fuse benchmark_ens_pool_bayes bayesian_fusion \
  $PC"_s1" $RD/tqc_ft16_rand_start_pc_s3 $RD/tqc_ft16_rand_start_pc_s4

python tools/summarize_campaign.py $RD
echo "=== phase16 done ==="
