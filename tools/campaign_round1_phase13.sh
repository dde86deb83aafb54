#!/bin/bash
# Phase 13: attack the reachao_rand_start ceiling (best 0.72/0.15, NEO prior
# solo 0.33/0.03) with the new start-pose-probability curriculum axis
# (`<scene>_pNN`, reach_ao.py get_scenario): train with an increasing
# fraction of randomized start poses instead of jumping straight from the
# neutral-start scene to 100% randomized starts, mirroring how the wall
# scene was solved with the obstacle-height (`wall_h*`) curriculum.
# Two seeds for a same-scene ensemble, then Bayesian fusion with the best
# prior specialist (ft8).
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign
RD=training/run_data/$GROUP

pose_curriculum () { # name seed
  local name=$1 seed=$2
  echo "=== phase13 $name (pose-prob curriculum, seed=$seed) ==="
  python tools/train.py \
    --stages reachao_rand_start_p25 reachao_rand_start_p50 \
             reachao_rand_start_p75 reachao_rand_start \
    --success-thresholds 0.9 0.9 0.85 1.0 \
    --max-ep-steps 100 100 100 100 \
    --max-timesteps 250000 --n-envs 64 --seed $seed \
    --obs-max-distance 2.0 --collision-reward -200 \
    --group $GROUP --name $name \
    --resume $RD/tqc_ft9_reachao_rand/final.ckpt --no-resume-buffer \
    2>&1 | tail -6
  timeout 3600 python tools/evaluate.py $RD/$name \
    --scenarios reachao_rand_start --episodes 100 \
    --out $RD/$name/benchmark 2>&1 | tail -2
}

pose_curriculum tqc_ft13_rand_start_pc 0
pose_curriculum tqc_ft13_rand_start_pc_s1 1
pose_curriculum tqc_ft13_rand_start_pc_s2 2

echo "=== phase13 ensembles ==="
timeout 3600 python tools/evaluate.py \
  $RD/tqc_ft13_rand_start_pc $RD/tqc_ft13_rand_start_pc_s1 \
  --scenarios reachao_rand_start --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft13_rand_start_pc/benchmark_ens_s01 2>&1 | tail -2
timeout 3600 python tools/evaluate.py \
  $RD/tqc_ft13_rand_start_pc $RD/tqc_ft13_rand_start_pc_s1 \
  $RD/tqc_ft13_rand_start_pc_s2 \
  --scenarios reachao_rand_start --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft13_rand_start_pc/benchmark_ens_x3 2>&1 | tail -2

python tools/summarize_campaign.py $RD
echo "=== phase13 done ==="
