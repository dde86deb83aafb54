#!/bin/bash
# Phase 15: rebuild the reachao_rand_start record holders and go past 0.72.
# The 0.72/0.15 record is the 3-seed Bayesian fusion of the direct-recipe
# specialists (ft8/ft10/ft11: reachao_rand -> reachao_rand_start, 700k/stage,
# coll -200), whose checkpoints were lost to the round-1 filesystem reset.
# Rebuild all three under their original names (benchmark_rebuild.json
# convention), re-measure the 3-seed fusion, then try mixed fusions with the
# phase-13 pose-curriculum seeds — member diversity is what lifts fusions,
# and the two families were trained along different curriculum axes.
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign
RD=training/run_data/$GROUP
BASE=$RD/tqc_base

direct () { # name seed
  local name=$1 seed=$2
  echo "=== phase15 rebuild $name (direct recipe, seed=$seed) ==="
  python tools/train.py \
    --stages reachao_rand reachao_rand_start \
    --success-thresholds 0.85 1.0 --max-ep-steps 100 100 \
    --max-timesteps 700000 --n-envs 64 --seed $seed \
    --obs-max-distance 2.0 --collision-reward -200 \
    --group $GROUP --name $name \
    --resume $BASE/final.ckpt --no-resume-buffer 2>&1 | tail -4
  timeout 3600 python tools/evaluate.py $RD/$name \
    --scenarios reachao_rand_start --episodes 100 \
    --out $RD/$name/benchmark_rebuild 2>&1 | tail -2
}

direct tqc_ft8_reachao_rand_start 0
direct tqc_ft10_rand_start_s1 1
direct tqc_ft11_rand_start_s2 2

fuse () { # out members...
  local out=$1; shift
  timeout 3600 python tools/evaluate.py "$@" \
    --scenarios reachao_rand_start --episodes 100 --strategy bayesian_fusion \
    --out $RD/tqc_ft8_reachao_rand_start/$out 2>&1 | tail -2
}

echo "=== phase15 fusions ==="
# re-measure the record 3-seed direct fusion on the rebuilt members
fuse benchmark_ens_3seeds_rebuild \
  $RD/tqc_ft8_reachao_rand_start $RD/tqc_ft10_rand_start_s1 \
  $RD/tqc_ft11_rand_start_s2
# mixed families: 3 direct + best pose-curriculum seed
fuse benchmark_ens_mixed4 \
  $RD/tqc_ft8_reachao_rand_start $RD/tqc_ft10_rand_start_s1 \
  $RD/tqc_ft11_rand_start_s2 $RD/tqc_ft13_rand_start_pc
# mixed families: 3 direct + 3 pose-curriculum
fuse benchmark_ens_mixed6 \
  $RD/tqc_ft8_reachao_rand_start $RD/tqc_ft10_rand_start_s1 \
  $RD/tqc_ft11_rand_start_s2 $RD/tqc_ft13_rand_start_pc \
  $RD/tqc_ft13_rand_start_pc_s1 $RD/tqc_ft13_rand_start_pc_s2

python tools/summarize_campaign.py $RD
echo "=== phase15 done ==="
