#!/bin/bash
# Phase 18: safety-distance margin as a NEW diversity family for the two
# weakest scenes. --safety-distance 0.04 treats obstacle clearances
# <= 4 cm as collisions during training only (reference train_config.py
# safety_distance); evaluation stays at 0.0, so the policy learns margin.
# Hypothesis: margin-trained seeds convert collision episodes (0.05 on
# both scenes) into successes, and — per the phase-15 lesson that family
# DIVERSITY drives fusion gains — widen the record fusions:
#   reachao_rand_start 0.77/0.05 (mixed6: 3 direct + 3 pose-curriculum)
#       -> + 2 sd seeds, try mixed7/mixed8
#   reachao_rand       0.88/0.05 (x5 seed fusion)
#       -> + 2 sd seeds, try x6/x7
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign
RD=training/run_data/$GROUP
BASE=$RD/tqc_base

# --- reachao_rand_start sd seeds (ft8 two-stage recipe + margin) ----------
rs_sd () { # name seed
  echo "=== phase18 $1 (rand_start sd=0.04 seed=$2) ==="
  python tools/train.py \
    --stages reachao_rand reachao_rand_start --success-thresholds 0.85 1.0 \
    --max-ep-steps 100 100 --max-timesteps 700000 --n-envs 64 --seed $2 \
    --collision-reward -200 --safety-distance 0.04 \
    --group $GROUP --name $1 \
    --resume $BASE/final.ckpt --no-resume-buffer 2>&1 | tail -3
  timeout 3600 python tools/evaluate.py $RD/$1 \
    --scenarios reachao_rand_start --episodes 100 --out $RD/$1/benchmark 2>&1 | tail -2
}
rs_sd tqc_ft18_rand_start_sd 0
rs_sd tqc_ft18_rand_start_sd_s1 1

MIXED6="$RD/tqc_ft8_reachao_rand_start $RD/tqc_ft10_rand_start_s1 \
  $RD/tqc_ft11_rand_start_s2 $RD/tqc_ft13_rand_start_pc \
  $RD/tqc_ft13_rand_start_pc_s1 $RD/tqc_ft13_rand_start_pc_s2"
timeout 3600 python tools/evaluate.py $MIXED6 $RD/tqc_ft18_rand_start_sd \
  --scenarios reachao_rand_start --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft8_reachao_rand_start/benchmark_ens_mixed7 2>&1 | tail -2
timeout 3600 python tools/evaluate.py $MIXED6 \
  $RD/tqc_ft18_rand_start_sd $RD/tqc_ft18_rand_start_sd_s1 \
  --scenarios reachao_rand_start --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft8_reachao_rand_start/benchmark_ens_mixed8 2>&1 | tail -2
# sd-family-only 2-member fusion as a control
timeout 3600 python tools/evaluate.py \
  $RD/tqc_ft18_rand_start_sd $RD/tqc_ft18_rand_start_sd_s1 \
  --scenarios reachao_rand_start --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft18_rand_start_sd/benchmark_ens_sd2 2>&1 | tail -2

# --- reachao_rand sd seeds (ft9 recipe + margin) --------------------------
rand_sd () { # name seed
  echo "=== phase18 $1 (reachao_rand sd=0.04 seed=$2) ==="
  python tools/train.py \
    --stages reachao_rand --success-thresholds 1.0 --max-ep-steps 100 \
    --max-timesteps 400000 --n-envs 64 --seed $2 \
    --obs-max-distance 2.0 --collision-reward -200 --safety-distance 0.04 \
    --group $GROUP --name $1 \
    --resume $BASE/final.ckpt --no-resume-buffer 2>&1 | tail -3
  timeout 3600 python tools/evaluate.py $RD/$1 \
    --scenarios reachao_rand --episodes 100 --out $RD/$1/benchmark 2>&1 | tail -2
}
rand_sd tqc_ft18_rand_sd 10
rand_sd tqc_ft18_rand_sd_s1 11

X5="$RD/tqc_ft9_reachao_rand $RD/tqc_ft12_reachao_rand_s1 $RD/tqc_ft7_reachao_rand \
  $RD/tqc_ft17_reachao_rand_s2 $RD/tqc_ft17_reachao_rand_s3"
timeout 3600 python tools/evaluate.py $X5 $RD/tqc_ft18_rand_sd \
  --scenarios reachao_rand --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft9_reachao_rand/benchmark_ens_x6 2>&1 | tail -2
timeout 3600 python tools/evaluate.py $X5 $RD/tqc_ft18_rand_sd $RD/tqc_ft18_rand_sd_s1 \
  --scenarios reachao_rand --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft9_reachao_rand/benchmark_ens_x7 2>&1 | tail -2

python tools/summarize_campaign.py $RD
echo "=== phase18 done ==="
