#!/bin/bash
# Phase 20 (round 2): the broad generalist, rebuilt on the multi-scene
# MIXTURE env instead of phase 19's serial round-robin curriculum.
#
# Why: a serial curriculum forgets — each stage's rollouts overwrite the
# on-policy data distribution, and by the last stage the replay is
# dominated by that scene (round 1's tqc_base scored 0.00 on scenes it
# saw 30 stages earlier).  The mixture env ('+'-joined scenario names,
# envs/tasks/reach_ao.py::make_reach_ao_mixture_core) draws a scenario
# PER ENV at reset under lax.switch, so every 64-env rollout covers all
# scenes at once and the replay buffer stays mixed by construction.
#
# From scratch (round-1 checkpoints did not survive the filesystem
# reset): (0) bootstrap on the old base curriculum as a mixture, (A) the
# curriculum variants that got round 1's per-scene specialists off 0
# (wall_h22, tunnel_rs, library1_rs, rand_start_p50), then (B) the true
# benchmark scenes.  Threshold 2.0 = never advance early.
set -u -o pipefail
cd /root/repo
GROUP=round2_campaign
RD=training/run_data/$GROUP

MIX_0="reachao1+reachao2+reachao3+wangexp-3"
MIX_A="reachao1+reachao2+reachao3+wangexp-3+reachao_rand+library1_rs+library2+narrow_tunnel+tunnel_rs+wall_h22+workshop+industrial+reachao_rand_start_p50"
MIX_B="reachao1+reachao2+reachao3+wangexp-3+reachao_rand+library1+library2+narrow_tunnel+tunnel+wall+workshop+industrial+reachao_rand_start"

gen_seed () { # name seed
  echo "=== phase20 $1 (mixture generalist seed=$2) ==="
  python tools/train.py \
    --stages "$MIX_0" "$MIX_A" "$MIX_B" \
    --success-thresholds 0.85 0.92 2.0 \
    --max-ep-steps 75 100 100 \
    --max-timesteps 600000 --n-envs 64 --seed "$2" \
    --obs-max-distance 2.0 --collision-reward -100 \
    --group $GROUP --name "$1" 2>&1 | tail -5
  timeout 10800 python tools/evaluate.py $RD/"$1" \
    --episodes 100 --out $RD/"$1"/benchmark 2>&1 | tail -16
}

gen_seed tqc_gen_mix 0
gen_seed tqc_gen_mix_s1 1

timeout 10800 python tools/evaluate.py $RD/tqc_gen_mix $RD/tqc_gen_mix_s1 \
  --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_gen_mix/benchmark_ens_x2 2>&1 | tail -16

python tools/summarize_campaign.py $RD
echo "=== phase20 done ==="
