#!/bin/bash
# Phase 22 (round 2): grow and rebalance the generalist fusion pool.
#
# Phase 21A's weighted fine-tune fixed the targeted scenes (industrial
# 0.32->0.95, library1 0.38->0.97 solo) but see-sawed some previously-good
# ones (workshop 0.86->0.63, library2 0.66->0.43 under fusion->solo).  Two
# cheap, proven moves:
#
#  A. MORE SEEDS for the fusion pool: round 1 showed same-task seed
#     ensembles beat every solo model; fine-tune the phase-20 checkpoints
#     on the weighted mixture again with fresh rollout seeds (2/3).
#
#  B. UNIFORM POLISH: a short uniform-mixture anneal from each weighted
#     checkpoint to pull the see-sawed scenes back without losing the
#     weighted gains (classic curriculum annealing).
#
# Then fuse the final pool (weighted + polished members) and summarize.
set -u -o pipefail
cd /root/repo
GROUP=round2_campaign
RD=training/run_data/$GROUP

MIX_W="reachao1+reachao2+reachao2+reachao3+reachao3+wangexp-3+reachao_rand+reachao_rand+reachao_rand_start+reachao_rand_start+reachao_rand_start+library1+library1+library1+library2+library2+narrow_tunnel+tunnel+wall+workshop+industrial+industrial+industrial"
MIX_U="reachao1+reachao2+reachao3+wangexp-3+reachao_rand+library1+library2+narrow_tunnel+tunnel+wall+workshop+industrial+reachao_rand_start"

run_mix () { # name seed resume_from mix steps
  echo "=== phase22 $1 (seed=$2, steps=$5) ==="
  timeout 7200 python tools/train.py \
    --stages "$4" --success-thresholds 2.0 --max-ep-steps 100 \
    --max-timesteps "$5" --n-envs 64 --seed "$2" \
    --obs-max-distance 2.0 --collision-reward -100 \
    --group $GROUP --name "$1" \
    --resume "$3" 2>&1 | tail -4
  timeout 7200 python tools/evaluate.py $RD/"$1" \
    --episodes 100 --out $RD/"$1"/benchmark 2>&1 | tail -16
}

# A. seed twins on the weighted mixture (fresh rollout RNG from the same
#    phase-20 starts)
run_mix tqc_gen_w_s2 2 $RD/tqc_gen_mix/final.ckpt    "$MIX_W" 600000
run_mix tqc_gen_w_s3 3 $RD/tqc_gen_mix_s1/final.ckpt "$MIX_W" 600000

# B. uniform polish of the phase-21A weighted members (short anneal);
#    seed-0's final.ckpt was lost to the filename crash -> polish from its
#    best_model.ckpt with a fresh buffer, seed-1's final.ckpt normally
timeout 7200 python tools/train.py \
  --stages "$MIX_U" --success-thresholds 2.0 --max-ep-steps 100 \
  --max-timesteps 200000 --n-envs 64 --seed 0 \
  --obs-max-distance 2.0 --collision-reward -100 \
  --group $GROUP --name tqc_gen_wp \
  --resume $RD/tqc_gen_w/best_model.ckpt --no-resume-buffer 2>&1 | tail -4
timeout 7200 python tools/evaluate.py $RD/tqc_gen_wp \
  --episodes 100 --out $RD/tqc_gen_wp/benchmark 2>&1 | tail -16

timeout 7200 python tools/train.py \
  --stages "$MIX_U" --success-thresholds 2.0 --max-ep-steps 100 \
  --max-timesteps 200000 --n-envs 64 --seed 1 \
  --obs-max-distance 2.0 --collision-reward -100 \
  --group $GROUP --name tqc_gen_wp_s1 \
  --resume $RD/tqc_gen_w_s1/final.ckpt 2>&1 | tail -4
timeout 7200 python tools/evaluate.py $RD/tqc_gen_wp_s1 \
  --episodes 100 --out $RD/tqc_gen_wp_s1/benchmark 2>&1 | tail -16

# final fusion pools
echo "=== phase22 fusions ==="
timeout 7200 python tools/evaluate.py \
  $RD/tqc_gen_w $RD/tqc_gen_w_s1 $RD/tqc_gen_w_s2 $RD/tqc_gen_w_s3 \
  --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_gen_w/benchmark_ens_w4 2>&1 | tail -16
timeout 7200 python tools/evaluate.py \
  $RD/tqc_gen_wp $RD/tqc_gen_wp_s1 $RD/tqc_gen_w_s2 $RD/tqc_gen_w_s3 \
  --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_gen_wp/benchmark_ens_p4 2>&1 | tail -16

python tools/summarize_campaign.py $RD
echo "=== phase22 done ==="
