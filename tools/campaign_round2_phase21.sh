#!/bin/bash
# Phase 21 (round 2): lift the generalist's weak scenes.
#
# Phase 20's uniform 13-scene mixture generalist plateaued at 0.67 mean
# (2-seed fusion): strong on narrow_tunnel/tunnel/reachao1 (>=0.95) but weak
# where collisions dominate (industrial 0.32, reachao_rand_start 0.37,
# library1 0.38).  Two moves, both resumed from the phase-20 checkpoints:
#
#  A. WEIGHTED mixture fine-tune, both seeds: oversample the weak scenes by
#     repeating their names in the '+'-joined mixture (the documented
#     oversampling mechanism, reach_ao.py::make_reach_ao_mixture_core) so
#     the rollout distribution matches where the learner still has error.
#     Resumes WITH the replay buffer (the buffer is already mixture-drawn).
#
#  B. Per-scene specialists fine-tuned from the generalist (fresh replay,
#     the reference's continue_learning semantics) using round 1's proven
#     per-scene recipes: straight ft for exploration-easy scenes, collision
#     penalty -200 for the collision-bound ones, rand->rand_start curriculum
#     for the randomized-start scene.
#
# All runs keep --obs-max-distance 2.0: the phase-20 nets were trained with
# capped distance observations, so every resume must preserve the input
# distribution.
set -u -o pipefail
cd /root/repo
GROUP=round2_campaign
RD=training/run_data/$GROUP

# weights ~ 1/success from the phase-20 ens_x2 table: x3 for <0.4, x2 for
# 0.4-0.75, x1 above (reachao3==wangexp-3 functionally; weight the pair once)
MIX_W="reachao1+reachao2+reachao2+reachao3+reachao3+wangexp-3+reachao_rand+reachao_rand+reachao_rand_start+reachao_rand_start+reachao_rand_start+library1+library1+library1+library2+library2+narrow_tunnel+tunnel+wall+workshop+industrial+industrial+industrial"

gen_w () { # name seed resume_from
  echo "=== phase21A $1 (weighted mixture ft, seed=$2) ==="
  timeout 7200 python tools/train.py \
    --stages "$MIX_W" --success-thresholds 2.0 --max-ep-steps 100 \
    --max-timesteps 600000 --n-envs 64 --seed "$2" \
    --obs-max-distance 2.0 --collision-reward -100 \
    --group $GROUP --name "$1" \
    --resume "$3" 2>&1 | tail -5
  timeout 7200 python tools/evaluate.py $RD/"$1" \
    --episodes 100 --out $RD/"$1"/benchmark 2>&1 | tail -16
}

gen_w tqc_gen_w    0 $RD/tqc_gen_mix/final.ckpt
gen_w tqc_gen_w_s1 1 $RD/tqc_gen_mix_s1/final.ckpt

echo "=== phase21A ensembles ==="
timeout 7200 python tools/evaluate.py $RD/tqc_gen_w $RD/tqc_gen_w_s1 \
  --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_gen_w/benchmark_ens_x2 2>&1 | tail -16
timeout 7200 python tools/evaluate.py \
  $RD/tqc_gen_w $RD/tqc_gen_w_s1 $RD/tqc_gen_mix $RD/tqc_gen_mix_s1 \
  --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_gen_w/benchmark_ens_x4 2>&1 | tail -16

# B. specialists from the phase-20 generalist (fresh replay).
#    recipe per scene: "<collision_reward> <timesteps>"
spec () { # scene collision_reward timesteps
  local name=tqc_ft21_$(echo "$1" | tr '-' '_')
  echo "=== phase21B finetune $1 (cr=$2, steps=$3) ==="
  timeout 7200 python tools/train.py \
    --stages "$1" --max-ep-steps 100 --success-thresholds 2.0 \
    --max-timesteps "$3" --n-envs 64 --seed 0 \
    --obs-max-distance 2.0 --collision-reward "$2" \
    --group $GROUP --name "$name" \
    --resume $RD/tqc_gen_mix/final.ckpt --no-resume-buffer 2>&1 | tail -5
  timeout 3600 python tools/evaluate.py $RD/$name \
    --scenarios "$1" --episodes 100 \
    --out $RD/$name/benchmark 2>&1 | tail -4
}

spec industrial   -100 400000
spec library1     -100 400000
spec reachao3     -100 400000
spec library2     -100 400000
spec reachao_rand -200 400000
spec reachao2     -200 400000
spec workshop     -100 300000
spec reachao1     -100 300000

# the randomized-start scene: round 1's best recipe was the rand->rand_start
# curriculum with the stiffer collision penalty
echo "=== phase21B finetune reachao_rand_start (curriculum) ==="
timeout 10800 python tools/train.py \
  --stages reachao_rand reachao_rand_start --max-ep-steps 100 100 \
  --success-thresholds 0.8 2.0 \
  --max-timesteps 600000 --n-envs 64 --seed 0 \
  --obs-max-distance 2.0 --collision-reward -200 \
  --group $GROUP --name tqc_ft21_rand_start \
  --resume $RD/tqc_gen_mix/final.ckpt --no-resume-buffer 2>&1 | tail -5
timeout 3600 python tools/evaluate.py $RD/tqc_ft21_rand_start \
  --scenarios reachao_rand_start --episodes 100 \
  --out $RD/tqc_ft21_rand_start/benchmark 2>&1 | tail -4

# reachao3 specialist also claims wangexp-3 (functionally identical scene)
timeout 3600 python tools/evaluate.py $RD/tqc_ft21_reachao3 \
  --scenarios wangexp-3 --episodes 100 \
  --out $RD/tqc_ft21_reachao3/benchmark_wangexp 2>&1 | tail -4

python tools/summarize_campaign.py $RD
echo "=== phase21 done ==="
