#!/bin/bash
# Phase 8: attack the remaining weak benchmark scenes, where collision is the
# dominant failure mode (reachao_rand_start 0.59/0.30, reachao_rand 0.79/0.19,
# reachao2 0.84/0.11 success/collision after phase 7).
#
# Levers (all reference-sanctioned):
#  - stronger collision penalty (the reference's W&B sweep searches
#    collision_reward in -25..-500, wandb_sweep_config.yaml)
#  - curriculum into the hard randomized scene: reachao_rand -> rand_start,
#    resuming from the phase-7 reachao_rand specialist (train.py:66-93's
#    train-benchmark-scenarios pass allows staged fine-tuning)
#  - more timesteps for the randomized scenes (they see far more state space
#    per episode than the static scenes)
#  - BCF prior fusion at eval for the weakest scene (evaluate.py:174-211's
#    controller-fusion strategy exists precisely to cut collisions)
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign
RD=training/run_data/$GROUP
BASE=$RD/tqc_base

run_ft () { # name stages thresholds eps timesteps collision_rew resume
  local name=$1 stages=$2 thr=$3 eps=$4 ts=$5 cr=$6 resume=$7 evalscene=$8
  echo "=== phase8 finetune $name ($stages) ==="
  python tools/train.py \
    --stages $stages --success-thresholds $thr --max-ep-steps $eps \
    --max-timesteps $ts --n-envs 64 --seed 0 \
    --obs-max-distance 2.0 --collision-reward $cr \
    --group $GROUP --name $name \
    --resume $resume --no-resume-buffer \
    2>&1 | tail -8
  timeout 3600 python tools/evaluate.py $RD/$name \
    --scenarios $evalscene --episodes 100 \
    --out $RD/$name/benchmark 2>&1 | tail -3
}

# 1. rand_start: curriculum rand -> rand_start from the rand specialist.
run_ft tqc_ft8_reachao_rand_start "reachao_rand reachao_rand_start" "0.85 1.0" \
  "100 100" 700000 -200 $RD/tqc_ft7_reachao_rand/best_model.ckpt reachao_rand_start

# 2. reachao_rand: continue the specialist with a stiffer collision penalty.
run_ft tqc_ft8_reachao_rand "reachao_rand" "1.0" "100" 400000 -200 \
  $RD/tqc_ft7_reachao_rand/best_model.ckpt reachao_rand

# 3. reachao2: fresh fine-tune from base with stiffer collision penalty
#    (phase 7's -100 run regressed to 0.81; the base generalist sits at 0.84).
run_ft tqc_ft8_reachao2 "reachao2" "1.0" "100" 400000 -200 \
  $BASE/final.ckpt reachao2

# 4. Eval-side experiment: BCF prior fusion on the weakest scene, using the
#    best rand_start policy available after (1).
for run in tqc_ft8_reachao_rand_start tqc_ft7_reachao_rand_start; do
  if [ -f $RD/$run/best_model.ckpt ]; then
    echo "=== phase8 BCF eval on $run ==="
    timeout 3600 python tools/evaluate.py $RD/$run \
      --scenarios reachao_rand_start --episodes 100 --strategy bcf \
      --out $RD/$run/benchmark_bcf 2>&1 | tail -3
    break
  fi
done

python tools/summarize_campaign.py $RD
echo "=== phase8 done ==="
