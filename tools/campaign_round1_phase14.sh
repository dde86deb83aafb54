#!/bin/bash
# Phase 14: extend the seed-diversity ensemble recipe (which lifted
# reachao_rand to 0.87 and reachao1 to 0.98 in phase 12) to the remaining
# mid-tier scenes: reachao2 (best 0.94) and reachao3/wangexp-3 (best 0.92).
# The s0 specialists' checkpoints were lost to the round-1 filesystem
# reset, so each scene rebuilds its s0 member under the original run name
# (benchmark_rebuild.json alongside the committed record, same convention
# as the phase-12 prelude), then trains s1/s2 twins and fuses all three.
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign
RD=training/run_data/$GROUP
BASE=$RD/tqc_base

train1 () { # name seed bench_suffix scene...
  local name=$1 seed=$2 suffix=$3; shift 3
  echo "=== phase14 $name (seed=$seed: $*) ==="
  local last="${@: -1}"
  local n=$#
  local thr=(); for ((i=1;i<n;i++)); do thr+=(0.95); done; thr+=(1.0)
  local eps=(); for ((i=0;i<n;i++)); do eps+=(100); done
  python tools/train.py \
    --stages "$@" --success-thresholds "${thr[@]}" --max-ep-steps "${eps[@]}" \
    --max-timesteps 400000 --n-envs 64 --seed $seed \
    --obs-max-distance 2.0 --collision-reward -200 \
    --group $GROUP --name $name \
    --resume $BASE/final.ckpt --no-resume-buffer 2>&1 | tail -4
  timeout 3600 python tools/evaluate.py $RD/$name \
    --scenarios $last --episodes 100 \
    --out $RD/$name/benchmark$suffix 2>&1 | tail -2
}

# --- reachao2 (ft8 recipe: single stage, coll -200) ---------------------
train1 tqc_ft8_reachao2        0 _rebuild reachao2
train1 tqc_ft14_reachao2_s1    1 ""       reachao2
train1 tqc_ft14_reachao2_s2    2 ""       reachao2
timeout 3600 python tools/evaluate.py \
  $RD/tqc_ft8_reachao2 $RD/tqc_ft14_reachao2_s1 $RD/tqc_ft14_reachao2_s2 \
  --scenarios reachao2 --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft8_reachao2/benchmark_ens_3seed 2>&1 | tail -2

# --- reachao3 / wangexp-3 (ft9 recipe: 2-stage, coll -200) ---------------
train1 tqc_ft9_reachao3        0 _rebuild reachao3 wangexp-3
train1 tqc_ft14_reachao3_s1    1 ""       reachao3 wangexp-3
train1 tqc_ft14_reachao3_s2    2 ""       reachao3 wangexp-3
for scene in reachao3 wangexp-3; do
  timeout 3600 python tools/evaluate.py \
    $RD/tqc_ft9_reachao3 $RD/tqc_ft14_reachao3_s1 $RD/tqc_ft14_reachao3_s2 \
    --scenarios $scene --episodes 100 --strategy bayesian_fusion \
    --out $RD/tqc_ft9_reachao3/benchmark_ens_3seed_$scene 2>&1 | tail -2
done

python tools/summarize_campaign.py $RD
echo "=== phase14 done ==="
