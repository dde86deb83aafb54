#!/bin/bash
# Phase 17: push the three remaining sub-0.96 scenes with more seed
# diversity for their fusions (the recipe that set the reachao1/reachao2/
# rand/rand_start records):
#   reachao_rand  0.87 (3-member fusion)  -> add seeds 2,3 and fuse 5
#   reachao3      0.92 record, rebuilt members fuse to 0.88 -> add seeds
#                 3,4 and fuse 5 (also scored on wangexp-3)
#   library1      0.95 single model (lost ckpt) -> rebuild s0 + twin s1,
#                 fuse (library1_rs random-start stage, coll -100, no omd
#                 cap: the committed 0.95 recipe)
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign
RD=training/run_data/$GROUP
BASE=$RD/tqc_base

# --- reachao_rand seeds 2,3 (ft9 recipe) ---------------------------------
rand_seed () { # name seed
  echo "=== phase17 $1 (reachao_rand seed=$2) ==="
  python tools/train.py \
    --stages reachao_rand --success-thresholds 1.0 --max-ep-steps 100 \
    --max-timesteps 400000 --n-envs 64 --seed $2 \
    --obs-max-distance 2.0 --collision-reward -200 \
    --group $GROUP --name $1 \
    --resume $BASE/final.ckpt --no-resume-buffer 2>&1 | tail -3
  timeout 3600 python tools/evaluate.py $RD/$1 \
    --scenarios reachao_rand --episodes 100 --out $RD/$1/benchmark 2>&1 | tail -2
}
rand_seed tqc_ft17_reachao_rand_s2 2
rand_seed tqc_ft17_reachao_rand_s3 3
timeout 3600 python tools/evaluate.py \
  $RD/tqc_ft9_reachao_rand $RD/tqc_ft12_reachao_rand_s1 $RD/tqc_ft7_reachao_rand \
  $RD/tqc_ft17_reachao_rand_s2 $RD/tqc_ft17_reachao_rand_s3 \
  --scenarios reachao_rand --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft9_reachao_rand/benchmark_ens_x5 2>&1 | tail -2

# --- reachao3 seeds 3,4 (ft9 2-stage recipe) ------------------------------
r3_seed () { # name seed
  echo "=== phase17 $1 (reachao3 seed=$2) ==="
  python tools/train.py \
    --stages reachao3 wangexp-3 --success-thresholds 0.95 1.0 \
    --max-ep-steps 100 100 --max-timesteps 400000 --n-envs 64 --seed $2 \
    --obs-max-distance 2.0 --collision-reward -200 \
    --group $GROUP --name $1 \
    --resume $BASE/final.ckpt --no-resume-buffer 2>&1 | tail -3
  timeout 3600 python tools/evaluate.py $RD/$1 \
    --scenarios reachao3 --episodes 100 --out $RD/$1/benchmark 2>&1 | tail -2
}
r3_seed tqc_ft17_reachao3_s3 3
r3_seed tqc_ft17_reachao3_s4 4
for scene in reachao3 wangexp-3; do
  timeout 3600 python tools/evaluate.py \
    $RD/tqc_ft9_reachao3 $RD/tqc_ft14_reachao3_s1 $RD/tqc_ft14_reachao3_s2 \
    $RD/tqc_ft17_reachao3_s3 $RD/tqc_ft17_reachao3_s4 \
    --scenarios $scene --episodes 100 --strategy bayesian_fusion \
    --out $RD/tqc_ft9_reachao3/benchmark_ens_x5_$scene 2>&1 | tail -2
done

# --- library1 rebuild + twin (ft3 recipe: library1_rs -> library1) --------
lib_seed () { # name seed suffix
  echo "=== phase17 $1 (library1 seed=$2) ==="
  python tools/train.py \
    --stages library1_rs library1 --success-thresholds 0.8 1.0 \
    --max-ep-steps 100 100 --max-timesteps 400000 --n-envs 64 --seed $2 \
    --collision-reward -100 \
    --group $GROUP --name $1 \
    --resume $BASE/final.ckpt --no-resume-buffer 2>&1 | tail -3
  timeout 3600 python tools/evaluate.py $RD/$1 \
    --scenarios library1 --episodes 100 --out $RD/$1/benchmark$3 2>&1 | tail -2
}
lib_seed tqc_ft3_library1 0 _rebuild
lib_seed tqc_ft17_library1_s1 1 ""
timeout 3600 python tools/evaluate.py \
  $RD/tqc_ft3_library1 $RD/tqc_ft17_library1_s1 \
  --scenarios library1 --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft3_library1/benchmark_ens_s01 2>&1 | tail -2

python tools/summarize_campaign.py $RD
echo "=== phase17 done ==="
