#!/bin/bash
# Phase 19: a BROAD generalist. tqc_base (the current "generalist",
# 0.458 mean over the 13 benchmark scenes) only ever trained on
# reachao1/2/3 + wangexp-3 — it has never seen the library/tunnel/wall/
# industrial/workshop geometries, where it scores ~0. Obstacle
# observations are per-link (fixed-dim regardless of scene), so a
# round-robin curriculum over ALL benchmark scenes is dimension-
# compatible, and the replay buffer persists across stages within a run,
# so off-policy TQC naturally mixes scenes (forgetting mitigation).
# Three passes with shrinking budgets; threshold 0.9 lets solved scenes
# advance early. Two seeds -> 2-member generalist fusion.
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign
RD=training/run_data/$GROUP
BASE=$RD/tqc_base

# pass 1 uses the curriculum variants that got the per-scene specialists
# off 0 (wall_h22 -> wall, tunnel_rs -> tunnel, library1_rs -> library1,
# rand_start_p50 -> rand_start); passes 2-3 train the real scenes
PASS1=(reachao1 reachao2 reachao3 wangexp-3 reachao_rand library1_rs library2 \
       narrow_tunnel tunnel_rs wall_h22 workshop industrial reachao_rand_start_p50)
PASS23=(reachao1 reachao2 reachao3 wangexp-3 reachao_rand library1 library2 \
        narrow_tunnel tunnel wall workshop industrial reachao_rand_start)
STAGES=("${PASS1[@]}" "${PASS23[@]}" "${PASS23[@]}")
N=${#STAGES[@]}
THRESH=(); EPS=()
for ((i=0; i<N; i++)); do THRESH+=(0.9); EPS+=(100); done

gen_seed () { # name seed
  echo "=== phase19 $1 (broad generalist seed=$2) ==="
  python tools/train.py \
    --stages "${STAGES[@]}" --success-thresholds "${THRESH[@]}" \
    --max-ep-steps "${EPS[@]}" --max-timesteps 100000 --n-envs 64 --seed $2 \
    --obs-max-distance 2.0 --collision-reward -100 \
    --group $GROUP --name $1 \
    --resume $BASE/final.ckpt --no-resume-buffer 2>&1 | tail -3
  timeout 7200 python tools/evaluate.py $RD/$1 \
    --episodes 100 --out $RD/$1/benchmark 2>&1 | tail -16
}
gen_seed tqc_gen_broad 0
gen_seed tqc_gen_broad_s1 1

timeout 7200 python tools/evaluate.py $RD/tqc_gen_broad $RD/tqc_gen_broad_s1 \
  --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_gen_broad/benchmark_ens_x2 2>&1 | tail -16

python tools/summarize_campaign.py $RD
echo "=== phase19 done ==="
