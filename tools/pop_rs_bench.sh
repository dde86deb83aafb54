#!/bin/bash
# Benchmark the pop_rs population members on reachao_rand_start and fuse
# the best seeds (VERDICT r4 #3: rand_start 0.75 -> >=0.85).
#
# 1. expose each member ckpt as a benchmark-able run dir (m0..m5)
# 2. pooled per-member benchmark on the rand_start scene (one compile)
# 3. cross-seed bayesian fusions of the top members (round-4 mechanism)
set -u
cd "$(dirname "$0")/.."
POP=${POP:-training/run_data/round5_campaign/pop_rs}
K=${K:-6}
SCENE=reachao_rand_start

for i in $(seq 0 $((K-1))); do
  d=$POP/m$i
  mkdir -p "$d"
  cp -f "$POP/config.json" "$d/config.json"
  # best_model_m<i>.ckpt = best eval snapshot of the FINAL (p100) stage
  if [ -f "$POP/best_model_m$i.ckpt" ]; then
    cp -f "$POP/best_model_m$i.ckpt" "$d/best_model.ckpt"
  else
    cp -f "$POP/final_m$i.ckpt" "$d/best_model.ckpt"
  fi
done

bash tools/tunnel_watchdog.sh -- python tools/benchmark_pool.py \
  $POP/m0 $POP/m1 $POP/m2 $POP/m3 $POP/m4 $POP/m5 \
  --scenarios $SCENE --episodes 100 --horizon 300
