#!/bin/bash
# Round-5 serialized chip queue (one TPU job at a time behind pop_rs):
#   1. population K-scaling probes pop_k{1,2,4,8} on reachao1 (short,
#      eval disabled -> pure rollout/update rows)  [VERDICT r4 #2]
#   2. equal-budget quality pair eqb_64 / eqb_512 on reachao1
#      (same 2.5M sample budget, interleave on)    [VERDICT r4 #8]
#   3. tools/throughput_r05.py -> THROUGHPUT_r05.json
# Each job is skipped if its metrics file already has rows (resume-safe).
set -u
cd "$(dirname "$0")/.."
BASE=training/run_data/round5_campaign

wait_for() {  # wait for a command line pattern to disappear from ps
  while pgrep -f "$1" >/dev/null 2>&1; do sleep 60; done
}

has_rows() { [ -s "$BASE/$1/metrics.jsonl" ]; }

run_probe() {  # run_probe NAME MEMBERS
  if has_rows "$1"; then echo "[queue] $1 exists, skip"; return; fi
  echo "[queue] $(date +%H:%M:%S) probe $1 (K=$2)"
  bash tools/tunnel_watchdog.sh -- python tools/train_population.py \
    --members "$2" --stages reachao1 --success-thresholds 2.0 \
    --max-ep-steps 100 --max-timesteps 150000 --learning-starts 50000 \
    --eval-freq 1000000000 --group round5_campaign --name "$1" --seed 7 \
    >> /tmp/queue_r5.log 2>&1
}

run_eqb() {  # run_eqb NAME NENVS
  if has_rows "$1"; then echo "[queue] $1 exists, skip"; return; fi
  echo "[queue] $(date +%H:%M:%S) equal-budget $1 (n_envs=$2)"
  bash tools/tunnel_watchdog.sh -- python tools/train.py \
    --stages reachao1 --success-thresholds 2.0 --max-ep-steps 100 \
    --max-timesteps 2500000 --n-envs "$2" --learning-starts 50000 \
    --eval-freq 250000 --group round5_campaign --name "$1" --seed 3 \
    >> /tmp/queue_r5.log 2>&1
}

echo "[queue] waiting for pop_rs to finish..."
wait_for "train_population.py.*pop_rs"

# campaign-critical first: per-member rand_start benchmark + cross-seed
# fusion (VERDICT #3) before the throughput evidence runs
if [ ! -f "$BASE/pop_rs/m5/benchmark.json" ]; then
  bash tools/pop_rs_bench.sh >> /tmp/queue_r5.log 2>&1
fi
if [ ! -f "$BASE/pop_rs/fusions.json" ]; then
  python tools/pop_rs_fuse.py >> /tmp/queue_r5.log 2>&1
fi

run_eqb eqb_64 64
run_eqb eqb_512 512

run_probe pop_k1 1
run_probe pop_k2 2
run_probe pop_k4 4
run_probe pop_k8 8

python tools/throughput_r05.py >> /tmp/queue_r5.log 2>&1
echo "[queue] done at $(date +%H:%M:%S)"
