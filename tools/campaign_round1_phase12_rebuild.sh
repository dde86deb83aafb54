#!/bin/bash
# Phase 12 prelude after the round-1 filesystem reset: .ckpt files are
# gitignored, so the trained models behind the committed benchmark tables were
# lost.  Training is deterministic (same code+seed => same model), so this
# rebuilds exactly the checkpoints phase 12's ensembles resume from/fuse with:
#   tqc_base          (rebuilt separately before this script runs)
#   tqc_ft4_reachao1  300k, coll -100
#   tqc_ft7_workshop  300k, coll -100, obs-max-distance 2.0
#   tqc_ft7_reachao_rand  300k, coll -100, omd 2.0
#   tqc_ft9_reachao_rand  500k, coll -200, omd 2.0
# NOTE: training is only deterministic at fixed code; env/eval fixes were
# committed after the originals were trained, so rebuilt models reproduce the
# originals statistically, not bitwise.  Each rebuilt model therefore gets a
# fresh 100-episode eval written to benchmark_rebuild.json (the committed
# benchmark.json is kept untouched as the original run's record).
set -u -o pipefail
cd /root/repo
GROUP=round1_campaign
RD=training/run_data/$GROUP
BASE=$RD/tqc_base

ft () { # name scene steps extra...
  local name=$1 scene=$2 steps=$3; shift 3
  echo "=== rebuild $name ($scene, $steps steps) ==="
  python tools/train.py \
    --stages $scene --success-thresholds 1.0 --max-ep-steps 100 \
    --max-timesteps $steps --n-envs 64 --seed 0 \
    "$@" --group $GROUP --name $name \
    --resume $BASE/final.ckpt --no-resume-buffer 2>&1 | tail -3
  timeout 3600 python tools/evaluate.py $RD/$name \
    --scenarios $scene --episodes 100 \
    --out $RD/$name/benchmark_rebuild 2>&1 | tail -2
}

ft tqc_ft4_reachao1 reachao1 300000
ft tqc_ft7_workshop workshop 300000 --obs-max-distance 2.0
ft tqc_ft7_reachao_rand reachao_rand 300000 --obs-max-distance 2.0
ft tqc_ft9_reachao_rand reachao_rand 500000 --collision-reward -200 --obs-max-distance 2.0

bash tools/campaign_round1_phase12.sh
