#!/bin/bash
# Phase 23 (round 2): classic-task capability demos — TQC+HER on the
# upstream panda-gym task family (the reference trains these through
# SB3+HER; success baselines live in the panda-gym paper,
# arXiv:2106.13687).  Push / PickAndPlace / Slide, sparse reward, default
# per-task control types, 64 envs; eval_success curves land in each run's
# metrics.jsonl and best_model.ckpt keeps the eval peak.
set -u -o pipefail
cd /root/repo
GROUP=round2_classic
RD=training/run_data/$GROUP

classic () { # task steps
  echo "=== phase23 $1 ($2 steps) ==="
  timeout 7200 python tools/train_classic.py \
    --task "$1" --max-timesteps "$2" --n-envs 64 --seed 0 \
    --group $GROUP --name "tqc_$1" 2>&1 | tail -4
}

classic push         1000000
classic pickandplace 1000000
classic slide        1000000

python - <<'EOF'
import json, glob
for mf in sorted(glob.glob("training/run_data/round2_classic/*/metrics.jsonl")):
    ev = [json.loads(l).get("eval_success") for l in open(mf)
          if '"eval_success"' in l]
    if ev:
        print(mf.split("/")[-2], "peak eval_success:", max(ev),
              "final:", ev[-1])
EOF
echo "=== phase23 done ==="
