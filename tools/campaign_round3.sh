#!/bin/bash
# Round-3 campaign: re-establish the claim table under the corrected
# (Bullet-faithful) engine dynamics, then push the generalist and the weak
# tail with the round-3 training stack (gSDE + interleaved collect/update
# at large n_envs).
#
# The round-3 engine fidelity overhaul (Bullet-equivalent collision-shape
# inertias, no URDF velocity clamp, exact coupled motor LCP) changes env
# dynamics for ALL policies: round-2 benchmark numbers are stale.  Phase A
# re-benchmarks the round-2 pool under the new engine; phases B/C fine-tune
# from the strongest checkpoints.
set -u -o pipefail
cd /root/repo
GROUP=round3_campaign
RD=training/run_data/$GROUP
R2=training/run_data/round2_campaign
mkdir -p "$RD"

MIX_W="reachao1+reachao2+reachao2+reachao3+reachao3+wangexp-3+reachao_rand+reachao_rand+reachao_rand_start+reachao_rand_start+reachao_rand_start+library1+library1+library1+library2+library2+narrow_tunnel+tunnel+wall+workshop+industrial+industrial+industrial"

ev () { # rundir
  timeout 7200 python tools/evaluate.py "$1" \
    --episodes 100 --out "$1"/benchmark 2>&1 | tail -16
}

# ---- Phase A: re-benchmark the round-2 pool under the new engine --------
phase_a () {
  for r in tqc_gen_w tqc_gen_w_s2 tqc_gen_wp tqc_gen_mix_s1 \
           tqc_ft21_reachao1 tqc_ft21_reachao2 tqc_ft21_reachao3 \
           tqc_ft21_reachao_rand tqc_ft21_rand_start tqc_ft21_library1 \
           tqc_ft21_library2 tqc_ft21_workshop tqc_ft21_industrial; do
    [ -d "$R2/$r" ] || continue
    echo "=== re-benchmark $r (new engine) ==="
    ev "$R2/$r"
    # surface the re-benchmarked run in the round-3 claim table
    [ -e "$RD/$r" ] || ln -s "../round2_campaign/$r" "$RD/$r"
  done
}

# ---- Phase B: generalist refresh under the new engine -------------------
# fine-tune the strongest round-2 generalists on the weighted mixture with
# the round-3 stack: interleaved updates at n_envs=256.
gen () { # name seed resume steps
  echo "=== round3 generalist $1 (seed=$2, steps=$4) ==="
  timeout 7200 python tools/train.py \
    --stages "$MIX_W" --success-thresholds 2.0 --max-ep-steps 100 \
    --max-timesteps "$4" --n-envs 256 --seed "$2" \
    --obs-max-distance 2.0 --collision-reward -100 \
    --group $GROUP --name "$1" \
    --resume "$3" --no-resume-buffer 2>&1 | tail -4
  ev "$RD/$1"
}

# ---- Phase C: specialist rescue for the weak tail -----------------------
spec () { # scene resume steps name
  local name=${4:-tqc_r3_$1}
  echo "=== round3 specialist $name on $1 ==="
  timeout 7200 python tools/train.py \
    --stages "$1" --success-thresholds 2.0 --max-ep-steps 100 \
    --max-timesteps "$3" --n-envs 256 --seed 0 \
    --obs-max-distance 2.0 --collision-reward -100 \
    --group $GROUP --name "$name" \
    --resume "$2" --no-resume-buffer 2>&1 | tail -4
  ev "$RD/$name"
}

case "${1:-all}" in
  a) phase_a ;;
  b)
    gen tqc_r3_gen_w 0 "$R2/tqc_gen_w/best_model.ckpt" 1000000
    gen tqc_r3_gen_w_s1 1 "$R2/tqc_gen_w_s2/best_model.ckpt" 1000000
    ;;
  c)
    spec reachao_rand_start "$R2/tqc_ft21_rand_start/best_model.ckpt" 600000
    spec reachao3 "$R2/tqc_ft21_reachao3/best_model.ckpt" 600000
    spec wangexp-3 "$R2/tqc_gen_w_s2/best_model.ckpt" 600000
    spec reachao2 "$R2/tqc_ft21_reachao2/best_model.ckpt" 600000
    spec reachao_rand "$R2/tqc_ft21_reachao_rand/best_model.ckpt" 600000
    spec workshop "$R2/tqc_ft21_workshop/best_model.ckpt" 400000
    ;;
  summarize)
    python tools/summarize_campaign.py "$RD" 2>&1 | tail -25
    ;;
  all)
    "$0" a
    "$0" b
    "$0" c
    "$0" summarize
    ;;
esac
