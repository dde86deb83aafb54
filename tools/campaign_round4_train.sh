#!/bin/bash
# Round-4 campaign: close the claim table to 0.85 generalist / 0.94
# per-scene best (VERDICT r3 #1) + the large-batch throughput evidence
# (VERDICT r3 #2, deferred from r2 #8).
#
# Phases (run in order; each is restartable):
#   throughput — reachao1 at n_envs 64 vs 512, interleave ON (the gated
#                mechanism under test), equal 100k sample budget; compare
#                the sps column in metrics.jsonl.
#   generalist — large-batch interleaved mixture run from the best
#                corrected-engine single model (tqc_gen_w_s2, 0.735).
#   tail       — specialist seeds for the weak scenes (rand_start 0.60,
#                reachao_rand 0.78, reachao3 0.83, reachao2 0.90), proven
#                n_envs=64 collect-then-update recipe.
set -u -o pipefail
cd /root/repo
GROUP=round4_campaign
RD=training/run_data/$GROUP
R2=training/run_data/round2_campaign
R3=training/run_data/round3_campaign
mkdir -p "$RD"

MIX_W="reachao1+reachao2+reachao2+reachao3+reachao3+wangexp-3+reachao_rand+reachao_rand+reachao_rand_start+reachao_rand_start+reachao_rand_start+library1+library1+library1+library2+library2+narrow_tunnel+tunnel+wall+workshop+industrial+industrial+industrial"

tr_ni () { # name stages steps resume seed n_envs timeout  (no-interleave)
  echo "=== train $1 ($2, ${3} steps, n_envs=$6) ==="
  timeout "$7" python tools/train.py \
    --stages "$2" --success-thresholds 2.0 --max-ep-steps 100 \
    --max-timesteps "$3" --n-envs "$6" --seed "$5" \
    --obs-max-distance 2.0 --collision-reward -100 \
    --group $GROUP --name "$1" --no-interleave \
    ${4:+--resume "$4"} --no-resume-buffer 2>&1 | tail -4
}

tr_il () { # name stages steps resume seed n_envs timeout [extra...]
  echo "=== train $1 ($2, ${3} steps, n_envs=$6, interleave) ==="
  local name=$1 stages=$2 steps=$3 resume=$4 seed=$5 nenv=$6 tmo=$7
  shift 7
  timeout "$tmo" python tools/train.py \
    --stages "$stages" --success-thresholds 2.0 --max-ep-steps 100 \
    --max-timesteps "$steps" --n-envs "$nenv" --seed "$seed" \
    --obs-max-distance 2.0 --collision-reward -100 \
    --group $GROUP --name "$name" \
    ${resume:+--resume "$resume"} --no-resume-buffer "$@" 2>&1 | tail -4
}

case "${1:-throughput}" in
  throughput)
    # VERDICT r3 #2 evidence (was r2 #8): same sample budget, interleave ON
    tr_il tp_reach_64  reachao1 100000 "" 0 64  5400
    tr_il tp_reach_512 reachao1 100000 "" 0 512 5400
    ;;
  generalist)
    # large-batch interleaved mixture fine-tune; buffer-fill gate protects
    # the resumed policy (interleave only fires past 20k transitions)
    tr_il tqc_r4_gen "$MIX_W" 2000000 "$R2/tqc_gen_w_s2/best_model.ckpt" \
      0 512 10800 --utd 0.0625 --update-batch-size 512
    ;;
  tail)
    # interleaved fine-tunes with the collapse ramp: no updates until 50k
    # fresh transitions, interleaved bursts only past 100k (the r4 gate);
    # falls back to tr_ni if the first run shows a collapse
    RAMP="--learning-starts 50000 --interleave-min-buffer 100000 --eval-freq 25000"
    tr_il tqc_r4_rs_s1   reachao_rand_start 400000 "$R2/tqc_ft21_rand_start/best_model.ckpt" 1 64 3600 $RAMP
    tr_il tqc_r4_rs_s2   reachao_rand_start 400000 "$R2/tqc_ft21_rand_start/best_model.ckpt" 2 64 3600 $RAMP
    tr_il tqc_r4_rr_s1   reachao_rand       400000 "$R3/tqc_r3_wang3/best_model.ckpt"        1 64 3600 $RAMP
    tr_il tqc_r4_w3_s2   reachao3           400000 "$R3/tqc_r3_wang3/best_model.ckpt"        2 64 3600 $RAMP
    tr_il tqc_r4_ao2_s1  reachao2           400000 "$R2/tqc_ft21_reachao2/best_model.ckpt"   1 64 3600 $RAMP
    tr_il tqc_r4_lib1_s1 library1           300000 "$R2/tqc_ft21_library1/best_model.ckpt"   1 64 3600 $RAMP
    ;;
esac
