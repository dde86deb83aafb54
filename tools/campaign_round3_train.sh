#!/bin/bash
# Round-3 training phase (after the phase-A re-benchmark): generalist
# refresh + weak-tail specialists under the corrected engine, using the
# proven n_envs=64 recipe (interleaved updates); plus the large-n_envs
# throughput evidence runs (VERDICT r2 #8) on a simple scene.
set -u -o pipefail
cd /root/repo
GROUP=round3_campaign
RD=training/run_data/$GROUP
R2=training/run_data/round2_campaign
mkdir -p "$RD"

MIX_W="reachao1+reachao2+reachao2+reachao3+reachao3+wangexp-3+reachao_rand+reachao_rand+reachao_rand_start+reachao_rand_start+reachao_rand_start+library1+library1+library1+library2+library2+narrow_tunnel+tunnel+wall+workshop+industrial+industrial+industrial"

tr1 () { # name stages steps resume seed n_envs
  echo "=== train $1 ($2, ${3} steps, n_envs=$6) ==="
  timeout 5400 python tools/train.py \
    --stages "$2" --success-thresholds 2.0 --max-ep-steps 100 \
    --max-timesteps "$3" --n-envs "$6" --seed "$5" \
    --obs-max-distance 2.0 --collision-reward -100 \
    --group $GROUP --name "$1" --no-interleave \
    ${4:+--resume "$4"} --no-resume-buffer 2>&1 | tail -4
}

tr2 () { # name stages steps seed n_envs  (interleaved)
  echo "=== train $1 ($2, ${3} steps, n_envs=$5, interleave) ==="
  timeout 5400 python tools/train.py \
    --stages "$2" --success-thresholds 2.0 --max-ep-steps 100 \
    --max-timesteps "$3" --n-envs "$5" --seed "$4" \
    --obs-max-distance 2.0 --collision-reward -100 \
    --group $GROUP --name "$1" 2>&1 | tail -4
}

case "${1:-train}" in
  train)
    tr1 tqc_r3_gen_w   "$MIX_W"             600000 "$R2/tqc_gen_w/best_model.ckpt"          0 64
    tr1 tqc_r3_rand_start reachao_rand_start 400000 "$R2/tqc_ft21_rand_start/best_model.ckpt" 0 64
    tr1 tqc_r3_wang3      reachao3           300000 "$R2/tqc_ft21_reachao3/best_model.ckpt"   1 64
    tr1 tqc_r3_reachao3   reachao3           400000 "$R2/tqc_ft21_reachao3/best_model.ckpt"   0 64
    ;;
  throughput)
    # VERDICT r2 #8 evidence: same sample budget, small vs large n_envs,
    # interleaved updates — large-batch must reach the same success with
    # >=10x the training steps/s (sps column in metrics.jsonl)
    # interleave ON here (tr2): that's the mechanism under test
    tr2 tp_reach_64  reachao1 100000 0 64
    tr2 tp_reach_512 reachao1 100000 0 512
    ;;
esac
