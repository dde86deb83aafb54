#!/bin/bash
# Round-5 campaign: the routed + distilled scene-blind generalist
# (VERDICT r4 #1), population-trained rand_start seeds (#2, #3), and the
# 64-vs-512 equal-budget quality pair (#8).
#
# Phases are independent entry points: `campaign_round5.sh router` etc.
set -u -o pipefail
cd "$(dirname "$0")/.."    # repo root (ADVICE r4: no hardcoded /root/repo)
R5=training/run_data/round5_campaign
mkdir -p "$R5"

case "${1:-all}" in
  router|all)
    # scene-blind routed generalist: build member pool + router, then
    # benchmark with the reference protocol (13 scenes x 100 eps)
    timeout 7200 python tools/build_router.py --benchmark \
      --out "$R5/routed_gen"
    ;&
  distill)
    # single-network distillation of the routed teacher (BC + DAgger)
    timeout 10800 python tools/distill_generalist.py \
      --router "$R5/routed_gen/routed_policy.npz" \
      --out "$R5/distilled_gen"
    ;&
  pop_rs)
    # 4-seed population on the rand_start pose-probability curriculum
    # (VERDICT r4 #3: 0.75 -> >=0.85); seeds feed cross-seed ensembles
    timeout 21600 python tools/train_population.py --members 4 \
      --group round5_campaign --name pop_rs \
      --stages reachao_rand_start_p25 reachao_rand_start_p50 \
               reachao_rand_start \
      --success-thresholds 0.85 0.85 2.0 --max-ep-steps 100 100 100 \
      --max-timesteps 400000 --learning-starts 50000 \
      --interleave-min-buffer 100000 --eval-freq 25000 --seed 5
    ;&
  bench_rs)
    # benchmark the population members on the target scene
    for m in 0 1 2 3; do
      d="$R5/pop_rs"
      [ -f "$d/best_model_m$m.ckpt" ] && \
        timeout 3600 python tools/benchmark_pool.py "$d" \
          --ckpt "best_model_m$m.ckpt" --scenarios reachao_rand_start \
          || true
    done
    ;&
  summary)
    python tools/summarize_campaign.py "$R5" || true
    ;;
esac
