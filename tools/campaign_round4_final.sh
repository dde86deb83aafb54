#!/bin/bash
# Round-4 campaign finalization: benchmark everything under the FINAL
# engine (warm-started LCP), rebuild ensembles, regenerate the claim table.
# Run after training phases complete.
set -u -o pipefail
cd /root/repo
R2=training/run_data/round2_campaign
R3=training/run_data/round3_campaign
R4=training/run_data/round4_campaign

case "${1:-all}" in
  pool|all)
    # one shared-compile pass over every claim-table candidate
    python tools/benchmark_pool.py \
      $R2/tqc_gen_w $R2/tqc_gen_w_s1 $R2/tqc_gen_w_s2 $R2/tqc_gen_w_s3 \
      $R2/tqc_gen_mix $R2/tqc_gen_mix_s1 $R2/tqc_gen_wp $R2/tqc_gen_wp_s1 \
      $R2/tqc_ft21_industrial $R2/tqc_ft21_library1 $R2/tqc_ft21_library2 \
      $R2/tqc_ft21_rand_start $R2/tqc_ft21_reachao1 $R2/tqc_ft21_reachao2 \
      $R2/tqc_ft21_reachao3 $R2/tqc_ft21_reachao_rand $R2/tqc_ft21_workshop \
      $R3/tqc_r3_gen_w $R3/tqc_r3_rand_start $R3/tqc_r3_reachao3 \
      $R3/tqc_r3_wang3 \
      $(ls -d $R4/tqc_r4_* 2>/dev/null) \
      --episodes 100 --horizon 300
    ;&
  ensembles)
    # generalist ensemble refresh (final engine)
    timeout 3600 python tools/evaluate.py $R2/tqc_gen_w $R2/tqc_gen_w_s1 \
      $R2/tqc_gen_w_s2 $R2/tqc_gen_w_s3 \
      --strategy bayesian_fusion --out $R2/tqc_gen_w/benchmark_ens_w4
    # generalist + r4 big-batch generalist fusion (if trained)
    if [ -f $R4/tqc_r4_gen/best_model.ckpt ]; then
      timeout 3600 python tools/evaluate.py $R4/tqc_r4_gen $R2/tqc_gen_w_s2 \
        $R2/tqc_gen_w_s3 $R2/tqc_gen_w \
        --strategy bayesian_fusion --out $R4/tqc_r4_gen/benchmark_ens_g4
    fi
    ;&
  scene_ens)
    # per-scene seed ensembles (round-1's strongest mechanism): fuse the
    # seeds per scene, benchmark ONLY that scene
    ens () { # out_run out_tag scene runs...
      local out=$1 tag=$2 sc=$3; shift 3
      timeout 1800 python tools/evaluate.py "$@" --scenarios "$sc" \
        --strategy bayesian_fusion --out "$out/benchmark_ens_$tag"
    }
    [ -f $R4/tqc_r4_rs_s1/best_model.ckpt ] && \
      ens $R4/tqc_r4_rs_s1 rs3 reachao_rand_start \
        $R4/tqc_r4_rs_s1 $R4/tqc_r4_rs_s2 $R2/tqc_ft21_rand_start
    # members picked from the round-4 pool benchmark's top scorers per
    # scene (cross-scene members are deliberate — the ensemble claims only
    # the scene it is evaluated on)
    [ -f $R4/tqc_r4_w3_s2/best_model.ckpt ] && \
      ens $R4/tqc_r4_w3_s2 w3x reachao3 \
        $R4/tqc_r4_w3_s2 $R4/tqc_r4_rr_s1 $R3/tqc_r3_wang3 && \
      ens $R4/tqc_r4_w3_s2 w3xw wangexp-3 \
        $R4/tqc_r4_w3_s2 $R4/tqc_r4_rr_s1 $R3/tqc_r3_wang3
    [ -f $R4/tqc_r4_rr_s1/best_model.ckpt ] && \
      ens $R4/tqc_r4_rr_s1 rr3 reachao_rand \
        $R4/tqc_r4_rr_s1 $R4/tqc_r4_w3_s2 $R3/tqc_r3_wang3
    [ -f $R4/tqc_r4_ao2_s1/best_model.ckpt ] && \
      ens $R4/tqc_r4_ao2_s1 ao2x reachao2 \
        $R4/tqc_r4_ao2_s1 $R4/tqc_r4_rr_s1 $R2/tqc_ft21_reachao2
    ;&
  summary)
    # link everything into the round-4 campaign dir and summarize
    mkdir -p $R4
    for d in $R2/tqc_gen_w $R2/tqc_gen_w_s1 $R2/tqc_gen_w_s2 \
             $R2/tqc_gen_w_s3 $R2/tqc_gen_mix $R2/tqc_gen_mix_s1 \
             $R2/tqc_gen_wp $R2/tqc_gen_wp_s1 $R2/tqc_ft21_industrial \
             $R2/tqc_ft21_library1 $R2/tqc_ft21_library2 \
             $R2/tqc_ft21_rand_start $R2/tqc_ft21_reachao1 \
             $R2/tqc_ft21_reachao2 $R2/tqc_ft21_reachao3 \
             $R2/tqc_ft21_reachao_rand $R2/tqc_ft21_workshop \
             $R3/tqc_r3_gen_w $R3/tqc_r3_rand_start $R3/tqc_r3_reachao3 \
             $R3/tqc_r3_wang3; do
      ln -sfn ../$(basename $(dirname $d))/$(basename $d) $R4/$(basename $d)
    done
    python tools/summarize_campaign.py $R4
    ;;
esac
