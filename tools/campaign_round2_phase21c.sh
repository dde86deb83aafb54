#!/bin/bash
# Phase 21c (round 2): same-scene fusion of each mid-tier specialist with the
# two weighted generalists (round 1: small same-scene ensembles beat every
# solo model; the generalists are competent on every scene, so they qualify
# as same-scene members here — unlike round 1's catastrophic cross-scene
# specialist fusions).  Eval-only; claims one scene per output.
set -u -o pipefail
cd /root/repo
GROUP=round2_campaign
RD=training/run_data/$GROUP
G1=$RD/tqc_gen_w
G2=$RD/tqc_gen_w_s1

fuse () { # specialist_run scene
  echo "=== phase21c fusion $1 on $2 ==="
  timeout 3600 python tools/evaluate.py $RD/"$1" $G1 $G2 \
    --scenarios "$2" --episodes 100 --strategy bayesian_fusion \
    --out $RD/"$1"/benchmark_ens3 2>&1 | tail -4
}

fuse tqc_ft21_reachao2     reachao2
fuse tqc_ft21_reachao3     reachao3
fuse tqc_ft21_reachao_rand reachao_rand
fuse tqc_ft21_rand_start   reachao_rand_start
fuse tqc_ft21_workshop     workshop
fuse tqc_ft21_reachao1     reachao1

# wangexp-3 rides the reachao3 members
echo "=== phase21c fusion tqc_ft21_reachao3 on wangexp-3 ==="
timeout 3600 python tools/evaluate.py $RD/tqc_ft21_reachao3 $G1 $G2 \
  --scenarios wangexp-3 --episodes 100 --strategy bayesian_fusion \
  --out $RD/tqc_ft21_reachao3/benchmark_ens3_wangexp 2>&1 | tail -4

python tools/summarize_campaign.py $RD
echo "=== phase21c done ==="
