"""Cross-seed fusion of the pop_rs population on reachao_rand_start
(VERDICT r4 #3, round-4 mechanism: per-scene bayesian fusion of seeds).

Reads the per-member benchmark rows written by tools/pop_rs_bench.sh
(pop_rs/m<i>/benchmark.json), ranks members by rand_start success, and
benchmarks bayesian fusions of the top-3/4/5 seeds via tools/evaluate.py.
Writes pop_rs/fusions.json with every fusion's row and the best claim.

Usage: python tools/pop_rs_fuse.py [--scene reachao_rand_start]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = os.path.join(REPO, "training/run_data/round5_campaign")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="reachao_rand_start")
    p.add_argument("--episodes", type=int, default=100)
    p.add_argument("--sizes", nargs="+", type=int, default=[3, 4, 5])
    p.add_argument("--pops", nargs="+", default=["pop_rs"],
                   help="population run names under round5_campaign; "
                        "members pool and rank ACROSS runs")
    p.add_argument("--out-pop", default=None,
                   help="run that owns fusions.json + fusion benchmarks "
                        "(default: first of --pops)")
    args = p.parse_args()

    out_pop = os.path.join(BASE, args.out_pop or args.pops[0])
    rows = {}   # member label "popname/mI" -> success
    for pop in args.pops:
        for i in range(16):
            path = os.path.join(BASE, pop, f"m{i}", "benchmark.json")
            if os.path.exists(path):
                with open(path) as f:
                    b = json.load(f)
                if args.scene in b:
                    rows[f"{pop}/m{i}"] = b[args.scene]["success_rate"]
    if not rows:
        raise SystemExit("no per-member benchmark rows; run pop_rs_bench.sh")
    ranked = sorted(rows, key=rows.get, reverse=True)
    print("per-member:", json.dumps({m: rows[m] for m in ranked}))

    out = {"scene": args.scene, "per_member": rows, "fusions": {}}
    best = max(rows.values())
    best_name = ranked[0]
    for n in args.sizes:
        if n > len(ranked):
            continue
        members = ranked[:n]
        tag = "ens_" + "_".join(m.replace("pop_rs", "r").replace("/m", "")
                                for m in members)
        out_prefix = os.path.join(out_pop, f"benchmark_{tag}")
        cmd = [sys.executable, "tools/evaluate.py",
               *[os.path.join(BASE, m) for m in members],
               "--strategy", "bayesian_fusion",
               "--scenarios", args.scene,
               "--episodes", str(args.episodes),
               "--out", out_prefix]
        print("::", " ".join(cmd), flush=True)
        r = subprocess.run(cmd, cwd=REPO)
        jpath = out_prefix + ".json"
        if r.returncode == 0 and os.path.exists(jpath):
            with open(jpath) as f:
                res = json.load(f)
            sr = res[args.scene]["success_rate"]
            out["fusions"][tag] = {
                "members": members, "success_rate": sr,
                "collision_rate": res[args.scene]["collision_rate"]}
            print(f"fusion {tag}: success={sr:.3f}")
            if sr > best:
                best, best_name = sr, tag
        else:
            print(f"!! fusion {tag} failed (rc={r.returncode})")
    out["best"] = {"name": best_name, "success_rate": best}
    with open(os.path.join(out_pop, "fusions.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"rand_start_best": best, "claimant": best_name}))


if __name__ == "__main__":
    main()
