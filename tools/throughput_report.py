"""Large-batch training-throughput evidence (VERDICT r3 #2 / r2 #8).

Compares the interleaved training runs produced by
`tools/campaign_round4_train.sh throughput` (reachao1, equal 100k sample
budget, n_envs 64 vs 512) and writes THROUGHPUT_r04.json at the repo root:
steady-state training steps/s (median over rollout-row deltas, excluding
compile/eval stalls via the pure t_collect+t_update clock as well), final
eval success, and the speedup ratio.

Reference scale axis: SubprocVecEnv n_envs (setup_training.py:44-47),
default 8 — the reference cannot scale envs without one OS process each;
here the same Trainer shards 512 envs onto one chip and interleaves update
bursts inside the compiled rollout (rl/train.py rollout_train).
"""
from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def analyze(run_dir: str):
    rows = [json.loads(l)
            for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    tr = [r for r in rows if "rollout_success" in r]
    ts = [(r["timesteps"], r["_t"], r.get("t_collect", 0.0),
           r.get("t_update", 0.0)) for r in tr]
    wall = [(b[0] - a[0]) / (b[1] - a[1])
            for a, b in zip(ts[:-1], ts[1:]) if b[1] > a[1]]
    pure = [(b[0] - a[0]) / max(b[2] + b[3], 1e-9)
            for a, b in zip(ts[:-1], ts[1:])]
    evals = [r["eval_success"] for r in rows if "eval_success" in r]
    return {
        "rollout_rows": len(tr),
        "total_timesteps": ts[-1][0] if ts else 0,
        "steady_sps_wall_median": round(statistics.median(wall), 1) if wall else None,
        "train_loop_sps_median": round(statistics.median(pure), 1) if pure else None,
        "eval_success_final": evals[-1] if evals else None,
        "eval_success_max": max(evals) if evals else None,
    }


def main():
    base = os.path.join(REPO, "training/run_data/round4_campaign")
    runs = sys.argv[1:] or ["tp_reach_64", "tp_reach_512"]
    out = {}
    for name in runs:
        out[name] = analyze(os.path.join(base, name))
        print(name, json.dumps(out[name]))
    if len(runs) == 2:
        a, b = (out[r] for r in runs)
        if a["train_loop_sps_median"] and b["train_loop_sps_median"]:
            out["speedup_train_loop"] = round(
                b["train_loop_sps_median"] / a["train_loop_sps_median"], 2)
            out["speedup_wall"] = round(
                b["steady_sps_wall_median"] / a["steady_sps_wall_median"], 2)
            print("speedup (train loop):", out["speedup_train_loop"],
                  "| wall:", out["speedup_wall"])
    out["analysis"] = (
        "Interleaved fused rollout_train is the big lever: reachao1 "
        "training at n_envs=64 went from ~2.4k steps/s (round-3 "
        "collect-then-update, tqc_r3_* metrics) to ~22.9k steps/s pure "
        "train-loop (tp_reach_64). At FIXED updates-per-transition the "
        "loop is update-bound, so raising n_envs 64->512 adds only ~26% "
        "(tp_reach_512 28.8k): collect cost per transition shrinks with "
        "batch but gradient cost per transition is constant — the round-2 "
        "'>=5x at 512' expectation assumed a collect-bound loop. Large "
        "batch instead buys sample-scale: tqc_r4_gen sustained 11.3k "
        "wall steps/s across a 23-scene mixture at n_envs=512 (4.7x the "
        "round-3 campaign rate) and trained 10M fresh steps in one "
        "sitting, eval peak 0.79 with no interleave collapse under the "
        "learning-starts ramp + buffer-fill gate.")
    with open(os.path.join(REPO, "THROUGHPUT_r04.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
