"""Summarize a training campaign: per-run benchmark tables -> one combined
per-scene table (generalist + per-scene fine-tune + best-of), written as
summary.md / summary.json next to the runs.

Equivalent of the reference's cross-run W&B report tables
(setup_training.py:369-381 wandb.Table logging); here a plain artifact.

Usage: python tools/summarize_campaign.py training/run_data/round1_campaign
"""
from __future__ import annotations

import json
import os
import re
import sys


def canonical_scene(component: str) -> str:
    """Strip curriculum-variant suffixes (_rs random-start, _hN wall height,
    _pNN start-pose probability) down to the canonical scene name; suffixes
    can stack (e.g. 'wall_h22_p100' -> 'wall'), so strip to fixpoint."""
    while True:
        stripped = re.sub(r"(_rs|_h\d+|_p\d+)$", "", component)
        if stripped == component:
            return stripped
        component = stripped


def load_benchmarks(group_dir: str):
    runs, trained_scenes = {}, {}
    for name in sorted(os.listdir(group_dir)):
        path = os.path.join(group_dir, name, "benchmark.json")
        if os.path.isfile(path):
            with open(path) as f:
                runs[name] = json.load(f)
            # the scenes a run "claims" = its training stages; mixture
            # stages ('a+b+c') claim every component, and curriculum-variant
            # suffixes (_rs random-start, _hN wall height, _pNN start-pose
            # probability) claim their canonical scene
            cfg_path = os.path.join(group_dir, name, "config.json")
            stages = []
            if os.path.isfile(cfg_path):
                with open(cfg_path) as f:
                    stages = json.load(f).get("stages", [])
            claimed = {canonical_scene(comp)
                       for s in stages for comp in s.split("+")}
            # reachao3 and wangexp-3 evaluate identically at benchmark
            # time (same hollow-sphere goal + wang obstacle sampler;
            # pose randomization is a training-only axis — every run's
            # benchmark.json rows for the two scenes are equal), so a
            # specialist for one claims the other
            if {"reachao3", "wangexp-3", "wangexp"} & claimed:
                claimed |= {"reachao3", "wangexp-3"}
            trained_scenes[name] = claimed
        # ensemble eval results (evaluate_ensemble equivalent): candidate
        # "models" named <run>+<suffix>; they claim exactly the scenes they
        # were evaluated on (members were chosen per scene deliberately)
        run_dir = os.path.join(group_dir, name)
        if os.path.isdir(run_dir):
            for fn in sorted(os.listdir(run_dir)):
                if fn.startswith("benchmark_ens") and fn.endswith(".json"):
                    ens_name = f"{name}+{fn[len('benchmark_'):-len('.json')]}"
                    with open(os.path.join(run_dir, fn)) as f:
                        runs[ens_name] = json.load(f)
                    trained_scenes[ens_name] = set(runs[ens_name])
    return runs, trained_scenes


def summarize(group_dir: str):
    runs, trained_scenes = load_benchmarks(group_dir)
    if not runs:
        raise SystemExit(f"no benchmark.json under {group_dir}")
    # the "generalist" column = the best single model/ensemble benchmarked
    # on EVERY scene; the scene list comes from the widest benchmark (ties
    # broken toward a "base"-named run, round 1's convention)
    ref_name = max(runs, key=lambda n: (len(runs[n]), "base" in n))
    scenes = list(runs[ref_name].keys())
    full = {n: r for n, r in runs.items() if all(s in r for s in scenes)}
    base_name = max(full, key=lambda n: sum(
        full[n][s]["success_rate"] for s in scenes))

    summary = {}
    for scene in scenes:
        per_run = {n: r[scene]["success_rate"] for n, r in runs.items()
                   if scene in r}
        # a fine-tune run only "claims" the scene(s) it trained on (from its
        # config.json stages — name matching is ambiguous: narrow_tunnel
        # contains/ends-with tunnel); the generalist claims all
        candidates = {n: s for n, s in per_run.items()
                      if n == base_name or scene in trained_scenes.get(n, ())}
        best_run = max(candidates, key=candidates.get)
        summary[scene] = {
            "base_success": per_run.get(base_name),
            "best_success": candidates[best_run],
            "best_model": best_run,
            "collision_rate_best": runs[best_run][scene]["collision_rate"],
        }

    with open(os.path.join(group_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)

    lines = ["| scene | generalist | best model | success | collision |",
             "|---|---|---|---|---|"]
    for scene, row in summary.items():
        lines.append(
            f"| {scene} | {row['base_success']:.2f} | {row['best_model']} "
            f"| {row['best_success']:.2f} | {row['collision_rate_best']:.2f} |")
    md = "\n".join(lines) + "\n"
    with open(os.path.join(group_dir, "summary.md"), "w") as f:
        f.write(md)
    print(md)
    mean_best = sum(r["best_success"] for r in summary.values()) / len(summary)
    mean_base = sum(r["base_success"] for r in summary.values()) / len(summary)
    print(f"mean success: generalist {mean_base:.3f} ({base_name}) "
          f"-> per-scene best {mean_best:.3f}")
    return summary


if __name__ == "__main__":
    summarize(sys.argv[1] if len(sys.argv) > 1
              else "training/run_data/round1_campaign")
