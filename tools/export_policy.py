"""Export trained policies as git-friendly actor-only .policy.npz files.

Usage:
    python tools/export_policy.py RUN_DIR [RUN_DIR ...] [--ckpt NAME ...]

For each run dir, each named checkpoint (default: best_model.ckpt plus any
best_model_<scene>.ckpt) is exported to <stem>.policy.npz next to it.
These ~0.4 MB exports are what gets committed (see .gitignore); the 4 MB
full TrainState .ckpt pickles stay working-tree-only.  tools/evaluate.py
and tools/benchmark_pool.py load either format.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("runs", nargs="+")
    p.add_argument("--ckpt", nargs="+", default=None,
                   help="checkpoint filenames to export (default: "
                        "best_model.ckpt + best_model_*.ckpt + "
                        "final_model.ckpt)")
    args = p.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from panda_gym_tpu.rl.logging_utils import load_run
    from panda_gym_tpu.rl.policy_io import export_policy

    for run_dir in args.runs:
        cfg, _ = load_run(run_dir)
        names = args.ckpt
        if names is None:
            names = sorted(
                os.path.basename(c) for c in
                glob.glob(os.path.join(run_dir, "best_model*.ckpt")) +
                glob.glob(os.path.join(run_dir, "final_model.ckpt")))
        for nm in names:
            src = os.path.join(run_dir, nm)
            if not os.path.exists(src):
                print(f"!! {src} missing, skipped")
                continue
            out = os.path.join(run_dir, nm[:-len(".ckpt")] + ".policy.npz")
            export_policy(src, out, config=cfg)
            print(f"{src} -> {out} "
                  f"({os.path.getsize(out) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
