"""Checkpoint / resume: learner + replay buffer + env/PRNG state via orbax.

The reference checkpoints only SB3 model zips per curriculum stage
(setup_training.py:287-299) and resumes manually (continue_learning,
setup_training.py:383-422).  Here a checkpoint captures the full training
state — TrainState pytree, HER buffer, PRNG key, timestep/stage counters —
so a run resumes bit-exactly.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(path: str, payload: Dict[str, Any]):
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(payload), force=True)
    return path


def load_checkpoint(path: str, template: Optional[Dict[str, Any]] = None):
    ocp = _ocp()
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), item=template)
    return ckptr.restore(os.path.abspath(path))


class CheckpointManager:
    """Rolling per-stage checkpoints (model.save per stage equivalent,
    setup_training.py:299)."""

    def __init__(self, root: str, keep: int = 5):
        self.root = root
        self.keep = keep
        os.makedirs(root, exist_ok=True)

    def save(self, step: int, payload: Dict[str, Any]):
        path = os.path.join(self.root, f"ckpt_{step}")
        save_checkpoint(path, payload)
        self._gc()
        return path

    def latest(self) -> Optional[str]:
        cands = sorted(
            (int(d.split("_")[1]), d) for d in os.listdir(self.root)
            if d.startswith("ckpt_"))
        return os.path.join(self.root, cands[-1][1]) if cands else None

    def _gc(self):
        cands = sorted(
            (int(d.split("_")[1]), d) for d in os.listdir(self.root)
            if d.startswith("ckpt_"))
        for _, d in cands[:-self.keep]:
            import shutil
            shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
