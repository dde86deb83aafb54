"""Metrics logging: JSONL always, W&B / TensorBoard when available.

Replaces wandb_utils/wandb_logging.py (:16-36 login/init/log helpers) and
the SB3 tensorboard sync (setup_training.py:122, 148-173 init_wandb).  W&B
is optional — this image has no network egress, so the default sink is a
JSONL run file under training/run_data/<group>/<name>/ mirroring the
reference's run-dir layout (load_model_utils.py:14-50)."""
from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, is_dataclass
from typing import Dict, Optional


class RunLogger:
    def __init__(self, group: str = "default", name: Optional[str] = None,
                 config=None, root: str = "training/run_data",
                 use_wandb: bool = False, use_tensorboard: bool = False,
                 project: str = "panda-gym-tpu"):
        stamp = time.strftime("%Y%m%d_%H%M%S")
        self.name = name or f"run_{stamp}"
        self.dir = os.path.join(root, group, self.name)
        os.makedirs(self.dir, exist_ok=True)
        self._fh = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._wandb = None
        self._tb = None
        if config is not None:
            cfg = asdict(config) if is_dataclass(config) else dict(config)
            # serialize hyperparams as a plain dict so eval can rebuild the
            # exact learner (net_arch overrides etc.), like the reference's
            # W&B config.yaml round-trip (load_model_utils.py:43-50)
            hp = cfg.pop("hyperparams", None)
            if hp is not None and hasattr(hp, "as_dict"):
                cfg["hyperparams"] = hp.as_dict()
            elif isinstance(hp, dict):
                cfg["hyperparams"] = hp
            with open(os.path.join(self.dir, "config.json"), "w") as f:
                json.dump(cfg, f, indent=1, default=str)
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project=project, group=group,
                                         name=self.name, config=config)
            except Exception as e:  # no wandb / no network
                print(f"wandb unavailable ({e}); logging to JSONL only")
        if use_tensorboard:
            # reference: SB3 writes TB events, W&B syncs them
            # (setup_training.py:122 tensorboard_log, :163 sync_tensorboard)
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(self.dir, "tb"))
            except Exception as e:
                print(f"tensorboard unavailable ({e}); logging to JSONL only")

    def log(self, row: Dict):
        row = dict(row, _t=time.time())
        self._fh.write(json.dumps(row, default=float) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(row)
        if self._tb is not None:
            step = int(row.get("global_step", row.get("step", 0)) or 0)
            for k, v in row.items():
                if k.startswith("_"):
                    continue
                try:
                    self._tb.add_scalar(k, float(v), step)
                except (TypeError, ValueError):
                    pass  # non-scalar fields stay JSONL-only

    def close(self):
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._tb is not None:
            self._tb.close()


def get_run_dirs(group: str, root: str = "training/run_data"):
    """All run dirs of a group, newest last (load_model_utils.py:14-24)."""
    base = os.path.join(root, group)
    if not os.path.isdir(base):
        return []
    return sorted(os.path.join(base, d) for d in os.listdir(base)
                  if os.path.isdir(os.path.join(base, d)))


def load_run(run_dir: str):
    """Rebuild the TrainConfig + locate checkpoints from a run dir
    (load_model_utils.py:26-50: best_model.zip + config.yaml -> TrainConfig;
    here: model_*.ckpt / final.ckpt + config.json).

    Returns (config, checkpoint_paths) with the preferred evaluation
    checkpoint last: best_model.ckpt if present (what the reference's
    loader resolves), else final.ckpt.  Per-scene best_model_<scene>.ckpt
    eval artifacts are excluded from the stage-checkpoint list.
    """
    from panda_gym_tpu.rl.config import Hyperparameters, TrainConfig

    cfg = TrainConfig()
    cfg_path = os.path.join(run_dir, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            raw = json.load(f)
        hp_raw = raw.pop("hyperparams", None)
        for k, v in raw.items():
            if hasattr(cfg, k):
                setattr(cfg, k, v)
        # rebuild the exact hyperparameters (incl. net_arch overrides) so a
        # loaded checkpoint gets the same network it was trained with;
        # configs from before hyperparams serialization fall back to the
        # algorithm preset (the old behavior)
        hp = Hyperparameters(cfg.algorithm)
        if isinstance(hp_raw, dict):
            for k, v in hp_raw.items():
                setattr(hp, k, v)
        cfg.hyperparams = hp
    ckpts = sorted(
        os.path.join(run_dir, f) for f in os.listdir(run_dir)
        if f.endswith(".ckpt") and f != "final.ckpt"
        and not f.startswith("best_model"))
    final = os.path.join(run_dir, "final.ckpt")
    if os.path.exists(final):
        ckpts.append(final)
    best = os.path.join(run_dir, "best_model.ckpt")
    if os.path.exists(best):
        ckpts.append(best)
    return cfg, ckpts
