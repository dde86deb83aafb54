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
                 use_wandb: bool = False, project: str = "panda-gym-tpu"):
        stamp = time.strftime("%Y%m%d_%H%M%S")
        self.name = name or f"run_{stamp}"
        self.dir = os.path.join(root, group, self.name)
        os.makedirs(self.dir, exist_ok=True)
        self._fh = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._wandb = None
        if config is not None:
            cfg = asdict(config) if is_dataclass(config) else dict(config)
            cfg.pop("hyperparams", None)
            with open(os.path.join(self.dir, "config.json"), "w") as f:
                json.dump(cfg, f, indent=1, default=str)
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project=project, group=group,
                                         name=self.name, config=config)
            except Exception as e:  # no wandb / no network
                print(f"wandb unavailable ({e}); logging to JSONL only")

    def log(self, row: Dict):
        row = dict(row, _t=time.time())
        self._fh.write(json.dumps(row, default=float) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(row)

    def close(self):
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
