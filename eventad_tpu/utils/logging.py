"""Experiment run logging.

Reference: src/dagr/utils/logging.py wires wandb (run dirs, hparams, bbox
overlay images). wandb is not available in air-gapped TPU pods, so this
logger writes the same content locally: JSONL metric streams + hparams.json
+ overlay PNGs, with an optional wandb passthrough when importable."""
from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Optional


class RunLogger:
    def __init__(self, log_dir, hparams=None, use_wandb: bool = False,
                 project: str = "eventad-tpu"):
        self.dir = Path(log_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._f = open(self.dir / "metrics.jsonl", "a")
        self._wandb = None
        if hparams is not None:
            if dataclasses.is_dataclass(hparams):
                hparams = dataclasses.asdict(hparams)
            with open(self.dir / "hparams.json", "w") as f:
                json.dump({k: str(v) for k, v in dict(hparams).items()}, f,
                          indent=1)
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project=project, dir=str(self.dir),
                                         config=hparams)
            except ImportError:
                pass

    def log(self, metrics: dict, step: Optional[int] = None):
        rec = {"time": time.time(), **metrics}
        if step is not None:
            rec["step"] = step
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_image(self, name: str, image, step: int = 0):
        import cv2
        import numpy as np
        path = self.dir / f"{name}_{step}.png"
        cv2.imwrite(str(path), np.asarray(image))
        return path

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
