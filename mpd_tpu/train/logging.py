"""Experiment logging: stdout always, wandb when available + enabled.

Counterpart of the reference's wandb usage (mpd/trainer/trainer.py:265,
summary_trajectory_generation.py:45-84; disabled by default there too).
"""

from __future__ import annotations

from typing import Dict, Optional


class ExperimentLogger:
    def __init__(
        self,
        project: Optional[str] = None,
        entity: Optional[str] = None,
        group: Optional[str] = None,
        config: Optional[Dict] = None,
        mode: str = "disabled",  # disabled | online | offline
    ):
        self._wandb = None
        if mode != "disabled" and project:
            try:
                import wandb

                wandb.init(project=project, entity=entity, group=group,
                           config=config or {}, mode=mode)
                self._wandb = wandb
            except Exception as e:  # wandb not installed / no network
                print(f"[logger] wandb unavailable ({e}); stdout only")

    def log(self, metrics: Dict, step: Optional[int] = None):
        items = " ".join(f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                         for k, v in metrics.items())
        print(f"[step {step}] {items}", flush=True)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_image(self, name: str, path: str, step: Optional[int] = None):
        """Log a figure file (wandb image when enabled; the PNG on disk is
        the always-available artifact — ref
        summary_trajectory_generation.py:53-84 logs figures to wandb)."""
        if self._wandb is not None:
            try:
                self._wandb.log({name: self._wandb.Image(path)}, step=step)
            except Exception as e:
                print(f"[logger] image log failed ({e})")

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
