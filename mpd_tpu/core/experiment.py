"""Experiment configuration + launching.

Counterpart of the reference's `experiment_launcher` dependency
(TU-Darmstadt; consumed at reference scripts/inference/inference.py:13,
34, 437-439 and scripts/*/launch_*.py — SURVEY section 5.6):

- `@single_experiment_yaml` turns a function's keyword defaults into a
  CLI/yaml-overridable config and writes the resolved `args.yaml` into
  `results_dir/<seed>/` — the config round-trip the dataset loader and
  inference rely on.
- `run_experiment(fn)` executes it with CLI overrides applied.
- `Launcher` fans a sweep out over local processes (the reference used SLURM
  arrays; the TPU-native equivalent of its cluster mode is per-host context
  sharding via mpd_tpu.parallel.shard_contexts — see datagen).

Sweep keys use the reference's trailing-double-underscore convention:
`add_experiment(batch_size__=[64, 128], lr=3e-4)` marks `batch_size` as a
swept axis (cartesian product over all swept keys).
"""

from __future__ import annotations

import argparse
import functools
import inspect
import itertools
import os
import subprocess
import sys
from typing import Any, Callable, Dict, List, Optional, Sequence

import yaml


def _fn_defaults(fn: Callable) -> Dict[str, Any]:
    sig = inspect.signature(fn)
    out = {}
    for name, p in sig.parameters.items():
        if p.kind in (p.VAR_KEYWORD, p.VAR_POSITIONAL):
            continue
        out[name] = None if p.default is inspect.Parameter.empty else p.default
    return out


def single_experiment_yaml(fn: Callable) -> Callable:
    """Decorator: keyword defaults become the config schema; the wrapper
    accepts overrides, writes results_dir/<seed>/args.yaml, then calls fn."""

    @functools.wraps(fn)
    def wrapper(**overrides):
        cfg = _fn_defaults(fn)
        unknown = set(overrides) - set(cfg)
        cfg.update({k: v for k, v in overrides.items() if k in cfg})

        results_dir = cfg.get("results_dir") or "logs"
        seed = cfg.get("seed", 0)
        run_dir = os.path.join(results_dir, str(seed))
        os.makedirs(run_dir, exist_ok=True)
        with open(os.path.join(run_dir, "args.yaml"), "w") as f:
            yaml.safe_dump({k: v for k, v in cfg.items() if _yamlable(v)}, f)
        cfg["results_dir"] = run_dir

        extra = {k: overrides[k] for k in unknown}
        return fn(**cfg, **extra) if _accepts_kwargs(fn) else fn(**cfg)

    wrapper.__experiment_defaults__ = _fn_defaults(fn)
    return wrapper


def _accepts_kwargs(fn) -> bool:
    return any(
        p.kind == p.VAR_KEYWORD for p in inspect.signature(fn).parameters.values()
    )


def _yamlable(v) -> bool:
    try:
        yaml.safe_dump(v)
        return True
    except Exception:
        return False


def run_experiment(fn: Callable, argv: Optional[Sequence[str]] = None):
    """Parse --key value CLI overrides against fn's schema and run it."""
    defaults = getattr(fn, "__experiment_defaults__", None) or _fn_defaults(fn)
    parser = argparse.ArgumentParser()
    for name, default in defaults.items():
        arg = "--" + name.replace("_", "-")
        if isinstance(default, bool):
            parser.add_argument(arg, type=lambda s: s.lower() in ("1", "true", "yes"),
                                default=default)
        elif isinstance(default, (int, float, str)) or default is None:
            parser.add_argument(arg, type=type(default) if default is not None else str,
                                default=default)
    args, _ = parser.parse_known_args(argv)
    return fn(**vars(args))


class Launcher:
    """Local multi-process sweep fan-out (counterpart of the reference's
    SLURM Launcher; contract at reference launch_train_01.py:30-126)."""

    def __init__(
        self,
        exp_name: str,
        exp_file: str,
        n_seeds: int = 1,
        n_exps_in_parallel: int = 1,
        results_dir: str = "logs",
        inject_defaults: bool = True,
        **kwargs,
    ):
        self.exp_name = exp_name
        self.exp_file = exp_file
        self.n_seeds = n_seeds
        self.n_parallel = max(1, n_exps_in_parallel)
        self.results_dir = results_dir
        self.inject_defaults = inject_defaults
        self._experiments: List[Dict[str, Any]] = []

    def add_experiment(self, **params):
        """Trailing '__' marks swept keys; the cartesian product over all
        swept keys becomes individual experiments."""
        sweep_keys = [k for k in params if k.endswith("__")]
        fixed = {k: v for k, v in params.items() if not k.endswith("__")}
        if sweep_keys:
            axes = [params[k] for k in sweep_keys]
            for combo in itertools.product(*axes):
                cfg = dict(fixed)
                cfg.update({k[:-2]: v for k, v in zip(sweep_keys, combo)})
                self._experiments.append(cfg)
        else:
            self._experiments.append(fixed)

    def run(self, local: bool = True, test: bool = False) -> int:
        """Run every (experiment x seed) as a subprocess; returns the number
        of failed runs. test=True prints the commands without running."""
        jobs = []
        for cfg in self._experiments:
            for seed in range(self.n_seeds):
                cmd = [sys.executable, self.exp_file]
                full = dict(cfg)
                if self.inject_defaults:
                    full.setdefault("seed", seed)
                    full.setdefault(
                        "results_dir", os.path.join(self.results_dir, self.exp_name)
                    )
                for k, v in full.items():
                    # bools map to bare store_true flags: True -> --flag,
                    # False -> omitted (argparse store_true takes no value)
                    if isinstance(v, bool):
                        if v:
                            cmd += ["--" + k.replace("_", "-")]
                    else:
                        cmd += ["--" + k.replace("_", "-"), str(v)]
                jobs.append(cmd)

        if test:
            for cmd in jobs:
                print(" ".join(cmd))
            return 0

        failures = 0
        running: List[subprocess.Popen] = []
        for cmd in jobs:
            while len(running) >= self.n_parallel:
                for pr in list(running):
                    if pr.poll() is not None:
                        failures += int(pr.returncode != 0)
                        running.remove(pr)
                else:
                    import time

                    time.sleep(0.2)
            running.append(subprocess.Popen(cmd))
        for pr in running:
            pr.wait()
            failures += int(pr.returncode != 0)
        return failures


def is_local() -> bool:
    """The reference's SLURM-vs-local probe; always local here."""
    return "SLURM_JOB_ID" not in os.environ
