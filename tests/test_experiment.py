"""Experiment-config subsystem tests (yaml round-trip, CLI overrides, sweep)."""

import os

import yaml

from mpd_tpu.core import Launcher, run_experiment, single_experiment_yaml


def test_defaults_and_yaml_roundtrip(tmp_path):
    calls = {}

    @single_experiment_yaml
    def experiment(lr: float = 3e-4, batch_size: int = 128,
                   seed: int = 0, results_dir: str = "logs", **kwargs):
        calls.update(lr=lr, batch_size=batch_size, results_dir=results_dir)
        return lr

    out = experiment(lr=1e-3, results_dir=str(tmp_path))
    assert out == 1e-3
    assert calls["batch_size"] == 128
    saved = yaml.safe_load(open(tmp_path / "0" / "args.yaml"))
    assert saved["lr"] == 1e-3 and saved["batch_size"] == 128 and saved["seed"] == 0
    # results_dir passed to the fn is the seed subdir (ref behavior)
    assert calls["results_dir"] == str(tmp_path / "0")


def test_run_experiment_cli_overrides(tmp_path):
    got = {}

    @single_experiment_yaml
    def experiment(n_steps: int = 10, name: str = "x",
                   seed: int = 0, results_dir: str = "logs", **kwargs):
        got.update(n_steps=n_steps, name=name)

    run_experiment(experiment, argv=["--n-steps", "42", "--name", "abc",
                                     "--results-dir", str(tmp_path)])
    assert got == {"n_steps": 42, "name": "abc"}


def test_launcher_sweep_product(tmp_path):
    launcher = Launcher(exp_name="t", exp_file="x.py", n_seeds=2,
                        results_dir=str(tmp_path))
    launcher.add_experiment(lr__=[1e-3, 3e-4], dim__=[16, 32], tag="a")
    assert len(launcher._experiments) == 4
    # test mode prints without executing
    assert launcher.run(test=True) == 0
