#!/usr/bin/env python
"""Training sweep launcher.

Counterpart of the reference's scripts/train_diffusion/launch_train_01.py
(SLURM array sweep over 4 datasets x 2 U-Net widths): the same grid, fanned
out over local processes via mpd_tpu.core.Launcher. On a multi-host setup,
shard the sweep by host with mpd_tpu.parallel.shard_contexts over the
experiment index instead.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mpd_tpu.core import Launcher

TASKS = [
    "EnvSimple2D-RobotPointMass",
    "EnvDense2D-RobotPointMass",
    "EnvNarrowPassageDense2D-RobotPointMass",
    "EnvSpheres3D-RobotPanda",
]

if __name__ == "__main__":
    launcher = Launcher(
        exp_name="train_diffusion_sweep",
        exp_file=os.path.join(os.path.dirname(__file__), "train.py"),
        n_seeds=1,
        n_exps_in_parallel=1,  # one TPU chip: serialize
        inject_defaults=False,  # train.py manages its own seed/results layout
    )
    for task in TASKS:
        launcher.add_experiment(
            data=f"data_trajectories/{task}",
            out=f"data_trained_models/{task}",
            # reference sweep values (launch_train_01.py:87,71-118)
            batch_size=128,
            lr=3e-4,
            unet_dim_mults_option__=[0, 1],
            num_train_steps=300_000,
            steps_til_checkpoint=100_000,
        )
    test = "--test" in sys.argv
    failures = launcher.run(test=test)
    print(f"sweep finished, {failures} failures")
