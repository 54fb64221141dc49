"""Multi-process datagen integration: shard_contexts + Launcher fan-out on
one machine -> one merged dataset -> loader reads it (VERDICT r1 item 10;
ref scripts/generate_data/launch_generate_trajectories.py:13-38, where SLURM
jobs write per-context dirs and the filesystem is the merge point)."""

import os

import numpy as np

from mpd_tpu.core.experiment import Launcher
from mpd_tpu.parallel import shard_contexts

import pytest

# cross-process integration lanes: >10 s each (VERDICT r3 #8); excluded
# from the fast dev loop via `pytest -m 'not slow'`
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_datagen_merges_into_one_dataset(tmp_path):
    out = str(tmp_path / "ds")
    n_contexts = 4

    # context ranges exactly as a 2-host run would compute them
    ranges = [shard_contexts(n_contexts, process_id=p, num_processes=2) for p in range(2)]
    assert sorted(i for r in ranges for i in r) == list(range(n_contexts))

    launcher = Launcher(
        exp_name="datagen-2proc",
        exp_file=os.path.join(REPO, "scripts", "generate_data.py"),
        n_exps_in_parallel=2,
        inject_defaults=False,  # generate_data.py has its own arg surface
    )
    for r in ranges:
        launcher.add_experiment(
            env="EnvSimple2D",
            robot="RobotPointMass",
            out=out,
            context_start=r.start,
            context_end=r.stop,
            num_trajectories=4,
            rrt_max_time=30.0,
            gpmp_opt_iters=150,
            cpu=True,  # children must force the CPU backend (single-tenant TPU)
        )

    # print-only dry run: commands contain the bare --cpu flag
    assert launcher.run(local=True, test=True) == 0

    failures = launcher.run(local=True)
    assert failures == 0

    # every context dir written by one of the two processes
    ctx_dirs = sorted(d for d in os.listdir(out) if d.isdigit())
    assert ctx_dirs == ["0", "1", "2", "3"]
    for d in ctx_dirs:
        assert os.path.exists(os.path.join(out, d, "trajs-free.npy"))

    # the merged dataset loads as one
    from mpd_tpu.data import TrajectoryDataset

    ds = TrajectoryDataset(base_dir=out, include_velocity=True)
    assert ds.n_trajs > 0
    assert ds.trajs_normalized.shape[1:] == (64, 4)
    assert np.isfinite(np.asarray(ds.trajs_normalized)).all()
    assert len(ds.map_task_id_to_trajectories_id) >= 1
