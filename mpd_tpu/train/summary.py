"""Training-time evaluation rollouts.

Counterpart of the reference's SummaryTrajectoryGeneration
(reference: mpd/summaries/summary_trajectory_generation.py:16-96): pick a
dataset trajectory, sample n candidates from the (EMA) prior for its
start/goal, unnormalize, and report collision statistics — the empirical
quality signal the reference logs to wandb during training.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mpd_tpu.data.dataset import TrajectoryDataset
from mpd_tpu.diffusion import SamplerConfig, run_sampling
from mpd_tpu.diffusion.schedules import DiffusionSchedule


def rollout_summary(
    dataset: TrajectoryDataset,
    schedule: DiffusionSchedule,
    eps_fn,
    key: jax.Array,
    n_samples: int = 25,
    traj_idx: Optional[int] = None,
) -> Dict[str, float]:
    key_idx, key_sample = jax.random.split(key)
    if traj_idx is None:
        traj_idx = int(jax.random.randint(key_idx, (), 0, dataset.n_trajs))

    traj_norm = dataset.trajs_normalized[traj_idx]
    H, D = traj_norm.shape
    conds = {
        0: jnp.broadcast_to(traj_norm[0], (n_samples, D)),
        H - 1: jnp.broadcast_to(traj_norm[-1], (n_samples, D)),
    }
    x = run_sampling(
        schedule, eps_fn, key_sample, (n_samples, H, D), conds,
        SamplerConfig(n_extra_steps=5, t_start_guide=-(10**9)),
    )
    trajs = dataset.unnormalize_trajectories(x)
    task = dataset.task
    return {
        "traj_idx": traj_idx,
        "fraction_free": float(task.compute_fraction_free_trajs(trajs)),
        "collision_intensity": float(task.compute_collision_intensity_trajs(trajs)),
        "success": int(task.compute_success_free_trajs(trajs)),
    }
