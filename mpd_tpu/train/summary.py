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


class RolloutSummary:
    """Compiled-once periodic training rollout (ref
    summary_trajectory_generation.py:16-96: 25 EMA samples for one dataset
    start/goal, collision statistics).

    The jitted core takes `params` as a traced argument so one compile
    serves every firing (closing over the weights would bake them into the
    HLO and force a fresh — minutes-long, on the tunneled TPU — compile per
    summary). Used by scripts/train.py as the `summary_fn` for
    Trainer.fit(steps_til_summary=...)."""

    def __init__(
        self,
        dataset: TrajectoryDataset,
        schedule: DiffusionSchedule,
        apply_fn,  # net.apply(params, x, t) -> eps_hat
        n_samples: int = 25,
    ):
        self.dataset = dataset
        self.n_samples = n_samples
        H, D = dataset.trajs_normalized.shape[1:]
        task = dataset.task

        def _core(params, key, conds):
            x = run_sampling(
                schedule,
                lambda x_, t_: apply_fn(params, x_, t_),
                key, (n_samples, H, D), conds,
                SamplerConfig(n_extra_steps=5, t_start_guide=-(10**9)),
            )
            trajs = dataset.unnormalize_trajectories(x)
            return (
                task.compute_fraction_free_trajs(trajs),
                task.compute_collision_intensity_trajs(trajs),
                task.compute_success_free_trajs(trajs),
            )

        self._core = jax.jit(_core)

    def __call__(self, params, key: jax.Array, traj_idx: Optional[int] = None) -> Dict[str, float]:
        key_idx, key_sample = jax.random.split(key)
        if traj_idx is None:
            traj_idx = int(jax.random.randint(key_idx, (), 0, self.dataset.n_trajs))
        traj = self.dataset.trajs_normalized[traj_idx]
        H, D = traj.shape
        conds = {
            0: jnp.broadcast_to(traj[0], (self.n_samples, D)),
            H - 1: jnp.broadcast_to(traj[-1], (self.n_samples, D)),
        }
        frac_free, coll_int, success = self._core(params, key_sample, conds)
        return {
            "traj_idx": traj_idx,
            "fraction_free": float(frac_free),
            "collision_intensity": float(coll_int),
            "success": int(success),
        }


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
