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
        fig_dir: Optional[str] = None,
        # wandb image logging rides the ExperimentLogger when enabled
        logger=None,
    ):
        """`fig_dir` turns on trajectory-figure summaries: every firing
        renders the dataset trajectory vs the sampled rollouts through
        `PlanningVisualizer` and writes a PNG under `fig_dir` (the
        counterpart of the reference's dataset-vs-diffusion wandb figures,
        ref mpd/summaries/summary_trajectory_generation.py:53-84)."""
        self.dataset = dataset
        self.n_samples = n_samples
        self.fig_dir = fig_dir
        self.logger = logger
        self._viz = None
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
                trajs,
            )

        self._core = jax.jit(_core)

    def _render_figure(self, trajs, traj_idx: int, step: int) -> str:
        """Dataset-vs-sampled trajectory figure -> PNG path."""
        import os

        import matplotlib.pyplot as plt

        from mpd_tpu.viz.planning_visualizer import PlanningVisualizer

        if self._viz is None:
            self._viz = PlanningVisualizer(self.dataset.task)
        robot = self.dataset.robot
        q = robot.get_position(np.asarray(trajs))  # sampled [n, H, q]
        traj_data = self.dataset.unnormalize_trajectories(
            self.dataset.trajs_normalized[traj_idx]
        )
        q_data = np.asarray(robot.get_position(traj_data))  # [H, q]
        # dataset trajectory drawn as the highlighted path over the samples
        fig, _ = self._viz.render_robot_trajectories(
            trajs=q,
            traj_best=q_data,
            start_state=q_data[0],
            goal_state=q_data[-1],
        )
        os.makedirs(self.fig_dir, exist_ok=True)
        path = os.path.join(self.fig_dir, f"summary_step_{step:08d}.png")
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path

    def __call__(
        self,
        params,
        key: jax.Array,
        traj_idx: Optional[int] = None,
        step: int = 0,
    ) -> Dict[str, float]:
        key_idx, key_sample = jax.random.split(key)
        if traj_idx is None:
            traj_idx = int(jax.random.randint(key_idx, (), 0, self.dataset.n_trajs))
        traj = self.dataset.trajs_normalized[traj_idx]
        H, D = traj.shape
        conds = {
            0: jnp.broadcast_to(traj[0], (self.n_samples, D)),
            H - 1: jnp.broadcast_to(traj[-1], (self.n_samples, D)),
        }
        frac_free, coll_int, success, trajs = self._core(params, key_sample, conds)
        metrics = {
            "traj_idx": traj_idx,
            "fraction_free": float(frac_free),
            "collision_intensity": float(coll_int),
            "success": int(success),
        }
        if self.fig_dir is not None:
            path = self._render_figure(trajs, traj_idx, step)
            metrics["summary_figure"] = path
            if self.logger is not None:
                self.logger.log_image("rollout_trajectories", path, step=step)
        return metrics


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
