"""Trajectory dataset: packed on-device arrays + normalizers + hard conds.

Counterpart of the reference's TrajectoryDataset
(reference: mpd/datasets/trajectories.py:21-237). Differences by design:

- Storage is `.npy` per context directory (`trajs-free.npy`) with the same
  args.yaml/metadata.yaml round-trip contract the reference uses
  (trajectories.py:37-38, SURVEY section 5.6); context dirs without a
  trajs-free file are skipped silently, like the reference (82-106).
- The whole dataset (10k x 64 x 2q floats ~ 10 MB) is uploaded to device
  once; training batches are gathered *inside* jit from device memory with
  `jax.random.randint` indices — no host dataloader in the hot loop.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import yaml

from mpd_tpu.data.normalization import Normalizer, fit_normalizer
from mpd_tpu.world.envs import get_env
from mpd_tpu.world.robots import get_robot
from mpd_tpu.world.task import PlanningTask


def load_yaml(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f)


class TrajectoryDataset:
    def __init__(
        self,
        base_dir: str,
        include_velocity: bool = True,
        normalizer: str = "LimitsNormalizer",
        use_extra_objects: bool = False,
        obstacle_cutoff_margin: Optional[float] = None,
        trajectories: Optional[np.ndarray] = None,
        env_id: Optional[str] = None,
        robot_id: Optional[str] = None,
        robot_kwargs: Optional[dict] = None,
        **kwargs,
    ):
        """Load from `base_dir` (context subdirs with trajs-free.npy), or take
        `trajectories` [B, H, 2q] directly (with env_id/robot_id) for tests."""
        self.base_dir = base_dir
        self.include_velocity = include_velocity

        if trajectories is None:
            ctx0 = os.path.join(base_dir, "0")
            self.args = load_yaml(os.path.join(ctx0, "args.yaml"))
            self.metadata = load_yaml(os.path.join(ctx0, "metadata.yaml"))
            env_id = self.metadata["env_id"]
            robot_id = self.metadata["robot_id"]
            trajectories, task_to_traj = self._load_trajectories(base_dir)
            self.map_task_id_to_trajectories_id = task_to_traj
        else:
            self.args = dict(kwargs)
            self.metadata = {"env_id": env_id, "robot_id": robot_id}
            self.map_task_id_to_trajectories_id = {0: np.arange(len(trajectories))}

        if obstacle_cutoff_margin is not None:
            self.args["obstacle_cutoff_margin"] = obstacle_cutoff_margin

        self.env = get_env(env_id, use_extra_objects=use_extra_objects)
        # robot_kwargs e.g. {"n_spheres_per_segment": 3} to tighten the
        # Panda validity oracle/guide independently of the stored dataset
        self.robot = get_robot(robot_id, **(robot_kwargs or {}))
        self.task = PlanningTask(
            env=self.env,
            robot=self.robot,
            obstacle_cutoff_margin=self.args.get("obstacle_cutoff_margin", 0.03),
        )
        self.threshold_start_goal_pos = self.args.get("threshold_start_goal_pos", 1.0)

        trajs_full = jnp.asarray(trajectories, dtype=jnp.float32)  # [B, H, 2q]
        trajs_pos = self.robot.get_position(trajs_full)
        self.trajs = trajs_full if include_velocity else trajs_pos

        # task field: start/goal positions (ref trajectories.py:108-110)
        self.tasks = jnp.concatenate([trajs_pos[:, 0, :], trajs_pos[:, -1, :]], axis=-1)

        b, h, d = self.trajs.shape
        self.n_trajs = b
        self.n_support_points = h
        self.state_dim = d
        self.trajectory_dim = (h, d)

        self.normalizer_name = normalizer
        self.traj_normalizer: Normalizer = fit_normalizer(normalizer, self.trajs)
        self.task_normalizer: Normalizer = fit_normalizer(normalizer, self.tasks)
        self.trajs_normalized = self.traj_normalizer.normalize(self.trajs)
        self.tasks_normalized = self.task_normalizer.normalize(self.tasks)

    @staticmethod
    def _load_trajectories(base_dir: str):
        trajs_l = []
        task_to_traj = {}
        task_id = 0
        n = 0
        for current_dir, _subdirs, files in sorted(os.walk(base_dir)):
            if "trajs-free.npy" in files:
                arr = np.load(os.path.join(current_dir, "trajs-free.npy"))
                if arr.size == 0:
                    continue
                task_to_traj[task_id] = n + np.arange(len(arr))
                task_id += 1
                n += len(arr)
                trajs_l.append(arr)
        if not trajs_l:
            raise FileNotFoundError(f"no trajs-free.npy found under {base_dir}")
        return np.concatenate(trajs_l, axis=0), task_to_traj

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return self.n_trajs

    def get_hard_conditions(
        self, traj: jnp.ndarray, horizon: Optional[int] = None, normalize: bool = False
    ) -> Dict[int, jnp.ndarray]:
        """{0: start_state, H-1: goal_state}; velocities zeroed when part of
        the state; optionally normalized with the *trajectory* normalizer
        (ref trajectories.py:214-237)."""
        start_pos = self.robot.get_position(traj[..., 0, :])
        goal_pos = self.robot.get_position(traj[..., -1, :])
        if self.include_velocity:
            start = jnp.concatenate([start_pos, jnp.zeros_like(start_pos)], axis=-1)
            goal = jnp.concatenate([goal_pos, jnp.zeros_like(goal_pos)], axis=-1)
        else:
            start, goal = start_pos, goal_pos
        if normalize:
            start = self.traj_normalizer.normalize(start)
            goal = self.traj_normalizer.normalize(goal)
        horizon = horizon or self.n_support_points
        return {0: start, horizon - 1: goal}

    def hard_conds_from_batch(self, traj_batch_normalized: jnp.ndarray) -> Dict[int, jnp.ndarray]:
        """Hard conditions straight from normalized trajectories [B, H, D]."""
        return {
            0: traj_batch_normalized[:, 0, :],
            self.n_support_points - 1: traj_batch_normalized[:, -1, :],
        }

    # normalization passthroughs (ref trajectories.py:190-206)
    def override_traj_normalizer_stats(self, mins, maxs):
        """Replace the fitted trajectory-normalizer stats with saved
        training-time stats (checkpoint round-trip; see scripts/train.py)."""
        from mpd_tpu.data.normalization import LimitsNormalizer

        self.traj_normalizer = LimitsNormalizer(
            mins=jnp.asarray(mins, jnp.float32), maxs=jnp.asarray(maxs, jnp.float32)
        )
        self.trajs_normalized = self.traj_normalizer.normalize(self.trajs)

    def normalize_trajectories(self, x):
        return self.traj_normalizer.normalize(x)

    def unnormalize_trajectories(self, x):
        return self.traj_normalizer.unnormalize(x)

    def normalize_tasks(self, x):
        return self.task_normalizer.normalize(x)

    def unnormalize_tasks(self, x):
        return self.task_normalizer.unnormalize(x)
