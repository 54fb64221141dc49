"""PlanningTask: the collision/validity oracle + trajectory metrics.

Counterpart of the reference's torch_robotics PlanningTask (contract observed
at reference scripts/inference/inference.py:161,190-193,288,295-327 and
scripts/generate_data/generate_trajectories.py:104,123-125). All checks are
pure vmapped jnp over padded obstacle sets, so a whole candidate batch is
validated in one fused device call.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from mpd_tpu.world.envs import EnvBase
from mpd_tpu.world.primitives import ObjectSet, sdf_object_set
from mpd_tpu.world.robots import RobotBase


def interpolate_points(x: jnp.ndarray, num_points: int) -> jnp.ndarray:
    """Linear upsampling of [..., H, D] along H to num_points.

    Equivalent of torch_robotics' interpolate_points_v1 (consumed at
    reference mpd/models/diffusion_models/guides.py:11,184): fractional
    indices u = linspace(0, H-1, N), lerp between floor/ceil neighbors.
    """
    H = x.shape[-2]
    u = jnp.linspace(0.0, H - 1.0, num_points, dtype=x.dtype)
    lo = jnp.floor(u).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, H - 1)
    w = (u - lo.astype(x.dtype))[..., :, None]
    return x[..., lo, :] * (1.0 - w) + x[..., hi, :] * w


def interpolate_traj_via_points(trajs: jnp.ndarray, num_points_per_segment: int = 2) -> jnp.ndarray:
    """Densify a trajectory by a per-segment factor before playback
    (counterpart of torch_robotics' interpolate_traj_via_points, consumed at
    reference inference.py:25,386)."""
    H = trajs.shape[-2]
    return interpolate_points(trajs, (H - 1) * num_points_per_segment + 1)


class PlanningTask:
    def __init__(
        self,
        env: EnvBase,
        robot: RobotBase,
        obstacle_cutoff_margin: float = 0.03,
        num_interpolated_points_for_check: int = 128,
        **kwargs,
    ):
        self.env = env
        self.robot = robot
        self.obstacle_cutoff_margin = float(obstacle_cutoff_margin)
        self.num_interpolated_points_for_check = num_interpolated_points_for_check
        self._radii = jnp.asarray(robot.collision_sphere_radii)

    # ------------------------------------------------------------------
    # Configuration validity
    # ------------------------------------------------------------------
    def config_min_clearance(self, q: jnp.ndarray, objects: Optional[ObjectSet] = None) -> jnp.ndarray:
        """Min over robot spheres of (env SDF - sphere radius). q [..., q_dim]."""
        objs = self.env.objects if objects is None else objects
        centers = self.robot.collision_sphere_positions(q)  # [..., S, ws]
        d = sdf_object_set(centers, objs) - self._radii  # [..., S]
        return jnp.min(d, axis=-1)

    def config_in_collision(self, q: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
        """Boolean [..., ]: penetrating an obstacle or outside joint limits."""
        in_obstacle = self.config_min_clearance(q) <= margin
        out_of_limits = jnp.any(
            (q < self.robot.q_min) | (q > self.robot.q_max), axis=-1
        )
        return in_obstacle | out_of_limits

    def random_coll_free_q(self, key: jax.Array, n_samples: int = 1, max_tries: int = 100):
        """Rejection-sample collision-free configurations (host loop over
        device-batched checks; setup-path code, not the hot loop).
        Reference contract: task.random_coll_free_q (inference.py:161)."""
        batch = max(128, 4 * n_samples)
        found = []
        for _ in range(max_tries):
            key, sub = jax.random.split(key)
            q = jax.random.uniform(
                sub,
                (batch, self.robot.q_dim),
                minval=self.robot.q_min,
                maxval=self.robot.q_max,
            )
            free_mask = ~self.config_in_collision(q, margin=self.obstacle_cutoff_margin)
            q_free = np.asarray(q)[np.asarray(free_mask)]
            found.append(q_free)
            if sum(len(f) for f in found) >= n_samples:
                break
        all_free = np.concatenate(found, axis=0)
        if len(all_free) < n_samples:
            raise ValueError("could not find enough collision-free configurations")
        return jnp.asarray(all_free[:n_samples])

    # ------------------------------------------------------------------
    # Trajectory validity
    # ------------------------------------------------------------------
    def trajs_collision_mask(self, trajs: jnp.ndarray) -> jnp.ndarray:
        """Per-waypoint (interpolated) collision flags.

        trajs: [B, H, state_dim] (positions+velocities) or [B, H, q_dim].
        Returns bool [B, N] over N interpolated waypoints.
        """
        q = self.robot.get_position(trajs)
        q_fine = interpolate_points(q, self.num_interpolated_points_for_check)
        return self.config_in_collision(q_fine)

    def trajs_free_mask(self, trajs: jnp.ndarray) -> jnp.ndarray:
        """Bool [B]: trajectory entirely collision-free."""
        return ~jnp.any(self.trajs_collision_mask(trajs), axis=-1)

    def get_trajs_collision_and_free(self, trajs: jnp.ndarray, return_indices: bool = False):
        """Split a batch into colliding / free trajectories
        (ref contract: inference.py:288). Host-side split (ragged output)."""
        free_mask = np.asarray(self.trajs_free_mask(trajs))
        free_idxs = np.nonzero(free_mask)[0]
        coll_idxs = np.nonzero(~free_mask)[0]
        trajs_np = np.asarray(trajs)
        trajs_free = trajs_np[free_idxs] if len(free_idxs) else None
        trajs_coll = trajs_np[coll_idxs] if len(coll_idxs) else None
        if return_indices:
            return trajs_coll, coll_idxs, trajs_free, free_idxs, free_mask
        return trajs_coll, trajs_free

    # ------------------------------------------------------------------
    # Metrics (ref contracts: inference.py:295-327,
    # generate_trajectories.py:122-125)
    # ------------------------------------------------------------------
    def compute_fraction_free_trajs(self, trajs) -> jnp.ndarray:
        return jnp.mean(self.trajs_free_mask(trajs).astype(jnp.float32))

    def compute_success_free_trajs(self, trajs) -> jnp.ndarray:
        return (jnp.sum(self.trajs_free_mask(trajs)) > 0).astype(jnp.int32)

    def compute_collision_intensity_trajs(self, trajs) -> jnp.ndarray:
        """Fraction of interpolated waypoints in collision."""
        return jnp.mean(self.trajs_collision_mask(trajs).astype(jnp.float32))


# ---------------------------------------------------------------------------
# Trajectory metrics (counterparts of torch_robotics.trajectory.metrics,
# consumed at reference inference.py:24,312-327)
# ---------------------------------------------------------------------------

def compute_path_length(trajs: jnp.ndarray, robot: RobotBase) -> jnp.ndarray:
    """Sum of waypoint-to-waypoint position distances. [B]."""
    q = robot.get_position(trajs)
    return jnp.sum(jnp.linalg.norm(jnp.diff(q, axis=-2), axis=-1), axis=-1)


def compute_smoothness(trajs: jnp.ndarray, robot: RobotBase) -> jnp.ndarray:
    """Integrated acceleration magnitude via velocity finite differences. [B]."""
    v = robot.get_velocity(trajs)
    return jnp.sum(jnp.linalg.norm(jnp.diff(v, axis=-2), axis=-1), axis=-1)


def compute_variance_waypoints(trajs: jnp.ndarray, robot: RobotBase) -> jnp.ndarray:
    """Sum over waypoints of the trace of the across-batch position covariance."""
    q = robot.get_position(trajs)  # [B, H, q]
    mean = jnp.mean(q, axis=0, keepdims=True)
    var = jnp.mean(jnp.sum((q - mean) ** 2, axis=-1), axis=0)  # [H]
    return jnp.sum(var)
