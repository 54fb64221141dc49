"""Differentiable motion-planning costs: SDF collision + GP smoothness.

Counterparts of the mp_baselines cost stack consumed by the reference
(CostCollision / CostGPTrajectory / CostComposite, call contract at
reference scripts/inference/inference.py:186-225 and
mpd/models/diffusion_models/guides.py:190; the dep is an empty submodule so
the factor math is a clean-room GPMP2-style reconstruction).

Every cost is a pure function batch of trajectories -> per-trajectory scalar
[B]; guidance gradients come from `jax.grad` of their sum, so the whole cost
stack fuses into the jitted sampling step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from mpd_tpu.world.primitives import ObjectSet, sdf_object_set
from mpd_tpu.world.robots import RobotBase


class CostCollision:
    """Hinge SDF collision cost over (interpolated) trajectory waypoints.

    Per waypoint n, robot sphere s: e = max(margin + r_s - sdf(p_{n,s}), 0)
    (the classic GPMP2 epsilon-clearance obstacle factor). With
    squared=False (guidance): cost[b] = sum_{n,s} e / (2 sigma^2) — constant-
    magnitude gradient inside the margin, robust under the guide's per-
    waypoint norm clipping. With squared=True (GPMP2 optimization):
    cost[b] = 0.5 sum e^2 / sigma^2 — gradients vanish smoothly at the
    margin boundary, as in the original factor-graph formulation.
    """

    def __init__(
        self,
        robot: RobotBase,
        n_support_points: int,
        field: ObjectSet,
        sigma_coll: float = 1.0,
        cutoff_margin: float = 0.03,
        squared: bool = False,
    ):
        self.robot = robot
        self.n_support_points = n_support_points
        self.field = field
        self.sigma_coll = float(sigma_coll)
        self.cutoff_margin = float(cutoff_margin)
        self.squared = squared
        self._radii = jnp.asarray(robot.collision_sphere_radii)

    def __call__(self, trajs: jnp.ndarray, trajs_interpolated: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = trajs if trajs_interpolated is None else trajs_interpolated
        q = self.robot.get_position(x)  # [B, N, q]
        centers = self.robot.collision_sphere_positions(q)  # [B, N, S, ws]
        sdf = sdf_object_set(centers, self.field)  # [B, N, S]
        err = jnp.maximum(self.cutoff_margin + self._radii - sdf, 0.0)
        if self.squared:
            return 0.5 * jnp.sum(err**2, axis=(-2, -1)) / self.sigma_coll**2
        return jnp.sum(err, axis=(-2, -1)) / (2.0 * self.sigma_coll**2)

    def make_fused_interp_gradient(
        self, num_interp: int, interpret: bool = False, block_b=None,
        min_batch=None, mesh=None, mesh_axis: str = "data",
    ):
        """Pallas megakernel for d(sum cost(interp(x, num_interp)))/dx, or
        None when (robot, field) is outside kernel coverage — the guide then
        keeps its jax.grad path. See kernels/{panda,pointmass}_guide.py.

        Below the builder's `min_batch` (a trace-time check on the static
        batch shape) the returned fn computes the same gradient via jax.grad
        instead: measured on the chip, the 2D kernel wins from B=128 up
        (pipelined/query −6% at 128, −13% at 512, −8% at 4096) but loses
        ~4% at B=50 to per-program overhead + layout transposes. Pass
        min_batch=1 to force the kernel (parity tests).

        With `mesh`, the pallas_call is wrapped in `jax.shard_map` over the
        candidate axis (parallel.shard_map_batch0) — the kernel is
        per-sample parallel, so each device runs it on its local shard with
        no collectives, and the min_batch crossover gate applies to the
        PER-DEVICE batch (which is what the kernel instance actually sees)."""
        if self.squared:
            return None
        from mpd_tpu.kernels.panda_guide import make_panda_collision_grad
        from mpd_tpu.kernels.pointmass_guide import make_pointmass_collision_grad

        kfn = None
        for builder in (make_panda_collision_grad, make_pointmass_collision_grad):
            kw = {} if block_b is None else {"block_b": block_b}
            kfn = builder(
                self.robot,
                self.field,
                margin=self.cutoff_margin,
                sigma=self.sigma_coll,
                num_interp=num_interp,
                interpret=interpret,
                **kw,
            )
            if kfn is not None:
                break
        if kfn is None:
            return None
        q_dim = self.robot.q_dim
        min_b = min_batch if min_batch is not None else getattr(kfn, "min_batch", 1)
        n_shards = 1
        if mesh is not None:
            from mpd_tpu.parallel.mesh import shard_map_batch0

            n_shards = mesh.shape[mesh_axis]
            kfn = shard_map_batch0(kfn, mesh, mesh_axis)

        def autodiff_grad(x_phys):
            from mpd_tpu.world.task import interpolate_points

            return jax.grad(
                lambda xx: jnp.sum(self(xx, interpolate_points(xx, num_interp)))
            )(x_phys)

        def grad_fn(x_phys: jnp.ndarray) -> jnp.ndarray:
            batch = int(np.prod(x_phys.shape[:-2])) if x_phys.ndim > 2 else 1
            if -(-batch // n_shards) < min_b:
                return autodiff_grad(x_phys)
            # collision reads only the position slice of the interpolated
            # state, so the velocity slice of the gradient is exactly zero
            gq = kfn(self.robot.get_position(x_phys))
            return jnp.concatenate(
                [gq, jnp.zeros_like(x_phys[..., q_dim:])], axis=-1
            )

        return grad_fn


class CostGPTrajectory:
    """Constant-velocity GP (white-noise-on-acceleration) smoothness prior.

    For consecutive states (q_t, v_t) -> (q_{t+1}, v_{t+1}) with step dt, the
    residual r_t = [q_{t+1} - q_t - v_t dt ; v_{t+1} - v_t] is weighted by the
    inverse GP covariance Q^{-1} = [[12/dt^3, -6/dt^2], [-6/dt^2, 4/dt]]
    (x sigma_gp^-2, per dof); cost[b] = 0.5 * sum_t r_t^T Q^{-1} r_t.
    """

    def __init__(
        self,
        robot: RobotBase,
        n_support_points: int,
        dt: float,
        sigma_gp: float = 1.0,
    ):
        self.robot = robot
        self.n_support_points = n_support_points
        self.dt = float(dt)
        self.sigma_gp = float(sigma_gp)
        dt_ = self.dt
        inv = np.array(
            [[12.0 / dt_**3, -6.0 / dt_**2], [-6.0 / dt_**2, 4.0 / dt_]],
            dtype=np.float64,
        ) / (self.sigma_gp**2)
        self._q_inv = jnp.asarray(inv, dtype=jnp.float32)  # [2, 2] per-dof blocks

    def __call__(self, trajs: jnp.ndarray, trajs_interpolated: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        del trajs_interpolated  # GP prior acts on support points only
        q = self.robot.get_position(trajs)  # [B, H, dof]
        v = self.robot.get_velocity(trajs)
        r_pos = q[..., 1:, :] - q[..., :-1, :] - v[..., :-1, :] * self.dt  # [B, H-1, dof]
        r_vel = v[..., 1:, :] - v[..., :-1, :]
        Q = self._q_inv
        quad = (
            Q[0, 0] * r_pos**2 + 2.0 * Q[0, 1] * r_pos * r_vel + Q[1, 1] * r_vel**2
        )
        return 0.5 * jnp.sum(quad, axis=(-2, -1))

    def gradient(self, trajs: jnp.ndarray) -> jnp.ndarray:
        """Closed-form d(sum cost)/d trajs — the cost is quadratic, so the
        guide skips a whole autodiff backward pass per guide step by calling
        this. Parity with jax.grad is tested.

        With s_t = Q00 r_pos_t + Q01 r_vel_t and w_t = Q01 r_pos_t + Q11
        r_vel_t: d/dq_t = s_{t-1} - s_t; d/dv_t = -dt s_t - w_t + w_{t-1}.
        """
        q = self.robot.get_position(trajs)
        v = self.robot.get_velocity(trajs)
        r_pos = q[..., 1:, :] - q[..., :-1, :] - v[..., :-1, :] * self.dt
        r_vel = v[..., 1:, :] - v[..., :-1, :]
        Q = self._q_inv
        s = Q[0, 0] * r_pos + Q[0, 1] * r_vel  # [B, H-1, dof]
        w = Q[0, 1] * r_pos + Q[1, 1] * r_vel
        pad = jnp.zeros_like(s[..., :1, :])
        s_prev = jnp.concatenate([pad, s], axis=-2)  # s_{t-1}, t=0..H-1
        s_next = jnp.concatenate([s, pad], axis=-2)  # s_t with s_{H-1}=0
        w_prev = jnp.concatenate([pad, w], axis=-2)
        w_next = jnp.concatenate([w, pad], axis=-2)
        grad_q = s_prev - s_next
        grad_v = -self.dt * s_next - w_next + w_prev
        return jnp.concatenate([grad_q, grad_v], axis=-1)


class CostComposite:
    """Weighted list of cost terms, returning per-term costs + weights
    (ref contract: cost(x, x_interpolated=..., return_invidual_costs_and_weights=True)
    at inference.py:216-225 / guides.py:190)."""

    def __init__(
        self,
        robot: RobotBase,
        n_support_points: int,
        cost_list: Sequence,
        weights_cost_l: Optional[Sequence[float]] = None,
    ):
        self.robot = robot
        self.n_support_points = n_support_points
        self.cost_list = list(cost_list)
        self.weights = (
            list(weights_cost_l)
            if weights_cost_l is not None
            else [1.0] * len(self.cost_list)
        )
        assert len(self.weights) == len(self.cost_list)

    def __call__(
        self,
        trajs: jnp.ndarray,
        trajs_interpolated: Optional[jnp.ndarray] = None,
        return_individual_costs_and_weights: bool = False,
    ):
        costs = [c(trajs, trajs_interpolated) for c in self.cost_list]
        if return_individual_costs_and_weights:
            return costs, self.weights
        total = costs[0] * self.weights[0]
        for c, w in zip(costs[1:], self.weights[1:]):
            total = total + c * w
        return total


def gp_const_vel_trajectory(
    start_pos: jnp.ndarray,
    goal_pos: jnp.ndarray,
    n_support_points: int,
    dt: float,
    set_initial_final_vel_to_zero: bool = True,
) -> jnp.ndarray:
    """Straight-line position + constant-velocity seed trajectory.

    Counterpart of MultiMPPrior.const_vel_trajectory (ref guides.py:10,46-55).
    Returns [..., H, 2*dof].
    """
    H = n_support_points
    u = jnp.linspace(0.0, 1.0, H)[:, None]
    pos = start_pos[..., None, :] * (1.0 - u) + goal_pos[..., None, :] * u
    vel_const = (goal_pos - start_pos)[..., None, :] / ((H - 1) * dt)
    vel = jnp.broadcast_to(vel_const, pos.shape)
    if set_initial_final_vel_to_zero:
        vel = vel.at[..., 0, :].set(0.0)
        vel = vel.at[..., -1, :].set(0.0)
    return jnp.concatenate([pos, vel], axis=-1)
