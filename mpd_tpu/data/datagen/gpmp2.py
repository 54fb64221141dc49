"""GPMP2: batched Gaussian-Process motion-plan smoothing on TPU.

Counterpart of mp_baselines' GPMP2 (consumed at reference
scripts/generate_data/generate_trajectories.py:92-119). TPU-first redesign:
all candidate seed trajectories for a context are optimized *simultaneously*
as one [B, H, 2q] tensor inside a single jitted `lax.fori_loop`:

  theta_{k+1} = theta_k - step * M^{-1} grad cost(theta_k)

where cost = GP constant-velocity prior + hinge-SDF obstacle cost, and
M = (Gauss-Newton matrix of the *linear* GP factors) + lambda*I is constant,
so its Cholesky factor is computed once on the host and every iteration is
just a gradient evaluation plus batched triangular solves (MXU-friendly
dense [2H x 2H] ops, identical per dof). Start/goal states are pinned hard
(the reference uses tight start/goal priors; pinning is the sigma->0 limit).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mpd_tpu.costs.cost_functions import CostCollision, CostGPTrajectory
from mpd_tpu.world.robots import RobotBase
from mpd_tpu.world.task import PlanningTask, interpolate_points


def build_gp_precision(
    H: int,
    dt: float,
    sigma_gp: float,
    lam: float = 1.0,
    sigma_endpoints: float = 1e-3,
) -> np.ndarray:
    """Per-dof Gauss-Newton matrix of the GP factors, ordering
    [q_0..q_{H-1}, v_0..v_{H-1}], shape [2H, 2H].

    Start/goal carry tight priors (1/sigma_endpoints^2 on their q and v
    diagonals): the solver then produces near-zero endpoint updates, keeping
    the Newton direction consistent with the hard pinning applied after each
    iteration (without them, interior steps assume the endpoints move and the
    GP objective diverges)."""
    n = 2 * H
    M = np.zeros((n, n), dtype=np.float64)
    Qi = np.array(
        [[12.0 / dt**3, -6.0 / dt**2], [-6.0 / dt**2, 4.0 / dt]], dtype=np.float64
    ) / (sigma_gp**2)
    for t in range(H - 1):
        J = np.zeros((2, n))
        J[0, t] = -1.0
        J[0, t + 1] = 1.0
        J[0, H + t] = -dt
        J[1, H + t] = -1.0
        J[1, H + t + 1] = 1.0
        M += J.T @ Qi @ J
    w_end = 1.0 / sigma_endpoints**2
    for idx in (0, H - 1):
        M[idx, idx] += w_end  # position prior
        M[H + idx, H + idx] += w_end  # velocity prior
    M += lam * np.eye(n)
    return M


class GPMP2:
    def __init__(
        self,
        robot: RobotBase,
        task: PlanningTask,
        n_support_points: int = 64,
        dt: float = 5.0 / 64,
        opt_iters: int = 300,
        num_interpolated_points: int = 128,
        sigma_gp: float = 0.2,
        sigma_obst: float = 0.005,
        step_size: float = 0.2,
        obstacle_cutoff_margin: float = 0.05,
        lam: float = 1.0,
        max_waypoint_update: float = 0.05,
        **kwargs,
    ):
        self.robot = robot
        self.task = task
        self.H = n_support_points
        self.dt = float(dt)
        self.opt_iters = opt_iters
        self.step_size = float(step_size)
        self.max_waypoint_update = float(max_waypoint_update)

        self.cost_obst = CostCollision(
            robot,
            n_support_points,
            field=task.env.objects,
            sigma_coll=sigma_obst,
            cutoff_margin=obstacle_cutoff_margin,
            squared=True,
        )
        self.cost_gp = CostGPTrajectory(robot, n_support_points, dt, sigma_gp=sigma_gp)
        self.num_interp = num_interpolated_points

        M = build_gp_precision(self.H, self.dt, sigma_gp, lam=lam)
        self._chol = jnp.asarray(np.linalg.cholesky(M), dtype=jnp.float32)

        self._optimize = jax.jit(self._make_optimize())

    def _total_cost(self, theta: jnp.ndarray) -> jnp.ndarray:
        x_interp = interpolate_points(theta, self.num_interp)
        return jnp.sum(self.cost_obst(theta, x_interp)) + jnp.sum(self.cost_gp(theta))

    def _make_optimize(self):
        H, q_dim = self.H, self.robot.q_dim
        chol = self._chol
        step = self.step_size
        grad_fn = jax.grad(self._total_cost)

        def precond_solve(g):
            # g: [B, H, 2q] -> per-dof vectors [B, q, 2H], solve, back
            gq = g[..., :q_dim]  # [B, H, q]
            gv = g[..., q_dim:]
            vec = jnp.concatenate(
                [jnp.moveaxis(gq, -1, -2), jnp.moveaxis(gv, -1, -2)], axis=-1
            )  # [B, q, 2H]
            b_, q_ = vec.shape[0], vec.shape[1]
            # one big [2H, B*q] triangular solve (MXU-friendly) instead of
            # B*q small ones
            rhs = vec.reshape(b_ * q_, 2 * H).T
            sol = jax.scipy.linalg.cho_solve((chol, True), rhs)
            sol = sol.T.reshape(b_, q_, 2 * H)
            dq = jnp.moveaxis(sol[..., :H], -1, -2)
            dv = jnp.moveaxis(sol[..., H:], -1, -2)
            return jnp.concatenate([dq, dv], axis=-1)

        def optimize(theta0):
            pins = (theta0[:, 0, :], theta0[:, -1, :])

            max_up = self.max_waypoint_update

            def body(_, carry):
                theta, pin_start, pin_goal = carry
                g = grad_fn(theta)
                delta = step * precond_solve(g)
                # trust region: the obstacle gradient lands in the GP prior's
                # null space (constant-velocity subspace) where M ~ lam*I, so
                # bound the per-waypoint update norm to keep iterations stable
                dn = jnp.linalg.norm(delta, axis=-1, keepdims=True)
                delta = delta * jnp.minimum(1.0, max_up / (dn + 1e-9))
                theta = theta - delta
                # hard-pin start/goal states (positions + zero velocities)
                theta = theta.at[:, 0, :].set(pin_start)
                theta = theta.at[:, -1, :].set(pin_goal)
                return theta, pin_start, pin_goal

            theta, _, _ = jax.lax.fori_loop(0, self.opt_iters, body, (theta0, *pins))
            return theta

        return optimize

    def optimize(self, theta0: jnp.ndarray) -> jnp.ndarray:
        """theta0: seed trajectories [B, H, 2q] -> optimized [B, H, 2q]."""
        return self._optimize(jnp.asarray(theta0, dtype=jnp.float32))


def gpmp2_optimize(robot, task, theta0, **kwargs) -> jnp.ndarray:
    return GPMP2(robot, task, **kwargs).optimize(theta0)
