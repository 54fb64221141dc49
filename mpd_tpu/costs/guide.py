"""Cost-gradient guidance for the reverse diffusion chain.

Counterpart of the reference's GuideManagerTrajectoriesWithVelocity
(reference: mpd/models/diffusion_models/guides.py:149-236), rebuilt as a pure
function factory: instead of autograd bookkeeping around a no_grad sampling
loop, the guide is a closure using `jax.grad`, and it composes into the
jitted sampler directly.

Semantics preserved exactly (these details dominate plan quality):
- gradients are taken w.r.t. the *unnormalized* trajectory, but the returned
  update is applied to the *normalized* trajectory by the sampler (the
  reference does the same: guides.py:173-211 vs sample_functions.py:74-83);
- per-term clip-by-norm over the last (state) dim computes the norm of
  (grad + 1e-6) — the epsilon is added to the gradient, not the norm
  (guides.py:224-230);
- gradient rows at the first and last waypoint are zeroed (guides.py:202-203);
- the result is the *negated* weighted sum (gradient ascent on -cost,
  guides.py:210);
- collision terms see the trajectory linearly interpolated to
  `num_interpolated_points_for_collision` points, gradients flow back to the
  support points through the interpolation. The reference's effective value
  is 128 due to a kwarg-name mismatch at the call site (inference.py:234
  passes `num_interpolated_points`, the class takes
  `num_interpolated_points_for_collision`, guides.py:152-156) — we default to
  the effective 128.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from mpd_tpu.costs.cost_functions import CostComposite
from mpd_tpu.world.task import interpolate_points


class GuideTrajectoriesWithVelocity:
    """Builds guide_fn(x_normalized) -> update for the sampler."""

    def __init__(
        self,
        unnormalize_fn: Callable[[jnp.ndarray], jnp.ndarray],
        cost: CostComposite,
        clip_grad: bool = False,
        clip_grad_rule: str = "norm",
        max_grad_norm: float = 1.0,
        max_grad_value: float = 0.1,
        interpolate_trajectories_for_collision: bool = False,
        num_interpolated_points_for_collision: int = 128,
        fused_collision: str = "auto",
        mesh=None,
        normalizer=None,
    ):
        self.unnormalize_fn = unnormalize_fn
        self.cost = cost
        self.clip_grad = clip_grad
        self.clip_grad_rule = clip_grad_rule
        self.max_grad_norm = float(max_grad_norm)
        self.max_grad_value = float(max_grad_value)
        self.interpolate = interpolate_trajectories_for_collision
        self.num_interp = num_interpolated_points_for_collision
        self._mesh = mesh
        # Pallas megakernel for collision-term gradients (TPU perf path —
        # see kernels/panda_guide.py). "auto": on when running on a real TPU
        # backend; "on"/"interpret": force (interpret = CPU parity tests);
        # "off": always jax.grad. Terms outside kernel coverage silently
        # keep the autodiff path either way. With `mesh`, the kernel runs
        # shard_mapped over the candidate axis (per-device instances, no
        # collectives — see parallel.shard_map_batch0), so the fused path
        # and mesh-sharded planning compose.
        self._fused_grads = {}
        if self.interpolate and fused_collision != "off":
            want = fused_collision in ("on", "interpret") or (
                fused_collision == "auto" and jax.default_backend() == "tpu"
            )
            if want:
                for idx, term in enumerate(self.cost.cost_list):
                    make = getattr(term, "make_fused_interp_gradient", None)
                    if make is None:
                        continue
                    interp_mode = fused_collision == "interpret"
                    fn = make(
                        self.num_interp,
                        interpret=interp_mode,
                        # "on"/"interpret" force the kernel past its
                        # min_batch gate (A/B forcing and CPU parity tests
                        # on tiny batches); "auto" keeps the measured
                        # crossover (the 2D kernel loses below B=128)
                        min_batch=1 if fused_collision in ("on", "interpret") else None,
                        mesh=mesh,
                    )
                    if fn is not None:
                        self._fused_grads[idx] = fn

        # FULL guide-step megakernel (r4): when the composite is exactly
        # the production Panda guide shape — [CostCollision (sphere-only
        # 3D field), CostGPTrajectory], norm-clip, LimitsNormalizer — the
        # entire __call__ (unnormalize -> collision grad -> GP grad ->
        # per-term clip -> endpoint zeroing -> -sum(w*g)) runs as ONE
        # Pallas program; the composed path below stays the fallback and
        # the parity reference (kernels/panda_guide.py
        # make_panda_guide_update docstring has the full semantics list).
        self._full_guide = None
        if (
            self.interpolate
            and fused_collision != "off"
            and normalizer is not None
            and self.clip_grad
            and self.clip_grad_rule == "norm"
        ):
            want_full = fused_collision in ("on", "interpret") or (
                fused_collision == "auto" and jax.default_backend() == "tpu"
            )
            if want_full:
                self._full_guide = self._try_build_full_guide(
                    normalizer, fused_collision == "interpret"
                )
                # "on"/"interpret" force the kernel past its small-batch
                # crossover gate (A/B forcing and CPU parity tests), same
                # rule as the collision-only kernels above
                if self._full_guide is not None and fused_collision in (
                    "on",
                    "interpret",
                ):
                    self._full_guide.min_batch = 1

    def _try_build_full_guide(self, normalizer, interpret: bool):
        from mpd_tpu.costs.cost_functions import CostCollision, CostGPTrajectory
        from mpd_tpu.data.normalization import LimitsNormalizer
        from mpd_tpu.kernels.panda_guide import make_panda_guide_update
        from mpd_tpu.kernels.pointmass_guide import make_pointmass_guide_update
        from mpd_tpu.world.robots import RobotPanda, RobotPointMass

        if not isinstance(normalizer, LimitsNormalizer):
            return None
        terms = self.cost.cost_list
        if len(terms) != 2:
            return None
        coll, gp = terms
        if not isinstance(coll, CostCollision) or not isinstance(
            gp, CostGPTrajectory
        ):
            return None
        if coll.squared:  # kernel implements the guidance (hinge) form only
            return None
        if isinstance(coll.robot, RobotPanda):
            make = make_panda_guide_update
        elif isinstance(coll.robot, RobotPointMass):
            make = make_pointmass_guide_update
        else:
            return None
        return make(
            coll.robot,
            coll.field,
            margin=coll.cutoff_margin,
            sigma=coll.sigma_coll,
            normalizer_mins=normalizer.mins,
            normalizer_maxs=normalizer.maxs,
            dt=gp.dt,
            sigma_gp=gp.sigma_gp,
            num_interp=self.num_interp,
            max_grad_norm=self.max_grad_norm,
            interpret=interpret,
        )

    def _clip_gradient(self, grad: jnp.ndarray) -> jnp.ndarray:
        if not self.clip_grad:
            return grad
        if self.clip_grad_rule == "norm":
            grad_norm = jnp.linalg.norm(grad + 1e-6, axis=-1, keepdims=True)
            scale_ratio = jnp.clip(grad_norm, 0.0, self.max_grad_norm) / grad_norm
            return scale_ratio * grad
        elif self.clip_grad_rule == "value":
            return jnp.clip(grad, -self.max_grad_value, self.max_grad_value)
        raise NotImplementedError(self.clip_grad_rule)

    def __call__(self, x_normalized: jnp.ndarray, weights=None) -> jnp.ndarray:
        """`weights` optionally overrides the per-term weights with traced
        scalars (e.g. a [n_terms] array argument of the jitted query) so
        weight sweeps reuse one compiled program instead of baking the
        floats into the HLO as constants."""
        batch = 1
        for d in x_normalized.shape[:-2]:
            batch *= int(d)
        if self._full_guide is not None and batch >= getattr(
            self._full_guide, "min_batch", 1
        ):
            ws2 = (
                jnp.asarray(self.cost.weights, jnp.float32)
                if weights is None
                else jnp.asarray(weights, jnp.float32)
            )
            if self._mesh is not None:
                from mpd_tpu.parallel.mesh import shard_map_batch0

                return shard_map_batch0(
                    lambda x: self._full_guide(x, ws2), self._mesh
                )(x_normalized)
            return self._full_guide(x_normalized, ws2)

        x_phys = self.unnormalize_fn(x_normalized)
        ws = self.cost.weights if weights is None else weights

        def term_cost(x, idx):
            x_interp = (
                interpolate_points(x, self.num_interp) if self.interpolate else x
            )
            return jnp.sum(self.cost.cost_list[idx](x, x_interp))

        grad_total = jnp.zeros_like(x_phys)
        for idx, weight in enumerate(ws):
            term = self.cost.cost_list[idx]
            if idx in self._fused_grads:
                # Pallas megakernel: fused interp + FK + SDF + hinge +
                # analytic backward in one program (see __init__)
                grad_cost = self._fused_grads[idx](x_phys)
            elif hasattr(term, "gradient"):
                # analytic gradient (e.g. the quadratic GP prior): skips a
                # whole autodiff backward pass per guide step
                grad_cost = term.gradient(x_phys)
            else:
                grad_cost = jax.grad(term_cost)(x_phys, idx)
            grad_cost = self._clip_gradient(grad_cost)
            grad_cost = grad_cost.at[..., 0, :].set(0.0)
            grad_cost = grad_cost.at[..., -1, :].set(0.0)
            grad_total = grad_total + weight * grad_cost

        return -1.0 * grad_total


class GuideTrajectoriesPositionOnly(GuideTrajectoriesWithVelocity):
    """Guide for position-only diffusion models (include_velocity=False).

    Counterpart of the reference's GuideManagerTrajectories
    (reference: mpd/models/diffusion_models/guides.py:15-146), which guides a
    position-only model while the costs need full [q, dq] states: the
    reference keeps a mutable velocity trajectory as member state (seeded
    from a constant-velocity prior, updated by its own gradient slice). In
    this functional design the velocity channel is reconstructed from the
    current positions by central finite differences each call — same
    information flow without hidden state; only the position slice of the
    cost gradient is returned (the reference applies the velocity slice to
    its internal member, not to the sampled state).
    """

    def __init__(self, *args, dt: float = 5.0 / 64, **kwargs):
        # the fused collision kernels differentiate w.r.t. a full [q, dq]
        # state; this guide's gradient flows through the finite-difference
        # velocity reconstruction too, which the kernels do not model —
        # position-only guidance always uses the jax.grad path
        kwargs["fused_collision"] = "off"
        super().__init__(*args, **kwargs)
        self.dt = float(dt)

    def __call__(self, x_normalized: jnp.ndarray, weights=None) -> jnp.ndarray:
        q_phys = self.unnormalize_fn(x_normalized)  # [B, H, q]
        ws = self.cost.weights if weights is None else weights
        vel = jnp.gradient(q_phys, axis=-2) / self.dt
        vel = vel.at[..., 0, :].set(0.0)
        vel = vel.at[..., -1, :].set(0.0)

        q_dim = q_phys.shape[-1]

        def term_cost(q, idx):
            x_full = jnp.concatenate([q, vel], axis=-1)
            x_interp = (
                interpolate_points(x_full, self.num_interp)
                if self.interpolate
                else x_full
            )
            return jnp.sum(self.cost.cost_list[idx](x_full, x_interp))

        grad_total = jnp.zeros_like(q_phys)
        for idx, weight in enumerate(ws):
            grad_cost = jax.grad(term_cost)(q_phys, idx)[..., :q_dim]
            grad_cost = self._clip_gradient(grad_cost)
            grad_cost = grad_cost.at[..., 0, :].set(0.0)
            grad_cost = grad_cost.at[..., -1, :].set(0.0)
            grad_total = grad_total + weight * grad_cost

        return -1.0 * grad_total
