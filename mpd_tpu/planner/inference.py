"""End-to-end planning inference: one jitted guided-diffusion query.

Counterpart of the reference's inference pipeline
(reference: scripts/inference/inference.py:34-352): build costs + guide for
the task, sample N candidate trajectories through the guided reverse chain,
unnormalize, collision-check, score, select the best.

TPU-first: the entire query — eps-model forwards, guide gradients (SDF +
GP), hard conditioning, noise — is ONE compiled XLA program (two fused
scans); candidate selection uses masked argmin so it also stays on device.
Supports the reference's three planner variants: 'mpd' (guided diffusion),
'diffusion_prior' (no guide), 'diffusion_prior_then_guide' (prior chain,
then pure guide refinement steps).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mpd_tpu.costs.cost_functions import CostCollision, CostComposite, CostGPTrajectory
from mpd_tpu.parallel.distributed import global_best_trajectory
from mpd_tpu.parallel.mesh import replicate, shard_batch
from mpd_tpu.costs.guide import (
    GuideTrajectoriesPositionOnly,
    GuideTrajectoriesWithVelocity,
)
from mpd_tpu.diffusion.gaussian_diffusion import HardConds
from mpd_tpu.diffusion.sampler import (
    SamplerConfig,
    respace_eps_fn,
    run_ddim_sampling,
    run_sampling,
)
from mpd_tpu.diffusion.schedules import DiffusionSchedule, respace_schedule_tables
from mpd_tpu.data.dataset import TrajectoryDataset
from mpd_tpu.world.task import compute_path_length, compute_smoothness


@dataclasses.dataclass(frozen=True)
class PlannerConfig:
    """Knobs mirroring the reference CLI (inference.py:41-75)."""

    planner_alg: str = "mpd"  # mpd | diffusion_prior | diffusion_prior_then_guide
    n_samples: int = 50
    start_guide_steps_fraction: float = 0.25
    n_guide_steps: int = 5
    n_diffusion_steps_without_noise: int = 5
    weight_grad_cost_collision: float = 1e-2
    weight_grad_cost_smoothness: float = 1e-7
    factor_num_interpolated_points_for_collision: float = 1.5
    trajectory_duration: float = 5.0
    use_guide_on_extra_objects_only: bool = False
    # float or schedule fn of t (ref noise_std_extra_schedule_fn,
    # inference.py:55,243 — passed through to SamplerConfig unchanged)
    noise_std_extra: object = 0.5
    # DDIM subsequence sampling instead of the full DDPM chain
    # (ref diffusion_model_base.py:184-259; selectable at inference.py:256)
    use_ddim: bool = False
    # extra noiseless denoise+guide steps after the DDIM chain (0 = the
    # reference's ddim_sample, which guides only ~2 of 6 subsequence steps
    # — see run_ddim_sampling)
    ddim_refine_steps: int = 0
    # explicit DDIM timestep subsequence (ascending ints; 0 and T-1 are
    # forced in). None = the reference's uniform linspace stride. A
    # low-t-biased stride (e.g. (0,1,2,4,9,24)) spends the same number of
    # eps-model forwards where the guide window (t < t_start_guide) is live
    ddim_times: Optional[Tuple[int, ...]] = None
    # DDIM stochasticity (0 = reference-faithful deterministic steps);
    # eta=1 recovers DDPM-style posterior noise between guided steps —
    # the exploration that makes guided DDPM outperform guided DDIM
    ddim_eta: float = 0.0
    # exploration noise (in units of the schedule's smallest noisy-step
    # std) injected between ddim_refine_steps — see run_ddim_sampling
    ddim_refine_noise_std: float = 0.0
    # annealed re-noise tail: refine step j re-noises to timestep
    # t_j (linear anneal from this value down to 0) and denoises at t_j —
    # see run_ddim_sampling(refine_anneal_t=...)
    ddim_refine_anneal_t: int = 0
    # respaced-DDPM fast lane (schedules.respaced_schedule): the standard
    # stochastic DDPM chain run over a timestep subsequence — the DDIM
    # lane's eps-forward count with DDPM's posterior-noise candidate
    # diversity. Mutually exclusive with use_ddim. respaced_times=None
    # uses the DDIM serving lane's subsequence (3 guided noisy steps in
    # the t<7 window + the n_extra noiseless tail).
    use_respaced: bool = False
    respaced_times: Optional[Tuple[int, ...]] = None
    # pure-guide refinement tail appended AFTER the sampling chain.
    # None = variant default: for 'diffusion_prior_then_guide' the
    # reference's full tail of (t_start_guide + n_extra) * n_guide_steps
    # steps (ref inference.py:263-282), for 'mpd' no tail. An explicit
    # int overrides the count for either variant — 0 now genuinely means
    # a tail-free run (ADVICE r4: 0 used to double as the variant-default
    # sentinel, making a tail-free prior_then_guide unrequestable). For
    # 'mpd' a positive value appends a SHORT tail after the guided chain —
    # the hybrid between the two reference variants (the guided chain's
    # diversity plus a few deterministic push-out-of-collision steps;
    # VERDICT r3 #5).
    n_post_guide_steps: Optional[int] = None
    # linear per-step multiplier ramp (start, end) applied to the
    # COLLISION-term guide weights over the post-chain tail (the
    # smoothness term keeps its weight): (1.0, 3.0) ramps w_coll up 3x by
    # the last tail step. None = constant weights (the r4 behavior).
    # Quality lever for the Panda frontier (VERDICT r4 #4): a rising ramp
    # pushes stragglers out of collision late without inflating path
    # length during the early tail steps.
    post_guide_w_coll_ramp: Optional[Tuple[float, float]] = None
    # freeze-when-free adaptive tail (r5): each post-guide tail step
    # updates ONLY trajectories the validity oracle still flags as
    # in-collision; already-free candidates are frozen and keep their
    # (shorter) paths. The guide is deterministic, so an unchanged free
    # trajectory stays free — freezing is monotone without carried state.
    # Strictly dominates the constant/ramp tails on the quality-vs-path
    # frontier wherever the oracle and the guide agree: stragglers get
    # the full push while the free subset pays zero path cost. Costs one
    # oracle eval (interp + FK + SDF sign check, ~the forward half of a
    # guide eval) per tail step. No reference counterpart (the reference
    # tail pushes every candidate, ref inference.py:263-282).
    post_guide_freeze_free: bool = False
    # per-candidate resampling passes (r5): after the chain (+tail),
    # re-run the ENTIRE chain (+tail) with fresh noise and replace only
    # the candidates the validity oracle still rejects — free candidates
    # keep their plans. Independent redraws make the stuck fraction
    # multiply: with per-candidate free probability p, k passes leave
    # ~(1-p)^(k+1) stuck. The lever past the freeze tail's 0.990/0.993
    # saturation (whose residual is geometrically trapped DRAWS, not
    # recoverable states — see the restart-noise anti-result in
    # RESULTS.md). Each pass costs one full chain on the whole batch
    # (static shapes; masked merge). trajs_chain records pass 0, with
    # one extra appended row per pass showing the merged state.
    n_resample_passes: int = 0
    # annealed restart noise (r5, requires freeze_when_free): per tail
    # step, still-colliding candidates additionally receive Gaussian
    # noise with std annealed linearly (s0 -> s1, normalized units)
    # across the tail — simulated-annealing escapes for the stuck
    # candidates the deterministic guide push cannot free (oscillating
    # between obstacles); free candidates stay frozen and never see
    # noise. The chain prefix is unchanged in distribution but not
    # bitwise (one extra key split at the top when enabled).
    post_guide_noise_anneal: Optional[Tuple[float, float]] = None
    # early-exit tail (r5, plan_batch only): under freeze_when_free the
    # tail is RESULT-IDENTICAL when stopped at the first step where every
    # candidate is free (all remaining updates are masked to zero), so
    # the serving path runs it as a lax.while_loop and refunds the
    # remaining guide evals on easy query batches. `plan` keeps the scan
    # (it returns the fixed-length chain). False forces the scan
    # everywhere (A/B + equality test).
    post_guide_early_exit: bool = True
    # interpolation count for collision guide terms. Default 128 = the
    # reference's EFFECTIVE value (a kwarg-name mismatch at its call site
    # ignores the intended ceil(1.5*64)=96 — ref inference.py:233-236 vs
    # guides.py:152-156; see costs/guide.py). The guide's SDF work is
    # linear in this count, so 96/64 are the work-reduction lanes
    # (VERDICT r4 #3); quality sweep in RESULTS.md.
    num_interpolated_points: int = 128
    # Pallas megakernel for the collision-guide gradient ("auto" = on when
    # the backend is a real TPU; "on"/"interpret"/"off" force — see
    # kernels/{panda,pointmass}_guide.py). Covers Panda in sphere-only 3D
    # fields and the point robot in 2D sphere/box fields; other terms keep
    # the jax.grad path. Under a mesh the kernel runs shard_mapped over the
    # candidate axis (parallel.shard_map_batch0).
    fused_collision_guide: str = "auto"


@dataclasses.dataclass
class PlanningResult:
    trajs_final: np.ndarray  # [B, H, 2q] unnormalized
    trajs_chain: Optional[np.ndarray]  # [S, B, H, 2q]
    free_mask: np.ndarray  # [B]
    success: int
    fraction_free: float
    collision_intensity: float
    idx_best: Optional[int]
    cost_best: Optional[float]
    cost_smoothness: Optional[np.ndarray]
    cost_path_length: Optional[np.ndarray]
    variance_waypoints: Optional[float]
    t_total: float = 0.0


class MotionPlanner:
    """Builds and caches the compiled planning query for one task+model."""

    def __init__(
        self,
        dataset: TrajectoryDataset,
        schedule: DiffusionSchedule,
        eps_fn,  # eps_fn(x [B,H,D], t [B]) -> eps_hat (params already bound)
        config: PlannerConfig = PlannerConfig(),
        params=None,  # optional: eps_fn(params, x, t); params passed as a
        # traced argument so the compiled query is reused across checkpoints
        # (closed-over params bake into the HLO as constants and force a
        # fresh compile per weight set)
        mesh: Optional[Mesh] = None,
        # mesh shards the candidate axis across devices: params replicated,
        # hard conds (and hence the whole denoise/guide chain) split on the
        # mesh's 'data' axis; the only cross-device traffic is the final
        # best-plan argmin collective (parallel.global_best_trajectory).
    ):
        self.dataset = dataset
        self.schedule = schedule
        self.mesh = mesh
        # bf16 inference: construct the TemporalUnet with dtype=jnp.bfloat16
        # and pass its bound apply here — the chain state, guide gradients and
        # coefficient tables stay float32 regardless.
        self.eps_fn = eps_fn
        # device_put once: checkpoint params arrive as host arrays, and
        # re-transferring ~16 MB of weights per query through the device
        # tunnel would dominate the query latency
        if params is None:
            self.params = None
        elif mesh is not None:
            self.params = replicate(mesh, params)
        else:
            self.params = jax.device_put(params)
        self.config = config

        task = dataset.task
        robot = dataset.robot
        H = dataset.n_support_points
        dt = config.trajectory_duration / H
        robot.dt = dt

        # ---- costs (ref inference.py:186-225)
        if config.use_guide_on_extra_objects_only:
            fields = [task.env.extra_objects]
        else:
            fields = [task.env.objects]
        cost_list = [
            CostCollision(
                robot, H, field=f, sigma_coll=1.0,
                cutoff_margin=task.obstacle_cutoff_margin,
            )
            for f in fields
        ]
        weights = [config.weight_grad_cost_collision] * len(cost_list)
        cost_list.append(CostGPTrajectory(robot, H, dt, sigma_gp=1.0))
        weights.append(config.weight_grad_cost_smoothness)
        cost_composite = CostComposite(robot, H, cost_list, weights_cost_l=weights)
        # guide weights ride as a traced argument of the compiled query, so
        # one compile serves every w_coll/w_smooth setting (weight sweeps and
        # per-task tuning, ref README.md:84-88, recompile nothing)
        self._guide_weights = jnp.asarray(weights, jnp.float32)

        # ---- guide (ref inference.py:229-236; effective interp count is 128,
        # see guide.py docstring on the reference's kwarg-mismatch quirk).
        # Position-only datasets get the velocity-reconstructing variant
        # (ref GuideManagerTrajectories).
        guide_cls = (
            GuideTrajectoriesWithVelocity
            if dataset.include_velocity
            else GuideTrajectoriesPositionOnly
        )
        guide_kwargs = {} if dataset.include_velocity else {"dt": dt}
        # a pallas_call does not partition under GSPMD propagation, so under
        # a mesh the kernel is wrapped in shard_map over the candidate axis
        # (per-device kernel instances, zero collectives) — the fused guide
        # and mesh-sharded planning compose; see parallel.shard_map_batch0
        self.guide = guide_cls(
            unnormalize_fn=dataset.unnormalize_trajectories,
            cost=cost_composite,
            clip_grad=True,
            interpolate_trajectories_for_collision=True,
            num_interpolated_points_for_collision=config.num_interpolated_points,
            fused_collision=config.fused_collision_guide,
            mesh=mesh,
            # enables the FULL guide-step megakernel when the composite
            # matches the production Panda shape (kernels/panda_guide.py
            # make_panda_guide_update); other tasks keep the composed path
            normalizer=dataset.traj_normalizer,
            **guide_kwargs,
        )

        t_start_guide = math.ceil(
            config.start_guide_steps_fraction * schedule.n_steps
        )
        self.sampler_cfg = SamplerConfig(
            n_guide_steps=config.n_guide_steps,
            t_start_guide=t_start_guide,
            n_extra_steps=config.n_diffusion_steps_without_noise,
            noise_std_extra=config.noise_std_extra,
        )
        self._t_start_guide = t_start_guide

        # respaced-DDPM lane: swap in the subsequence tables and move the
        # guide window to subsequence indices covering the SAME original-t
        # window (t < t_start_guide); the eps model is queried at original
        # timesteps via respace_eps_fn inside the compiled query
        self._respaced_times = None
        if config.use_respaced:
            if config.use_ddim:
                raise ValueError("use_ddim and use_respaced are mutually exclusive")
            times = config.respaced_times or (0, 3, 6, 8, 11, 14, 17, 19, 22, 24)
            sub_schedule, times = respace_schedule_tables(schedule, times)
            idx_start_guide = sum(1 for t in times if t < t_start_guide)
            nse = config.noise_std_extra
            self.sampler_cfg = dataclasses.replace(
                self.sampler_cfg,
                t_start_guide=idx_start_guide,
                # a schedule fn of t expects ORIGINAL timesteps; jnp-index
                # the map so the wrapper works on host ints (run_sampling's
                # host-side noise pre-draw) and traced t alike
                noise_std_extra=(
                    (lambda t, _nse=nse,
                     _tm=jnp.asarray(times, jnp.int32): _nse(_tm[t]))
                    if callable(nse)
                    else nse
                ),
            )
            self._respaced_times = times
            self._run_schedule = sub_schedule
        else:
            self._run_schedule = schedule

        use_guide_in_chain = config.planner_alg == "mpd"

        B, D = config.n_samples, dataset.state_dim
        # None = variant default; an explicit int (incl. 0) always wins
        if config.n_post_guide_steps is not None:
            n_post_steps = (
                config.n_post_guide_steps if use_guide_in_chain
                or config.planner_alg == "diffusion_prior_then_guide" else 0
            )
        elif config.planner_alg == "diffusion_prior_then_guide":
            n_post_steps = (
                t_start_guide + config.n_diffusion_steps_without_noise
            ) * config.n_guide_steps
        else:
            n_post_steps = 0
        # per-tail-step guide-weight scale (the w_coll ramp); a static [k]
        # vector scanned alongside the tail, so one compile per config
        if n_post_steps and config.post_guide_w_coll_ramp is not None:
            s0, s1 = config.post_guide_w_coll_ramp
            post_scales = jnp.linspace(float(s0), float(s1), n_post_steps)
        else:
            post_scales = jnp.ones((max(n_post_steps, 1),), jnp.float32)
        # per-step restart-noise std (annealed; see PlannerConfig)
        if n_post_steps and config.post_guide_noise_anneal is not None:
            if not config.post_guide_freeze_free:
                raise ValueError(
                    "post_guide_noise_anneal requires post_guide_freeze_free "
                    "(the noise is masked to still-colliding candidates)"
                )
            g0, g1 = config.post_guide_noise_anneal
            post_noise = jnp.linspace(float(g0), float(g1), n_post_steps)
        else:
            post_noise = jnp.zeros((max(n_post_steps, 1),), jnp.float32)

        use_tail_noise = (
            n_post_steps > 0 and config.post_guide_noise_anneal is not None
        )

        def _query(key: jax.Array, hard_conds: HardConds, params, guide_weights):
            step_eps_fn = (
                eps_fn if params is None else (lambda x, t: eps_fn(params, x, t))
            )
            guide_fn = (
                (lambda x: self.guide(x, weights=guide_weights))
                if use_guide_in_chain
                else None
            )

            def run_once(k, want_chain):
                """One full chain (+ guide tail). Pass 0 records the chain;
                resample passes skip it (want_chain is trace-time)."""
                if use_tail_noise:
                    # reserve an independent key for the tail's restart
                    # noise (only when the feature is on, so existing
                    # configs keep their exact chain noise)
                    k, tail_key = jax.random.split(k)
                else:
                    tail_key = k  # unused (dead scan carry)
                if config.use_ddim:
                    out = run_ddim_sampling(
                        schedule, step_eps_fn, k, (B, H, D), hard_conds,
                        self.sampler_cfg, guide_fn=guide_fn,
                        return_chain=want_chain,
                        extra_refine_steps=config.ddim_refine_steps,
                        times=config.ddim_times, eta=config.ddim_eta,
                        refine_noise_std=config.ddim_refine_noise_std,
                        refine_anneal_t=config.ddim_refine_anneal_t,
                    )
                else:
                    sf = step_eps_fn
                    if self._respaced_times is not None:
                        sf = respace_eps_fn(step_eps_fn, self._respaced_times)
                    out = run_sampling(
                        self._run_schedule, sf, k, (B, H, D), hard_conds,
                        self.sampler_cfg, guide_fn=guide_fn,
                        return_chain=want_chain,
                    )
                x_final, chain = out if want_chain else (out, None)
                if n_post_steps:
                    from mpd_tpu.diffusion.gaussian_diffusion import (
                        apply_hard_conditioning,
                    )

                    # pure guide refinement after the prior chain
                    # (ref inference.py:263-282); `s` scales the
                    # collision-term weights per tail step
                    # (post_guide_w_coll_ramp), `sig` is the annealed
                    # restart-noise std (post_guide_noise_anneal)
                    def body(carry, inp):
                        x, kk = carry
                        s, sig = inp
                        w = jnp.concatenate(
                            [guide_weights[:-1] * s, guide_weights[-1:]]
                        )
                        upd = self.guide(x, weights=w)
                        if use_tail_noise:
                            kk, sub = jax.random.split(kk)
                            upd = upd + sig * jax.random.normal(
                                sub, x.shape, x.dtype
                            )
                        if config.post_guide_freeze_free:
                            # per-trajectory adaptive tail: freeze
                            # candidates the oracle already accepts (see
                            # PlannerConfig); the mask covers the
                            # restart noise too
                            free = task.trajs_free_mask(
                                dataset.unnormalize_trajectories(x)
                            )
                            upd = jnp.where(free[:, None, None], 0.0, upd)
                        x = apply_hard_conditioning(x + upd, hard_conds)
                        return (x, kk), (x if want_chain else None)

                    (x_final, _), post_chain = jax.lax.scan(
                        body, (x_final, tail_key), (post_scales, post_noise)
                    )
                    if want_chain:
                        chain = jnp.concatenate([chain, post_chain], axis=0)
                return x_final, chain

            x_final, chain = run_once(key, True)
            # per-candidate resampling (see PlannerConfig.n_resample_passes):
            # fresh chains replace only the oracle-rejected candidates
            for p in range(config.n_resample_passes):
                free_p = task.trajs_free_mask(
                    dataset.unnormalize_trajectories(x_final)
                )
                x_new, _ = run_once(jax.random.fold_in(key, 1000 + p), False)
                x_final = jnp.where(free_p[:, None, None], x_final, x_new)
                chain = jnp.concatenate([chain, x_final[None]], axis=0)
            trajs_chain = dataset.unnormalize_trajectories(chain)
            trajs_final = trajs_chain[-1]
            free_mask = task.trajs_free_mask(trajs_final)

            # per-candidate scoring + best-plan selection stay on device
            # (one program; under a sharded candidate axis the argmin lowers
            # to the query's only collective). Ref scores only the free
            # subset (inference.py:312-327) — masking with +inf is identical.
            cost_sm = compute_smoothness(trajs_final, robot)
            cost_pl = compute_path_length(trajs_final, robot)
            costs = jnp.where(free_mask, cost_sm + cost_pl, jnp.inf)
            best_traj, best_cost, idx_best = global_best_trajectory(
                trajs_final, costs
            )
            coll_intensity = task.compute_collision_intensity_trajs(trajs_final)

            # variance-of-waypoints over the free subset, mask-weighted so
            # the program shape is independent of how many candidates are
            # free (a dynamic-slice version would recompile per free-count)
            w = free_mask.astype(trajs_final.dtype)
            nfree = jnp.maximum(w.sum(), 1.0)
            q = robot.get_position(trajs_final)
            q_mean = (w[:, None, None] * q).sum(0) / nfree
            var_wp = ((w[:, None] * ((q - q_mean) ** 2).sum(-1)).sum(0) / nfree).sum()

            metrics = dict(
                cost_smoothness=cost_sm,
                cost_path_length=cost_pl,
                best_cost=best_cost,
                idx_best=idx_best,
                collision_intensity=coll_intensity,
                variance_waypoints=var_wp,
            )
            return trajs_final, trajs_chain, free_mask, metrics

        self._query = jax.jit(_query)
        self._n_post_steps = n_post_steps
        self._post_scales = post_scales
        self._post_noise = post_noise
        # compiled multi-query programs, keyed by Q (plan_batch)
        self._batch_queries = {}

    def _make_batch_query(self, Q: int):
        """Build the Q-query batched program (Q static, cached per Q).

        TPU-native serving path with no reference counterpart: the
        reference plans one query per GPU launch sequence
        (inference.py:238-257); here Q queries x n_samples candidates run
        as ONE fused program, so the per-dispatch host<->device latency
        (~15-25 ms through the tunneled backend, often larger than the
        device compute itself at B=50) is paid once per Q queries instead
        of per query. Candidate layout is query-major [Q*B, H, D]; scoring,
        per-query masked argmin and collision metrics all stay on device.
        """
        config = self.config
        dataset = self.dataset
        task, robot = dataset.task, dataset.robot
        H, D = dataset.n_support_points, dataset.state_dim
        B = config.n_samples
        schedule, eps_fn = self.schedule, self.eps_fn
        run_schedule, respaced_times = self._run_schedule, self._respaced_times
        guide, sampler_cfg = self.guide, self.sampler_cfg
        use_guide_in_chain = config.planner_alg == "mpd"
        n_post_steps = self._n_post_steps
        post_scales = self._post_scales
        post_noise = self._post_noise
        use_tail_noise = (
            n_post_steps > 0 and config.post_guide_noise_anneal is not None
        )

        def _query_batch(key, hard_conds, params, guide_weights):
            step_eps_fn = (
                eps_fn if params is None else (lambda x, t: eps_fn(params, x, t))
            )
            guide_fn = (
                (lambda x: guide(x, weights=guide_weights))
                if use_guide_in_chain
                else None
            )
            shape = (Q * B, H, D)

            def run_once(k):
                x_final, tail_key = _chain(k)
                return _tail(x_final, tail_key)

            def _chain(k):
                if use_tail_noise:
                    k, tail_key = jax.random.split(k)
                else:
                    tail_key = k  # unused (dead carry)
                if config.use_ddim:
                    x_final = run_ddim_sampling(
                        schedule, step_eps_fn, k, shape, hard_conds,
                        sampler_cfg, guide_fn=guide_fn,
                        extra_refine_steps=config.ddim_refine_steps,
                        times=config.ddim_times, eta=config.ddim_eta,
                        refine_noise_std=config.ddim_refine_noise_std,
                        refine_anneal_t=config.ddim_refine_anneal_t,
                    )
                else:
                    sf = step_eps_fn
                    if respaced_times is not None:
                        sf = respace_eps_fn(step_eps_fn, respaced_times)
                    x_final = run_sampling(
                        run_schedule, sf, k, shape, hard_conds,
                        sampler_cfg, guide_fn=guide_fn,
                    )
                return x_final, tail_key

            def _tail(x_final, tail_key):
                if not n_post_steps:
                    return x_final
                from mpd_tpu.diffusion.gaussian_diffusion import (
                    apply_hard_conditioning,
                )

                if config.post_guide_freeze_free and config.post_guide_early_exit:
                    # see PlannerConfig.post_guide_early_exit: identical
                    # result to the scan below, but stops at the first
                    # all-free step instead of running masked no-ops
                    def cond_fn(carry):
                        i, _, all_free, _k = carry
                        return jnp.logical_and(i < n_post_steps, ~all_free)

                    def body_fn(carry):
                        i, x, _, k = carry
                        w = jnp.concatenate(
                            [guide_weights[:-1] * post_scales[i],
                             guide_weights[-1:]]
                        )
                        upd = guide(x, weights=w)
                        if use_tail_noise:
                            k, sub = jax.random.split(k)
                            upd = upd + post_noise[i] * jax.random.normal(
                                sub, x.shape, x.dtype
                            )
                        free = task.trajs_free_mask(
                            dataset.unnormalize_trajectories(x)
                        )
                        upd = jnp.where(free[:, None, None], 0.0, upd)
                        x = apply_hard_conditioning(x + upd, hard_conds)
                        return (i + 1, x, jnp.all(free), k)

                    _, x_final, _, _ = jax.lax.while_loop(
                        cond_fn, body_fn,
                        (jnp.int32(0), x_final, jnp.bool_(False), tail_key),
                    )
                else:
                    def body(carry, inp):
                        x, k = carry
                        s, sig = inp
                        w = jnp.concatenate(
                            [guide_weights[:-1] * s, guide_weights[-1:]]
                        )
                        upd = guide(x, weights=w)
                        if use_tail_noise:
                            k, sub = jax.random.split(k)
                            upd = upd + sig * jax.random.normal(
                                sub, x.shape, x.dtype
                            )
                        if config.post_guide_freeze_free:
                            free = task.trajs_free_mask(
                                dataset.unnormalize_trajectories(x)
                            )
                            upd = jnp.where(free[:, None, None], 0.0, upd)
                        x = apply_hard_conditioning(x + upd, hard_conds)
                        return (x, k), None

                    (x_final, _), _ = jax.lax.scan(
                        body, (x_final, tail_key), (post_scales, post_noise)
                    )
                return x_final

            x_final = run_once(key)
            # per-candidate resampling (PlannerConfig.n_resample_passes):
            # fresh chains replace only the oracle-rejected candidates
            for p in range(config.n_resample_passes):
                free_p = task.trajs_free_mask(
                    dataset.unnormalize_trajectories(x_final)
                )
                x_new = run_once(jax.random.fold_in(key, 1000 + p))
                x_final = jnp.where(free_p[:, None, None], x_final, x_new)

            tq = dataset.unnormalize_trajectories(x_final).reshape(Q, B, H, D)
            coll_mask = task.trajs_collision_mask(tq)  # [Q, B, P]
            free_mask = ~jnp.any(coll_mask, axis=-1)  # [Q, B]
            cost_sm = compute_smoothness(tq, robot)  # [Q, B]
            cost_pl = compute_path_length(tq, robot)
            costs = jnp.where(free_mask, cost_sm + cost_pl, jnp.inf)
            idx_best = jnp.argmin(costs, axis=1)  # [Q]
            best_cost = jnp.take_along_axis(costs, idx_best[:, None], 1)[:, 0]
            best_traj = jnp.take_along_axis(
                tq, idx_best[:, None, None, None], axis=1
            )[:, 0]  # [Q, H, D]
            coll_intensity = coll_mask.astype(jnp.float32).mean(axis=(1, 2))

            w = free_mask.astype(tq.dtype)
            nfree = jnp.maximum(w.sum(1), 1.0)  # [Q]
            q_pos = robot.get_position(tq)  # [Q, B, H, q]
            q_mean = (w[:, :, None, None] * q_pos).sum(1) / nfree[:, None, None]
            var_wp = (
                (w[:, :, None] * ((q_pos - q_mean[:, None]) ** 2).sum(-1)).sum(1)
                / nfree[:, None]
            ).sum(-1)
            return dict(
                trajs_final=tq,
                best_traj=best_traj,
                free_mask=free_mask,
                cost_smoothness=cost_sm,
                cost_path_length=cost_pl,
                best_cost=best_cost,
                idx_best=idx_best,
                collision_intensity=coll_intensity,
                variance_waypoints=var_wp,
            )

        return jax.jit(_query_batch)

    def plan_batch(
        self,
        key: jax.Array,
        starts: jnp.ndarray,  # [Q, q_dim]
        goals: jnp.ndarray,  # [Q, q_dim]
        guide_weights=None,
        return_all_trajs: bool = True,
        transfer_dtype=None,
    ):
        """Plan Q queries in ONE device call; returns a list of
        PlanningResult (chains omitted). Amortizes the per-dispatch
        host<->device latency across the whole batch — the serving-path
        counterpart of `plan` (see _make_batch_query).

        `return_all_trajs=False` fetches only the per-query BEST
        trajectory ([Q, H, D]) plus the scalar/per-candidate metrics
        instead of the full [Q, B, H, D] candidate tensor — through the
        tunneled backend the candidate tensor is megabytes per dispatch
        and its device->host transfer can rival the device compute
        (serving callers want the chosen plan, not 100 rejected
        candidates); each PlanningResult.trajs_final then has shape
        [1, H, D] and idx_best is 0. FAILURE PAYLOAD: when a query has no
        collision-free candidate (success=0), best-only mode returns
        trajs_final filled with NaN — the on-device argmin over all-inf
        costs would otherwise silently hand back candidate 0's
        in-collision trajectory as if it were a chosen plan (ADVICE r4);
        full mode returns the whole candidate set unchanged, with
        idx_best/cost_best already None.

        `transfer_dtype` (e.g. jnp.bfloat16) compresses the CANDIDATE
        tensor's device->host transfer in full mode — halves the
        [Q, B, H, D] bytes per dispatch (VERDICT r4 #8). Scoring,
        collision masks and the best trajectory are computed on device in
        f32 BEFORE the cast, so metrics and the chosen plan are exact;
        only the returned candidate array is rounded (bf16: ~3 decimal
        digits — fine for visualization/diversity consumers of the
        non-chosen candidates). Ignored in best-only mode (the [Q, H, D]
        best tensor is small and stays exact)."""
        import time

        starts = jnp.atleast_2d(starts)
        goals = jnp.atleast_2d(goals)
        Q = starts.shape[0]
        B = self.config.n_samples

        states = jnp.stack([starts, goals], axis=1)  # [Q, 2, q]
        states = jnp.concatenate([states, jnp.zeros_like(states)], axis=-1)
        conds = self.dataset.get_hard_conditions(states, normalize=True)
        conds = {
            k: jnp.broadcast_to(v[:, None, :], (Q, B) + v.shape[-1:]).reshape(
                Q * B, -1
            )
            for k, v in conds.items()
        }
        if self.mesh is not None:
            conds = shard_batch(self.mesh, conds)

        if Q not in self._batch_queries:
            self._batch_queries[Q] = self._make_batch_query(Q)
        gw = (
            self._guide_weights
            if guide_weights is None
            else jnp.asarray(guide_weights, jnp.float32)
        )
        t0 = time.perf_counter()
        dm = self._batch_queries[Q](key, conds, self.params, gw)
        if not return_all_trajs:
            # skip the [Q, B, H, D] candidate-tensor transfer entirely
            dm = dict(dm)
            del dm["trajs_final"]
        elif transfer_dtype is not None:
            # compressed candidate transfer: cast on device, ship the
            # narrow tensor, restore f32 on host (metrics/best computed
            # from the f32 tensor on device — see docstring)
            dm = dict(dm)
            dm["trajs_final"] = dm["trajs_final"].astype(transfer_dtype)
        # single bulk device->host fetch: per-element indexing of device
        # arrays in the loop below would pay one tunneled round-trip
        # (~20 ms) per scalar — 4 scalars x Q queries swamped the device
        # compute itself before this was batched
        dm = jax.device_get(dm)
        t_total = time.perf_counter() - t0

        if return_all_trajs:
            trajs = dm["trajs_final"]
            if transfer_dtype is not None:
                trajs = np.asarray(trajs, dtype=np.float32)
        else:
            trajs = dm["best_traj"][:, None]  # [Q, 1, H, D]
        free = dm["free_mask"]
        cost_sm = dm["cost_smoothness"]
        cost_pl = dm["cost_path_length"]
        results = []
        for qi in range(Q):
            success = int(free[qi].any())
            free_idxs = np.nonzero(free[qi])[0]
            trajs_q = trajs[qi]
            if not success and not return_all_trajs:
                # no collision-free candidate: don't pass off candidate
                # 0's in-collision trajectory as a chosen plan (docstring)
                trajs_q = np.full_like(trajs_q, np.nan)
            results.append(
                PlanningResult(
                    trajs_final=trajs_q,
                    trajs_chain=None,
                    free_mask=free[qi],
                    success=success,
                    fraction_free=float(free[qi].mean()),
                    collision_intensity=float(dm["collision_intensity"][qi]),
                    idx_best=(
                        (int(dm["idx_best"][qi]) if return_all_trajs else 0)
                        if success
                        else None
                    ),
                    cost_best=float(dm["best_cost"][qi]) if success else None,
                    cost_smoothness=cost_sm[qi][free_idxs] if success else None,
                    cost_path_length=cost_pl[qi][free_idxs] if success else None,
                    variance_waypoints=(
                        float(dm["variance_waypoints"][qi]) if success else None
                    ),
                    t_total=t_total / Q,
                )
            )
        return results

    def hard_conds_for(self, start_pos: jnp.ndarray, goal_pos: jnp.ndarray) -> HardConds:
        states = jnp.stack([start_pos, goal_pos])
        conds = self.dataset.get_hard_conditions(
            jnp.concatenate([states, jnp.zeros_like(states)], axis=-1),
            normalize=True,
        )
        # broadcast to the sample batch (ref run_inference, diffusion_model_base.py:292-294)
        conds = {
            k: jnp.broadcast_to(v, (self.config.n_samples,) + v.shape)
            for k, v in conds.items()
        }
        if self.mesh is not None:
            # placing the conds sharded is what makes jit lay the whole
            # candidate chain out across the mesh (shardings propagate)
            conds = shard_batch(self.mesh, conds)
        return conds

    def plan(
        self,
        key: jax.Array,
        start_pos: jnp.ndarray,
        goal_pos: jnp.ndarray,
        return_chain: bool = False,
        guide_weights=None,
    ) -> PlanningResult:
        """One planning query (host wrapper: metrics + best-plan selection).

        `guide_weights` optionally overrides the per-term guide weights
        ([collision..., smoothness], same order as construction) without
        recompiling — the compiled query takes them as traced scalars."""
        import time

        hard_conds = self.hard_conds_for(start_pos, goal_pos)
        gw = (
            self._guide_weights
            if guide_weights is None
            else jnp.asarray(guide_weights, jnp.float32)
        )
        t0 = time.perf_counter()
        trajs_final, trajs_chain, free_mask, dm = self._query(
            key, hard_conds, self.params, gw
        )
        jax.block_until_ready(trajs_final)
        t_total = time.perf_counter() - t0

        free_mask_np = np.asarray(free_mask)
        success = int(free_mask_np.any())
        fraction_free = float(free_mask_np.mean())
        collision_intensity = float(dm["collision_intensity"])

        idx_best = cost_best = None
        cost_sm = cost_pl = var_wp = None
        if success:
            # host side only re-slices the device-computed per-candidate
            # metrics to the free subset for reporting (mean/std)
            free_idxs = np.nonzero(free_mask_np)[0]
            cost_sm = np.asarray(dm["cost_smoothness"])[free_idxs]
            cost_pl = np.asarray(dm["cost_path_length"])[free_idxs]
            idx_best = int(dm["idx_best"])
            cost_best = float(dm["best_cost"])
            var_wp = float(dm["variance_waypoints"])

        return PlanningResult(
            trajs_final=np.asarray(trajs_final),
            trajs_chain=np.asarray(trajs_chain) if return_chain else None,
            free_mask=free_mask_np,
            success=success,
            fraction_free=fraction_free,
            collision_intensity=collision_intensity,
            idx_best=idx_best,
            cost_best=cost_best,
            cost_smoothness=cost_sm,
            cost_path_length=cost_pl,
            variance_waypoints=var_wp,
            t_total=t_total,
        )
