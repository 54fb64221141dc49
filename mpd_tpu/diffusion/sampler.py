"""Guided reverse-DDPM sampling as a single jittable scan.

TPU-first redesign of the reference's Python sampling loop
(reference: mpd/models/diffusion_models/diffusion_model_base.py:157-182 and
mpd/models/diffusion_models/sample_functions.py:17-83): instead of a host loop
of 30 CUDA launches, the whole chain — eps-model forward, posterior step,
guide-gradient steps, hard conditioning, noise injection — is two
`lax.scan`s (an unguided phase and a guided phase, statically split at
`t_start_guide` so XLA compiles each specialized, with no per-step cond).

Timestep convention (matches the reference exactly):
  i runs over reversed(range(-n_extra_steps, T)); the effective timestep is
  t = max(i, 0); noise is zeroed whenever t == 0 (i.e. i <= 0), so the final
  `n_extra_steps + 1` steps are deterministic denoise/guide refinements.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from mpd_tpu.diffusion.gaussian_diffusion import (
    HardConds,
    apply_hard_conditioning,
    p_mean_variance,
    predict_noise_from_start,
    predict_start_from_noise,
)
from mpd_tpu.diffusion.schedules import DiffusionSchedule

EpsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
# guide_fn(x_normalized) -> update direction (already negated cost gradient)
GuideFn = Callable[[jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static sampler knobs (all shapes/trip-counts are compile-time)."""

    n_guide_steps: int = 5
    t_start_guide: int = 7  # guide active for steps with i < t_start_guide
    n_extra_steps: int = 5  # extra noiseless steps after t=0 (ref: n_diffusion_steps_without_noise)
    # temperature on the injected noise: a float, or a schedule fn of the
    # (clamped) timestep t -> std, matching the reference's
    # noise_std_extra_schedule_fn contract (ref sample_functions.py:56-59,
    # inference.py:243 passes `lambda t: 0.5`)
    noise_std_extra: Union[float, Callable[[jnp.ndarray], jnp.ndarray]] = 0.5
    scale_grad_by_std: bool = False
    clip_denoised: bool = True
    predict_epsilon: bool = True


def guide_gradient_steps(
    x: jnp.ndarray,
    hard_conds: HardConds,
    guide_fn: GuideFn,
    n_guide_steps: int = 1,
    model_var: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """n guide ascent steps with re-pinning (ref sample_functions.py:65-83).

    Scanned rather than Python-unrolled so traced program size (and remote
    compile time) is independent of n_guide_steps.
    """

    def body(x, _):
        grad_scaled = guide_fn(x)
        if model_var is not None:
            grad_scaled = model_var * grad_scaled
        x = x + grad_scaled
        return apply_hard_conditioning(x, hard_conds), None

    if n_guide_steps == 1:
        return body(x, None)[0]
    x, _ = jax.lax.scan(body, x, None, length=n_guide_steps)
    return x


def respace_eps_fn(eps_fn: EpsFn, times) -> EpsFn:
    """Remap subsequence indices -> original timesteps for the eps model.

    A respaced chain (schedules.respaced_schedule) runs over indices
    j = 0..S-1, but the eps model was trained on the BASE schedule's
    timestep embeddings — it must be queried at t = times[j]. `times` is
    static; the gather is a [S]-table lookup on the traced index vector.
    """
    t_map = jnp.asarray(np.asarray(times, dtype=np.int32))

    def eps(x, t):
        return eps_fn(x, t_map[t])

    return eps


def ddpm_sample_step(
    schedule: DiffusionSchedule,
    eps_fn: EpsFn,
    x: jnp.ndarray,
    i: jnp.ndarray,
    key: jax.Array,
    hard_conds: HardConds,
    cfg: SamplerConfig,
    guide_fn: Optional[GuideFn] = None,
    guided: bool = False,
) -> jnp.ndarray:
    """One reverse step x_i -> x_{i-1} (ref sample_functions.py:17-62).

    `guided` is static: the guided/unguided variants are separate traces.
    """
    b = x.shape[0]
    t = jnp.full((b,), jnp.maximum(i, 0), dtype=jnp.int32)

    model_mean, log_var = p_mean_variance(
        schedule, eps_fn, x, t,
        clip_denoised=cfg.clip_denoised, predict_epsilon=cfg.predict_epsilon,
    )
    x = model_mean
    model_std = jnp.exp(0.5 * log_var)

    if guided and guide_fn is not None:
        model_var = jnp.exp(log_var) if cfg.scale_grad_by_std else None
        x = guide_gradient_steps(
            x, hard_conds, guide_fn,
            n_guide_steps=cfg.n_guide_steps, model_var=model_var,
        )

    noise = jax.random.normal(key, x.shape, x.dtype)
    noise = noise * (i > 0).astype(x.dtype)  # no noise when t == 0
    return x + model_std * noise * _noise_std_extra(cfg, jnp.maximum(i, 0))


def _noise_std_extra(cfg: SamplerConfig, t):
    """Evaluate the noise-temperature knob at timestep t (float or fn-of-t)."""
    nse = cfg.noise_std_extra
    return nse(t) if callable(nse) else nse


def _chain_noises(
    schedule: DiffusionSchedule,
    key: jax.Array,
    steps,
    shape: Tuple[int, int, int],
    cfg: SamplerConfig,
) -> jnp.ndarray:
    """Pre-draw the per-step additive noise n_j = std_{t_j} * z_j * temp,
    zeroed where t == 0. [S, B, H, D]."""
    S = len(steps)
    z = jax.random.normal(key, (S,) + shape, schedule.betas.dtype)
    t_eff = np.maximum(np.array(steps), 0)
    std = np.asarray(schedule.posterior_std)[t_eff]  # [S]
    # steps are static -> the schedule fn is evaluated host-side per step
    temps = np.array([float(_noise_std_extra(cfg, int(t))) for t in t_eff])
    mult = (np.array(steps) > 0).astype(np.float32) * temps
    scale = jnp.asarray(std * mult, schedule.betas.dtype)
    return z * scale[:, None, None, None]


def run_sampling(
    schedule: DiffusionSchedule,
    eps_fn: EpsFn,
    key: jax.Array,
    shape: Tuple[int, int, int],
    hard_conds: HardConds,
    cfg: SamplerConfig,
    guide_fn: Optional[GuideFn] = None,
    return_chain: bool = False,
    noises: Optional[jnp.ndarray] = None,
):
    """Full reverse chain (ref diffusion_model_base.py:157-182, 285-316).

    Returns final x [B,H,D], or (final, chain [S+1,B,H,D]) with the initial
    noise draw first, matching the reference's returned chain layout.
    `noises` optionally fixes the per-step additive noise [S, B, H, D]
    (already scaled by posterior std and temperature) for deterministic
    replay/equivalence testing.
    """
    T = schedule.n_steps
    steps = list(reversed(range(-cfg.n_extra_steps, T)))  # e.g. 24..0,-1..-5
    t_start = cfg.t_start_guide if guide_fn is not None else -10**9
    n_unguided = sum(1 for i in steps if i >= t_start)

    key, init_key, noise_key = jax.random.split(key, 3)
    if noises is None:
        noises = _chain_noises(schedule, noise_key, steps, shape, cfg)
    x = jax.random.normal(init_key, shape, schedule.betas.dtype)
    x = apply_hard_conditioning(x, hard_conds)
    chain0 = x

    def make_body(guided):
        def body(x_c, xs):
            i, noise = xs
            b = x_c.shape[0]
            t = jnp.full((b,), jnp.maximum(i, 0), dtype=jnp.int32)
            model_mean, log_var = p_mean_variance(
                schedule, eps_fn, x_c, t,
                clip_denoised=cfg.clip_denoised,
                predict_epsilon=cfg.predict_epsilon,
            )
            x_n = model_mean
            if guided and guide_fn is not None:
                model_var = jnp.exp(log_var) if cfg.scale_grad_by_std else None
                x_n = guide_gradient_steps(
                    x_n, hard_conds, guide_fn,
                    n_guide_steps=cfg.n_guide_steps, model_var=model_var,
                )
            x_n = x_n + noise
            x_n = apply_hard_conditioning(x_n, hard_conds)
            return x_n, (x_n if return_chain else None)

        return body

    x_final = x
    chains = []
    for sl, noise_sl, guided in (
        (steps[:n_unguided], noises[:n_unguided], False),
        (steps[n_unguided:], noises[n_unguided:], True),
    ):
        if not sl:
            continue
        i_arr = jnp.asarray(np.array(sl, dtype=np.int32))
        x_final, ys = jax.lax.scan(make_body(guided), x_final, (i_arr, noise_sl))
        if return_chain:
            chains.append(ys)

    if return_chain:
        chain = jnp.concatenate([chain0[None]] + chains, axis=0)
        return x_final, chain
    return x_final


def run_ddim_sampling(
    schedule: DiffusionSchedule,
    eps_fn: EpsFn,
    key: jax.Array,
    shape: Tuple[int, int, int],
    hard_conds: HardConds,
    cfg: SamplerConfig,
    guide_fn: Optional[GuideFn] = None,
    sampling_timesteps: Optional[int] = None,
    eta: float = 0.0,
    return_chain: bool = False,
    extra_refine_steps: int = 0,
    times: Optional[Sequence[int]] = None,
    refine_noise_std: float = 0.0,
    refine_anneal_t: int = 0,
):
    """DDIM sampling (ref diffusion_model_base.py:184-259).

    Timestep subsequence: linspace(0, T-1, T//5 + 1) ints with -1 prepended,
    walked in reversed consecutive pairs; eta=0 makes steps deterministic
    except the initial draw. The final (0, -1) pair returns x0_hat directly.
    Guide steps run when t_next < t_start_guide, before noise injection.
    x0_hat is NOT clamped here (matching the reference's DDIM path, which
    skips the clamp used in p_mean_variance).

    `extra_refine_steps` (default 0 = reference-faithful) appends that many
    noiseless denoise+guide refinement steps at t=0 — the DDIM analogue of
    the DDPM chain's `n_extra_steps` (which the reference's ddim_sample
    ignores). The reference's DDIM applies the guide on only ~2 of the 6
    subsequence steps and returns the final x0_hat unguided, which measures
    far weaker collision avoidance than DDPM (see RESULTS.md); these steps
    close that gap while keeping the ~5x shorter eps-model chain.
    """
    T = schedule.n_steps
    if times is None:
        n_sub = sampling_timesteps if sampling_timesteps is not None else max(T // 5, 1)
        times = np.linspace(0, T - 1, n_sub + 1).astype(np.int64).tolist()
    else:
        times = sorted({int(t) for t in times} | {0, T - 1})
    times = [-1] + list(times)
    times = list(reversed(times))
    time_pairs = list(zip(times[:-1], times[1:]))

    key, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape, schedule.betas.dtype)
    x = apply_hard_conditioning(x, hard_conds)
    chain = [x]

    b = shape[0]
    t_start = cfg.t_start_guide if guide_fn is not None else -(10**9)

    for t_now, t_next in time_pairs:
        t = jnp.full((b,), t_now, dtype=jnp.int32)
        model_out = eps_fn(x, t)
        x_start = predict_start_from_noise(
            schedule, x, t, model_out, cfg.predict_epsilon
        )
        if cfg.clip_denoised:
            # Deviation from the reference's ddim_sample, which never clamps
            # x0_hat (diffusion_model_base.py:184-259). On the production
            # exponential schedule alphas_cumprod[T-1] ~ 5e-10, so the
            # unclamped 1/sqrt(acp) in predict_start_from_noise blows the
            # first DDIM step up to |x| ~ 1e2 and the whole chain rides a
            # divergent state (guided == unguided == garbage; measured
            # fraction_free 0.04 vs DDPM 0.81 on EnvDense2D). The DDPM path
            # clamps x0_hat inside p_mean_variance for exactly this reason;
            # doing the same here is what makes DDIM usable on this
            # schedule. SamplerConfig(clip_denoised=False) restores the
            # literal reference behavior.
            x_start = jnp.clip(x_start, -1.0, 1.0)
        pred_noise = predict_noise_from_start(
            schedule, x, t, model_out, cfg.predict_epsilon
        )

        if t_next < 0:
            x = apply_hard_conditioning(x_start, hard_conds)
            chain.append(x)
            break

        # t_now/t_next are static ints; the gathered coefficients stay traced
        # scalars (schedule tables are jit constants/tracers in jax>=0.9)
        alpha = schedule.alphas_cumprod[t_now]
        alpha_next = schedule.alphas_cumprod[t_next]
        sigma = eta * jnp.sqrt(
            jnp.maximum((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha), 0.0)
        )
        c = jnp.sqrt(jnp.maximum(1 - alpha_next - sigma**2, 0.0))
        x = x_start * jnp.sqrt(alpha_next) + c * pred_noise

        if guide_fn is not None and t_next < t_start:
            x = guide_gradient_steps(
                x, hard_conds, guide_fn, n_guide_steps=cfg.n_guide_steps
            )

        if eta > 0.0:  # static: eta is a Python float
            key, sub = jax.random.split(key)
            x = x + sigma * jax.random.normal(sub, x.shape, x.dtype)
        x = apply_hard_conditioning(x, hard_conds)
        chain.append(x)

    if extra_refine_steps > 0:
        S = extra_refine_steps
        if refine_anneal_t > 0:
            # Annealed re-noise tail: refine step j re-noises the current
            # x0 estimate to timestep t_j (linear anneal refine_anneal_t
            # -> 0) via the forward kernel x_t = sqrt(acp_t) x0 +
            # sqrt(1-acp_t) eps, then denoises AT t_j and applies the
            # guide. Rationale: the constant-noise knob below perturbs at
            # posterior_std[1] ~ 8e-3, which is negligible against [-1,1]
            # trajectories (measured quality-neutral); re-noising to t=4-6
            # perturbs at sqrt(1-acp_t) ~ 0.04-0.05 with a denoise step
            # that is *matched* to that noise level, so the tail explores
            # basins the way the DDPM chain's guided window does. The last
            # step has t=0 (noiseless, acp_0 ~ 1-1e-4) so the chain still
            # converges deterministically.
            t_js = [
                int(round(refine_anneal_t * (1.0 - j / max(S - 1, 1))))
                for j in range(S)
            ]
        else:
            t_js = [0] * S
        # exploration noise for the refinement tail (legacy constant form):
        # posterior_std[1] is the smallest non-degenerate noise level of the
        # schedule (std[0] is clipped to ~1e-10), matching the last noisy
        # DDPM step's scale.
        sigma0 = refine_noise_std * schedule.posterior_std[1]

        def refine(carry, xs):
            t_j, not_last = xs
            x, k = carry
            tb = jnp.full((b,), t_j, dtype=jnp.int32)
            if refine_anneal_t > 0:
                k, sub = jax.random.split(k)
                acp = schedule.alphas_cumprod[t_j]
                x = jnp.sqrt(acp) * x + jnp.sqrt(
                    jnp.maximum(1.0 - acp, 0.0)
                ) * jnp.where(
                    t_j > 0, 1.0, 0.0
                ) * jax.random.normal(sub, x.shape, x.dtype)
                x = apply_hard_conditioning(x, hard_conds)
            model_out = eps_fn(x, tb)
            x_start = predict_start_from_noise(
                schedule, x, tb, model_out, cfg.predict_epsilon
            )
            if cfg.clip_denoised:
                x_start = jnp.clip(x_start, -1.0, 1.0)
            if guide_fn is not None:
                x_start = guide_gradient_steps(
                    x_start, hard_conds, guide_fn, n_guide_steps=cfg.n_guide_steps
                )
            if refine_noise_std > 0.0:  # static python float
                # exploration only BETWEEN refine steps: the final step
                # returns the guided denoised estimate with no noise on top
                # (nothing would denoise it), mirroring the DDPM chain's
                # t==0 noise zeroing
                k, sub = jax.random.split(k)
                x_start = x_start + not_last * sigma0 * jax.random.normal(
                    sub, x_start.shape, x_start.dtype
                )
            x_start = apply_hard_conditioning(x_start, hard_conds)
            return (x_start, k), (x_start if return_chain else None)

        not_last = jnp.arange(S) < S - 1
        (x, _), ys = jax.lax.scan(
            refine, (x, key),
            (jnp.asarray(t_js, dtype=jnp.int32),
             not_last.astype(schedule.betas.dtype)),
        )
        if return_chain:
            chain.extend(list(ys))

    if return_chain:
        return x, jnp.stack(chain, axis=0)
    return x
