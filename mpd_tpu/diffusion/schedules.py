"""Variance (beta) schedules and precomputed DDPM coefficient tables.

Schedule math matches the reference framework's definitions
(reference: mpd/models/diffusion_models/helpers.py:13-62 and
mpd/models/diffusion_models/diffusion_model_base.py:67-103) but is computed
here once in float64 NumPy on the host and stored as a float32 pytree — the
tables are tiny (T=25 scalars per entry), live in SMEM-friendly constant
space, and are gathered per-timestep inside the jitted sampling scan.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


def linear_betas(n_steps: int, beta_start: float = 1e-4, beta_end: float = 2e-2) -> np.ndarray:
    return np.linspace(beta_start, beta_end, n_steps, dtype=np.float64)


def quadratic_betas(n_steps: int, beta_start: float = 1e-4, beta_end: float = 2e-2) -> np.ndarray:
    return np.linspace(beta_start**0.5, beta_end**0.5, n_steps, dtype=np.float64) ** 2


def sigmoid_betas(n_steps: int, beta_start: float = 1e-4, beta_end: float = 2e-2) -> np.ndarray:
    x = np.linspace(-6.0, 6.0, n_steps, dtype=np.float64)
    return 1.0 / (1.0 + np.exp(-x)) * (beta_end - beta_start) + beta_start


def cosine_betas(n_steps: int, s: float = 0.008, a_min: float = 0.0, a_max: float = 0.999) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule (ref helpers.py:26-37)."""
    steps = n_steps + 1
    x = np.linspace(0, steps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, a_min, a_max)


def exponential_betas(n_steps: int, beta_start: float = 1e-4, beta_end: float = 1.0) -> np.ndarray:
    """Exponentially increasing noise, beta_start -> beta_end inclusive.

    beta_t = beta_start * exp(a * x_t) with a = ln(beta_end/beta_start)/T and
    x = linspace(0, T, T) (T points, endpoints 0 and T inclusive), matching the
    reference's definition exactly (ref helpers.py:40-46). With beta_end=1.0
    the final step is fully destructive (alpha_bar_T ~ 0).
    """
    x = np.linspace(0, n_steps, n_steps, dtype=np.float64)
    a = np.log(beta_end / beta_start) / n_steps
    return beta_start * np.exp(a * x)


def variance_preserving_betas(n_steps: int, beta_start: float = 1e-4, beta_end: float = 1.0) -> np.ndarray:
    x = np.linspace(0, n_steps, n_steps, dtype=np.float64)
    alphas = np.exp(
        -beta_start * (1.0 / n_steps)
        - 0.5 * (beta_end - beta_start) * (2 * x - 1) / (n_steps**2)
    )
    return 1.0 - alphas


_SCHEDULES = {
    "linear": linear_betas,
    "quadratic": quadratic_betas,
    "sigmoid": sigmoid_betas,
    "cosine": cosine_betas,
    "exponential": exponential_betas,
    "variance_preserving": variance_preserving_betas,
}


class DiffusionSchedule(NamedTuple):
    """Precomputed DDPM coefficient tables, each of shape [T].

    Mirrors the coefficient set the reference registers as buffers
    (ref diffusion_model_base.py:81-103); computed in float64, stored float32.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_std: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    @property
    def n_steps(self) -> int:
        return self.betas.shape[0]


def make_schedule(
    variance_schedule: str = "exponential",
    n_steps: int = 25,
    dtype=jnp.float32,
    **schedule_kwargs,
) -> DiffusionSchedule:
    if variance_schedule not in _SCHEDULES:
        raise ValueError(
            f"unknown variance schedule {variance_schedule!r}; "
            f"available: {sorted(_SCHEDULES)}"
        )
    betas = _SCHEDULES[variance_schedule](n_steps, **schedule_kwargs)
    # Guard against beta == 1 up to roundoff (the exponential schedule's last
    # step lands at 1.0 +/- eps): keep alpha_bar strictly positive so the
    # sqrt/recip tables stay finite. The final step remains fully destructive
    # (alpha_bar_T ~ 1e-8), matching the reference's effective behavior.
    betas = np.clip(betas, 0.0, 1.0 - 1e-7)
    return _tables_from_betas(betas, dtype)


def respaced_schedule(
    variance_schedule: str = "exponential",
    n_steps: int = 25,
    times=(),
    dtype=jnp.float32,
    **schedule_kwargs,
):
    """Respaced (strided) DDPM schedule over a timestep subsequence.

    Nichol & Dhariwal's respacing construction (improved-diffusion): pick a
    subsequence t_0 < ... < t_{S-1} of the base schedule's timesteps and
    define a NEW S-step DDPM whose marginals match the base chain at those
    times — new_beta_j = 1 - acp[t_j] / acp[t_{j-1}] so the respaced
    alphas_cumprod telescopes to exactly acp[times]. Running the standard
    reverse-DDPM chain on the respaced tables (with the eps model queried at
    the ORIGINAL timesteps, see sampler.respace_eps_fn) is then a stochastic
    fast lane: the posterior noise that gives guided DDPM its candidate
    diversity is preserved, at the DDIM lane's eps-forward count. No
    reference counterpart (the reference's only fast path is deterministic
    DDIM, ref diffusion_model_base.py:184-259).

    Returns (schedule, times) with 0 and n_steps-1 forced into `times`.
    """
    if variance_schedule not in _SCHEDULES:
        raise ValueError(
            f"unknown variance schedule {variance_schedule!r}; "
            f"available: {sorted(_SCHEDULES)}"
        )
    betas_full = np.clip(
        _SCHEDULES[variance_schedule](n_steps, **schedule_kwargs),
        0.0, 1.0 - 1e-7,
    )
    return _respace_betas(betas_full, times, dtype)


def respace_schedule_tables(
    schedule: "DiffusionSchedule", times, dtype=jnp.float32
):
    """Respaced tables from an existing schedule's beta table.

    Same construction as `respaced_schedule` but starting from a built
    DiffusionSchedule (whose float32 betas carry full relative precision;
    the cumprod is redone in float64). Returns (schedule, times)."""
    return _respace_betas(
        np.asarray(schedule.betas, np.float64), times, dtype
    )


def _respace_betas(betas_full: np.ndarray, times, dtype):
    n_steps = len(betas_full)
    times = sorted({int(t) for t in times} | {0, n_steps - 1})
    if times[0] < 0 or times[-1] > n_steps - 1:
        raise ValueError(f"times {times} outside [0, {n_steps - 1}]")
    acp = np.cumprod(1.0 - betas_full)
    acp_sub = acp[np.asarray(times)]
    acp_prev = np.concatenate([[1.0], acp_sub[:-1]])
    betas_sub = 1.0 - acp_sub / acp_prev
    return _tables_from_betas(betas_sub, dtype), tuple(times)


def _tables_from_betas(betas: np.ndarray, dtype) -> DiffusionSchedule:
    """Derive the full 13-entry coefficient table from float64 betas."""
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_variance_clipped = np.log(np.maximum(posterior_variance, 1e-20))

    arr = lambda x: jnp.asarray(x, dtype=dtype)
    return DiffusionSchedule(
        betas=arr(betas),
        alphas_cumprod=arr(alphas_cumprod),
        alphas_cumprod_prev=arr(alphas_cumprod_prev),
        sqrt_alphas_cumprod=arr(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=arr(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=arr(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=arr(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=arr(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=arr(posterior_variance),
        posterior_log_variance_clipped=arr(posterior_log_variance_clipped),
        posterior_std=arr(np.exp(0.5 * posterior_log_variance_clipped)),
        posterior_mean_coef1=arr(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=arr((1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
    )
