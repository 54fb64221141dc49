"""Core Gaussian-diffusion math as pure JAX functions.

Functional equivalent of the reference's GaussianDiffusionModel
(reference: mpd/models/diffusion_models/diffusion_model_base.py:46-357), with
the model as an explicit `eps_fn(x, t) -> eps_hat` closure so the whole
forward/reverse process jits and shards freely. Trajectories are
`[batch, horizon, state_dim]` with static horizon.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mpd_tpu.diffusion.schedules import DiffusionSchedule

# Hard conditioning: map from (static) waypoint index -> state value [B, D] or
# [D]. Dict int keys are pytree structure, so this is jit-stable.
HardConds = Dict[int, jnp.ndarray]


def apply_hard_conditioning(x: jnp.ndarray, conds: HardConds) -> jnp.ndarray:
    """Pin waypoints to fixed states (ref sample_functions.py:5-8).

    x: [..., H, D]; conds values broadcast against [..., D].

    Implemented as a one-hot mask select rather than a scatter: elementwise
    ops fuse into the surrounding kernels and propagate batch shardings
    (TPU scatters are slow and `.at[].set` needs explicit out-shardings
    under a mesh).
    """
    H = x.shape[-2]
    for t_idx, val in conds.items():
        onehot = jnp.asarray(np.arange(H) == t_idx, x.dtype)[:, None]  # [H, 1]
        val_b = jnp.broadcast_to(val[..., None, :], x.shape[:-2] + (1, x.shape[-1]))
        x = x * (1.0 - onehot) + val_b * onehot
    return x


def _gather(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """table[t] reshaped to broadcast over a rank-`ndim` batch tensor.

    Equivalent of the reference's `extract` (ref sample_functions.py:11-14).
    `t` is [B] int32.
    """
    out = table[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


def q_sample(
    schedule: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Forward process q(x_t | x_0) (ref diffusion_model_base.py:320-329)."""
    nd = x_start.ndim
    return (
        _gather(schedule.sqrt_alphas_cumprod, t, nd) * x_start
        + _gather(schedule.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def predict_start_from_noise(
    schedule: DiffusionSchedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    predict_epsilon: bool = True,
) -> jnp.ndarray:
    """x0_hat from the model output (ref diffusion_model_base.py:121-132)."""
    if not predict_epsilon:
        return noise
    nd = x_t.ndim
    return (
        _gather(schedule.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - _gather(schedule.sqrt_recipm1_alphas_cumprod, t, nd) * noise
    )


def predict_noise_from_start(
    schedule: DiffusionSchedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    x0: jnp.ndarray,
    predict_epsilon: bool = True,
) -> jnp.ndarray:
    """eps from x0_hat (ref diffusion_model_base.py:109-119).

    NOTE: mirrors the reference's branch semantics exactly — when the model
    predicts epsilon the model output *is* the noise and is returned as-is.
    """
    if predict_epsilon:
        return x0
    nd = x_t.ndim
    return (
        _gather(schedule.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0
    ) / _gather(schedule.sqrt_recipm1_alphas_cumprod, t, nd)


def q_posterior_mean(
    schedule: DiffusionSchedule, x_start: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Mean of q(x_{t-1} | x_t, x_0) (ref diffusion_model_base.py:134-141)."""
    nd = x_t.ndim
    return (
        _gather(schedule.posterior_mean_coef1, t, nd) * x_start
        + _gather(schedule.posterior_mean_coef2, t, nd) * x_t
    )


def p_mean_variance(
    schedule: DiffusionSchedule,
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    t: jnp.ndarray,
    clip_denoised: bool = True,
    predict_epsilon: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reverse-step mean + log-variance (ref diffusion_model_base.py:143-155).

    Returns (model_mean [B,H,D], posterior_log_variance [B,1,1]).
    """
    eps_hat = eps_fn(x, t)
    x_recon = predict_start_from_noise(schedule, x, t, eps_hat, predict_epsilon)
    if clip_denoised:
        x_recon = jnp.clip(x_recon, -1.0, 1.0)
    model_mean = q_posterior_mean(schedule, x_recon, x, t)
    log_var = _gather(schedule.posterior_log_variance_clipped, t, x.ndim)
    return model_mean, log_var


def diffusion_loss(
    schedule: DiffusionSchedule,
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    key: jax.Array,
    x_start: jnp.ndarray,
    hard_conds: HardConds,
    predict_epsilon: bool = True,
    loss_type: str = "l2",
) -> jnp.ndarray:
    """Training objective (ref diffusion_model_base.py:331-357).

    t ~ U{0..T-1} per sample; x_t gets hard-conditioned, the model output is
    hard-conditioned too, and the loss is a plain mean over all elements
    (including the pinned endpoints, as in the reference).
    """
    b = x_start.shape[0]
    key_t, key_noise = jax.random.split(key)
    t = jax.random.randint(key_t, (b,), 0, schedule.n_steps)
    noise = jax.random.normal(key_noise, x_start.shape, x_start.dtype)

    x_noisy = q_sample(schedule, x_start, t, noise)
    x_noisy = apply_hard_conditioning(x_noisy, hard_conds)

    x_recon = eps_fn(x_noisy, t)
    x_recon = apply_hard_conditioning(x_recon, hard_conds)

    target = noise if predict_epsilon else x_start
    if loss_type == "l2":
        return jnp.mean((x_recon - target) ** 2)
    elif loss_type == "l1":
        return jnp.mean(jnp.abs(x_recon - target))
    raise ValueError(f"unknown loss_type {loss_type!r}")
