"""Picard-parallel sampler: exact equivalence with the sequential chain."""

import numpy as np
import jax
import jax.numpy as jnp

from mpd_tpu.diffusion import (
    SamplerConfig,
    make_schedule,
    run_sampling,
    run_sampling_parallel,
)
from mpd_tpu.diffusion.sampler import _chain_noises
from mpd_tpu.nets.temporal_unet import TemporalUnet


def test_parallel_sampler_exact_at_full_sweeps():
    H, D, B = 16, 4, 4
    net = TemporalUnet(state_dim=D, n_support_points=H, unet_input_dim=16, dim_mults=(1, 2))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, H, D)), jnp.zeros((2,), jnp.int32))
    eps_fn = lambda x, t: net.apply(params, x, t)
    sched = make_schedule("exponential", 25)
    conds = {0: jnp.zeros(D), H - 1: jnp.full((D,), 0.4)}
    cfg = SamplerConfig(n_extra_steps=3, t_start_guide=7, n_guide_steps=2)
    guide = lambda x: -0.05 * (x - 0.2)

    steps = list(reversed(range(-cfg.n_extra_steps, 25)))
    key = jax.random.PRNGKey(3)
    noises = _chain_noises(sched, jax.random.PRNGKey(9), steps, (B, H, D), cfg)

    x_seq = run_sampling(sched, eps_fn, key, (B, H, D), conds, cfg,
                         guide_fn=guide, noises=noises)
    x_par = run_sampling_parallel(sched, eps_fn, key, (B, H, D), conds, cfg,
                                  guide_fn=guide, noises=noises)
    np.testing.assert_allclose(np.asarray(x_seq), np.asarray(x_par), atol=5e-6)


def test_parallel_sampler_unguided_jits():
    H, D, B = 16, 2, 3
    sched = make_schedule("exponential", 25)
    conds = {0: jnp.zeros(D), H - 1: jnp.ones(D) * 0.1}
    cfg = SamplerConfig(n_extra_steps=2, t_start_guide=-(10**9))
    eps_fn = lambda x, t: jnp.zeros_like(x)
    out = jax.jit(
        lambda k: run_sampling_parallel(sched, eps_fn, k, (B, H, D), conds, cfg)
    )(jax.random.PRNGKey(0))
    assert out.shape == (B, H, D)
    assert np.isfinite(np.asarray(out)).all()
