"""Tests for the Gaussian-diffusion core and guided sampler semantics,
including a float64 NumPy re-derivation of the DDPM posterior step
(golden-numerics strategy, SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpd_tpu.diffusion import (
    make_schedule,
    q_sample,
    p_mean_variance,
    apply_hard_conditioning,
    run_sampling,
    SamplerConfig,
)


@pytest.fixture(scope="module")
def sched():
    return make_schedule("exponential", 25)


def test_q_sample_matches_closed_form(sched):
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (4, 8, 2))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([0, 5, 12, 24])
    xt = q_sample(sched, x0, t, noise)
    ac = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    for b, tb in enumerate([0, 5, 12, 24]):
        expected = np.sqrt(ac[tb]) * np.asarray(x0[b]) + np.sqrt(1 - ac[tb]) * np.asarray(noise[b])
        np.testing.assert_allclose(np.asarray(xt[b]), expected, rtol=2e-5, atol=1e-6)


def test_p_mean_variance_matches_numpy_rederivation(sched):
    """Posterior mean must equal the float64 closed form:
    x0_hat = sqrt(1/ac_t) x_t - sqrt(1/ac_t - 1) eps; clip to [-1,1];
    mean = c1(t) x0_hat + c2(t) x_t."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 8, 2).astype(np.float32))
    eps = jnp.asarray(rng.randn(3, 8, 2).astype(np.float32))
    t_val = 7
    t = jnp.full((3,), t_val, dtype=jnp.int32)

    mean, log_var = p_mean_variance(sched, lambda xx, tt: eps, x, t)

    betas = np.cumprod(1 - np.asarray(sched.betas, dtype=np.float64))
    ac = betas
    ac_prev = np.concatenate([[1.0], ac[:-1]])
    x64, e64 = np.asarray(x, np.float64), np.asarray(eps, np.float64)
    x0_hat = np.sqrt(1 / ac[t_val]) * x64 - np.sqrt(1 / ac[t_val] - 1) * e64
    x0_hat = np.clip(x0_hat, -1, 1)
    b = np.asarray(sched.betas, dtype=np.float64)
    c1 = b[t_val] * np.sqrt(ac_prev[t_val]) / (1 - ac[t_val])
    c2 = (1 - ac_prev[t_val]) * np.sqrt(1 - b[t_val]) / (1 - ac[t_val])
    expected_mean = c1 * x0_hat + c2 * x64
    np.testing.assert_allclose(np.asarray(mean), expected_mean, rtol=1e-3, atol=2e-5)

    post_var = b * (1 - ac_prev) / (1 - ac)
    expected_logvar = np.log(np.maximum(post_var[t_val], 1e-20))
    np.testing.assert_allclose(np.asarray(log_var).ravel()[0], expected_logvar, rtol=1e-4)


def test_hard_conditioning_pins_and_survives_jit():
    x = jnp.zeros((5, 16, 4))
    conds = {0: jnp.ones(4), 15: jnp.full((5, 4), 2.0)}
    fn = jax.jit(lambda xx: apply_hard_conditioning(xx, conds))
    out = fn(x)
    np.testing.assert_allclose(out[:, 0, :], 1.0)
    np.testing.assert_allclose(out[:, 15, :], 2.0)
    np.testing.assert_allclose(out[:, 1:15, :], 0.0)


def test_run_sampling_shapes_and_endpoint_pinning(sched):
    B, H, D = 6, 16, 4
    start = jnp.asarray([0.5, -0.5, 0.0, 0.0])
    goal = jnp.asarray([-0.5, 0.5, 0.0, 0.0])
    conds = {0: start, H - 1: goal}
    cfg = SamplerConfig(n_extra_steps=5, t_start_guide=7)
    eps_fn = lambda x, t: jnp.zeros_like(x)

    x, chain = run_sampling(
        sched, eps_fn, jax.random.PRNGKey(0), (B, H, D), conds, cfg,
        guide_fn=None, return_chain=True,
    )
    assert x.shape == (B, H, D)
    assert chain.shape == (25 + 5 + 1, B, H, D)
    np.testing.assert_allclose(np.asarray(x[:, 0]), np.broadcast_to(start, (B, D)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(x[:, -1]), np.broadcast_to(goal, (B, D)), atol=1e-6)
    # all chain entries pinned too
    np.testing.assert_allclose(
        np.asarray(chain[:, :, 0, :]), np.broadcast_to(start, chain[:, :, 0, :].shape), atol=1e-6
    )


def test_extra_steps_are_deterministic(sched):
    """Steps with i <= 0 inject no noise: two runs differing only in the
    sampling key after the last noisy step... simpler check: with eps_fn=0
    the final n_extra+1 steps are pure posterior contractions, so repeated
    runs from the same key agree and the guided phase adds guide updates
    deterministically."""
    B, H, D = 2, 8, 2
    conds = {0: jnp.zeros(D), H - 1: jnp.zeros(D)}
    cfg = SamplerConfig(n_extra_steps=3, t_start_guide=-(10**9))
    eps_fn = lambda x, t: jnp.zeros_like(x)
    x1 = run_sampling(sched, eps_fn, jax.random.PRNGKey(7), (B, H, D), conds, cfg)
    x2 = run_sampling(sched, eps_fn, jax.random.PRNGKey(7), (B, H, D), conds, cfg)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=0)


def test_guided_sampling_moves_toward_lower_cost(sched):
    """A quadratic guide pulling x to +0.3 must shift interior waypoints."""
    B, H, D = 4, 16, 2
    conds = {0: jnp.zeros(D), H - 1: jnp.zeros(D)}
    target = 0.3

    def guide_fn(x):
        return -0.1 * (x - target)  # -grad of 0.05*(x-target)^2

    cfg = SamplerConfig(n_guide_steps=5, t_start_guide=7, n_extra_steps=5)
    eps_fn = lambda x, t: jnp.zeros_like(x)
    x_guided = run_sampling(
        sched, eps_fn, jax.random.PRNGKey(0), (B, H, D), conds, cfg, guide_fn=guide_fn
    )
    x_plain = run_sampling(
        sched, eps_fn, jax.random.PRNGKey(0), (B, H, D), conds, cfg, guide_fn=None
    )
    mid_guided = float(jnp.mean(x_guided[:, 1:-1]))
    mid_plain = float(jnp.mean(x_plain[:, 1:-1]))
    assert mid_guided > mid_plain + 0.05
    # endpoints still pinned
    np.testing.assert_allclose(np.asarray(x_guided[:, 0]), 0.0, atol=1e-6)


def test_noise_std_extra_schedule_fn_matches_constant():
    """noise_std_extra accepts a schedule fn of t (ref
    noise_std_extra_schedule_fn, sample_functions.py:56-59; inference.py:243
    passes `lambda t: 0.5`) — a constant fn must reproduce the float path
    bit-for-bit, and a t-dependent fn must change the injected noise."""
    import jax

    from mpd_tpu.diffusion import SamplerConfig, make_schedule, run_sampling

    sched = make_schedule("exponential", 10)
    B, H, D = 3, 8, 2
    conds = {0: jnp.zeros((B, D)), H - 1: jnp.ones((B, D)) * 0.5}
    eps_fn = lambda x, t: 0.1 * x

    def run(nse):
        return run_sampling(
            sched, eps_fn, jax.random.PRNGKey(0), (B, H, D), conds,
            SamplerConfig(t_start_guide=-(10**9), n_extra_steps=2, noise_std_extra=nse),
        )

    x_const = run(0.5)
    x_fn = run(lambda t: 0.5)
    np.testing.assert_array_equal(np.asarray(x_const), np.asarray(x_fn))

    x_decay = run(lambda t: 0.5 * t / sched.n_steps)
    assert not np.allclose(np.asarray(x_const), np.asarray(x_decay))


def test_respaced_schedule_marginals_match_base():
    """Respacing must preserve the base chain's marginals: the respaced
    alphas_cumprod telescopes to exactly acp[times], and respacing over ALL
    timesteps reproduces the base tables."""
    from mpd_tpu.diffusion import respaced_schedule

    base = make_schedule("exponential", 25)
    times = (0, 3, 6, 8, 11, 14, 17, 19, 22, 24)
    sub, times_out = respaced_schedule("exponential", 25, times=times)
    assert times_out == times
    assert sub.n_steps == len(times)
    np.testing.assert_allclose(
        np.asarray(sub.alphas_cumprod),
        np.asarray(base.alphas_cumprod)[list(times)],
        rtol=1e-6,
    )
    full, _ = respaced_schedule("exponential", 25, times=range(25))
    for name in base._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(full, name)), np.asarray(getattr(base, name)),
            rtol=2e-5, atol=1e-7, err_msg=name,
        )


def test_respace_schedule_tables_from_built_schedule():
    """The DiffusionSchedule-based entry point (used by MotionPlanner) must
    agree with the name-based one. The final (fully destructive) timestep is
    compared loosely: the built schedule's float32 beta[T-1] = 1 - 1e-7
    round-trips 1-beta with ~20% error, which only perturbs the
    acp[T-1] ~ 1e-8 tail entries — behaviorally irrelevant (x0_hat is
    clamped and the step destroys all signal either way)."""
    from mpd_tpu.diffusion import respace_schedule_tables, respaced_schedule

    base = make_schedule("exponential", 25)
    times = (0, 5, 12, 24)
    a, _ = respaced_schedule("exponential", 25, times=times)
    b, _ = respace_schedule_tables(base, times)
    for name in base._fields:
        va, vb = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        np.testing.assert_allclose(
            va[:-1], vb[:-1], rtol=2e-5, atol=1e-7, err_msg=name
        )
        np.testing.assert_allclose(
            va[-1], vb[-1], rtol=0.25, err_msg=f"{name}[-1]"
        )


def test_respace_eps_fn_maps_indices_to_original_timesteps():
    from mpd_tpu.diffusion import respace_eps_fn

    seen = []

    def eps_fn(x, t):
        seen.append(np.asarray(t))
        return jnp.zeros_like(x)

    wrapped = respace_eps_fn(eps_fn, (0, 3, 6, 24))
    x = jnp.zeros((2, 4, 2))
    wrapped(x, jnp.asarray([2, 2], jnp.int32))
    wrapped(x, jnp.asarray([0, 3], jnp.int32))
    np.testing.assert_array_equal(seen[0], [6, 6])
    np.testing.assert_array_equal(seen[1], [0, 24])


def test_respaced_sampling_full_times_matches_base(sched):
    """Respacing over all timesteps is the identity: same key, same chain."""
    from mpd_tpu.diffusion import respace_eps_fn, respaced_schedule

    B, H, D = 3, 8, 2
    conds = {0: jnp.zeros(D), H - 1: jnp.ones(D) * 0.25}
    cfg = SamplerConfig(n_extra_steps=3, t_start_guide=-(10**9))
    eps_fn = lambda x, t: 0.1 * x
    sub, times = respaced_schedule("exponential", 25, times=range(25))
    x_base = run_sampling(sched, eps_fn, jax.random.PRNGKey(3), (B, H, D), conds, cfg)
    x_resp = run_sampling(
        sub, respace_eps_fn(eps_fn, times), jax.random.PRNGKey(3), (B, H, D),
        conds, cfg,
    )
    np.testing.assert_allclose(np.asarray(x_base), np.asarray(x_resp), atol=1e-5)


def test_respaced_sampling_subsequence_pins_and_is_stochastic():
    """A strict subsequence chain still pins endpoints, and distinct keys
    give distinct samples (the lane's point: preserved posterior noise)."""
    from mpd_tpu.diffusion import respace_eps_fn, respaced_schedule

    B, H, D = 4, 8, 2
    start, goal = jnp.zeros(D), jnp.ones(D) * 0.5
    conds = {0: start, H - 1: goal}
    cfg = SamplerConfig(n_extra_steps=5, t_start_guide=3)
    eps_fn = lambda x, t: jnp.zeros_like(x)
    sub, times = respaced_schedule(
        "exponential", 25, times=(0, 3, 6, 8, 11, 14, 17, 19, 22, 24)
    )
    wrapped = respace_eps_fn(eps_fn, times)
    x1 = run_sampling(sub, wrapped, jax.random.PRNGKey(0), (B, H, D), conds, cfg)
    x2 = run_sampling(sub, wrapped, jax.random.PRNGKey(1), (B, H, D), conds, cfg)
    np.testing.assert_allclose(np.asarray(x1[:, 0]), np.broadcast_to(start, (B, D)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(x1[:, -1]), np.broadcast_to(goal, (B, D)), atol=1e-6)
    assert float(jnp.abs(x1 - x2).max()) > 1e-3
