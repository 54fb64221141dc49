"""Golden-numerics tests for beta schedules and DDPM coefficient tables.

The expected values are independently re-derived in float64 NumPy / torch
from the published schedule definitions (reference helpers.py:13-62,
diffusion_model_base.py:74-103) — the sampler must match them closely.
"""

import numpy as np
import pytest

from mpd_tpu.diffusion import (
    make_schedule,
    exponential_betas,
    cosine_betas,
    linear_betas,
)


def test_exponential_betas_endpoints():
    betas = exponential_betas(25)
    # beta_0 = 1e-4 exactly; beta_{T-1} = beta_start * exp(ln(be/bs)) = 1.0
    assert betas[0] == pytest.approx(1e-4, rel=1e-12)
    assert betas[-1] == pytest.approx(1.0, rel=1e-10)
    assert np.all(np.diff(betas) > 0)


def test_exponential_betas_match_torch_formula():
    torch = pytest.importorskip("torch")
    n = 25
    x = torch.linspace(0, n, n, dtype=torch.float64)
    a = 1 / n * torch.log(torch.tensor(1.0, dtype=torch.float64) / 1e-4)
    expected = (1e-4 * torch.exp(a * x)).numpy()
    np.testing.assert_allclose(exponential_betas(n), expected, rtol=1e-12)


def test_cosine_betas_match_formula():
    n = 25
    s = 0.008
    steps = n + 1
    x = np.linspace(0, steps, steps)
    ac = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    expected = np.clip(1 - ac[1:] / ac[:-1], 0, 0.999)
    np.testing.assert_allclose(cosine_betas(n), expected, rtol=1e-12)


def test_schedule_coefficient_identities():
    sched = make_schedule("exponential", 25)
    # recompute in float64 from the same clipped betas the schedule uses
    betas = np.clip(exponential_betas(25), 0.0, 1.0 - 1e-7)
    np.testing.assert_allclose(sched.betas, betas, rtol=1e-6)
    alphas_cumprod = np.cumprod(1 - betas)
    np.testing.assert_allclose(sched.alphas_cumprod, alphas_cumprod, rtol=1e-5)
    np.testing.assert_allclose(
        sched.sqrt_alphas_cumprod, np.sqrt(alphas_cumprod), rtol=1e-5
    )
    prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
    post_var = betas * (1 - prev) / (1 - alphas_cumprod)
    np.testing.assert_allclose(sched.posterior_variance, post_var, rtol=1e-4)
    # t=0 posterior collapses to x0: coef1=1, coef2=0
    assert sched.posterior_mean_coef1[0] == pytest.approx(1.0, rel=1e-5)
    assert sched.posterior_mean_coef2[0] == pytest.approx(0.0, abs=1e-7)
    # exponential with beta_end=1.0 is fully destructive at T
    assert sched.alphas_cumprod[-1] == pytest.approx(0.0, abs=1e-7)


def test_unknown_schedule_raises():
    with pytest.raises(ValueError):
        make_schedule("nope", 10)
