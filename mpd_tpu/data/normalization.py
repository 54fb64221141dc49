"""Per-dimension normalizers as tiny pytrees.

Counterparts of the reference's normalizer family
(reference: mpd/datasets/normalization.py:85-195). They are NamedTuples of
stat arrays, so they ride inside jitted functions (the guide unnormalizes
*inside* the sampling step) and checkpoint as plain arrays.

Fitting flattens [..., D] to [N, D] and computes per-dim stats, matching the
reference's flatten-then-fit behavior (normalization.py:58-78).
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp


class LimitsNormalizer(NamedTuple):
    """Maps [mins, maxs] -> [-1, 1] per dimension (ref normalization.py:144-167)."""

    mins: jnp.ndarray  # [D]
    maxs: jnp.ndarray  # [D]

    def normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        x = (x - self.mins) / (self.maxs - self.mins)
        return 2.0 * x - 1.0

    def unnormalize(self, x: jnp.ndarray) -> jnp.ndarray:
        # The reference clips out-of-range samples to [-1, 1] before mapping
        # back (normalization.py:156-167); we clip unconditionally — identical
        # result, branch-free.
        x = jnp.clip(x, -1.0, 1.0)
        x = (x + 1.0) / 2.0
        return x * (self.maxs - self.mins) + self.mins


class GaussianNormalizer(NamedTuple):
    """Zero-mean unit-variance per dimension (ref normalization.py:119-141)."""

    means: jnp.ndarray
    stds: jnp.ndarray

    def normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - self.means) / self.stds

    def unnormalize(self, x: jnp.ndarray) -> jnp.ndarray:
        return x * self.stds + self.means


class IdentityNormalizer(NamedTuple):
    dim: int = 0

    def normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        return x

    def unnormalize(self, x: jnp.ndarray) -> jnp.ndarray:
        return x


Normalizer = Union[LimitsNormalizer, GaussianNormalizer, IdentityNormalizer]


def _flat(data: jnp.ndarray) -> jnp.ndarray:
    return data.reshape(-1, data.shape[-1])


def fit_limits_normalizer(data: jnp.ndarray) -> LimitsNormalizer:
    flat = _flat(data)
    return LimitsNormalizer(mins=flat.min(axis=0), maxs=flat.max(axis=0))


def fit_safe_limits_normalizer(data: jnp.ndarray, eps: float = 1.0) -> LimitsNormalizer:
    """Widens the limits so the span never degenerates
    (ref SafeLimitsNormalizer, normalization.py:170-184).

    The reference's loop widens ALL dimensions by eps once per degenerate
    dimension (`self.mins -= eps` on the whole tensor inside the per-dim
    loop) — a quirk, preserved here: k degenerate dims -> every dim widened
    by k*eps."""
    flat = _flat(data)
    mins, maxs = flat.min(axis=0), flat.max(axis=0)
    k = jnp.sum(mins == maxs)
    return LimitsNormalizer(mins=mins - k * eps, maxs=maxs + k * eps)


def fit_fixed_limits_normalizer(
    data: jnp.ndarray, min: float = -1.0, max: float = 1.0
) -> LimitsNormalizer:
    """Limits fixed a priori, not derived from the data
    (ref FixedLimitsNormalizer, normalization.py:187-195)."""
    D = data.shape[-1]
    return LimitsNormalizer(
        mins=jnp.full((D,), min, jnp.float32), maxs=jnp.full((D,), max, jnp.float32)
    )


def fit_gaussian_normalizer(data: jnp.ndarray) -> GaussianNormalizer:
    flat = _flat(data)
    return GaussianNormalizer(means=flat.mean(axis=0), stds=flat.std(axis=0, ddof=1))


_FITTERS = {
    "LimitsNormalizer": fit_limits_normalizer,
    "SafeLimitsNormalizer": fit_safe_limits_normalizer,
    "FixedLimitsNormalizer": fit_fixed_limits_normalizer,
    "GaussianNormalizer": fit_gaussian_normalizer,
    "Identity": lambda data: IdentityNormalizer(),
}


def fit_normalizer(name: str, data: jnp.ndarray) -> Normalizer:
    """Registry lookup (replaces the reference's eval(name),
    normalization.py:17-18)."""
    if name not in _FITTERS:
        raise ValueError(f"unknown normalizer {name!r}; available: {sorted(_FITTERS)}")
    return _FITTERS[name](data)
