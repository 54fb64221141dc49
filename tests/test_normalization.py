"""Normalizer-family tests (ref mpd/datasets/normalization.py:85-195)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpd_tpu.data.normalization import (
    fit_fixed_limits_normalizer,
    fit_normalizer,
    fit_safe_limits_normalizer,
)


def test_fixed_limits_ignores_data_stats():
    """FixedLimitsNormalizer (ref normalization.py:187-195): limits are a
    priori, not fitted."""
    data = np.random.RandomState(0).uniform(-7, 3, (10, 8, 3)).astype(np.float32)
    n = fit_fixed_limits_normalizer(jnp.asarray(data))
    np.testing.assert_array_equal(np.asarray(n.mins), [-1, -1, -1])
    np.testing.assert_array_equal(np.asarray(n.maxs), [1, 1, 1])
    # registry path
    n2 = fit_normalizer("FixedLimitsNormalizer", jnp.asarray(data))
    np.testing.assert_array_equal(np.asarray(n2.mins), np.asarray(n.mins))
    # in-range values round-trip exactly
    x = jnp.asarray([[0.3, -0.7, 0.0]])
    np.testing.assert_allclose(np.asarray(n.unnormalize(n.normalize(x))), np.asarray(x), atol=1e-6)


def test_safe_limits_widens_all_dims_per_degenerate_dim():
    """The reference's SafeLimitsNormalizer loop widens ALL dims by eps once
    per degenerate dim (normalization.py:175-184's whole-tensor -=/+= inside
    the per-dim loop) — quirk preserved."""
    data = jnp.asarray([
        [0.0, 5.0, 1.0, 2.0],
        [0.0, 5.0, 3.0, 4.0],
    ])
    n = fit_safe_limits_normalizer(data, eps=1.0)
    # 2 degenerate dims (0 and 1) -> every dim widened by 2*eps
    np.testing.assert_allclose(np.asarray(n.mins), [-2.0, 3.0, -1.0, 0.0])
    np.testing.assert_allclose(np.asarray(n.maxs), [2.0, 7.0, 5.0, 6.0])


def test_safe_limits_no_degenerate_is_plain_limits():
    data = jnp.asarray([[0.0, 1.0], [2.0, 3.0]])
    n = fit_safe_limits_normalizer(data)
    np.testing.assert_allclose(np.asarray(n.mins), [0.0, 1.0])
    np.testing.assert_allclose(np.asarray(n.maxs), [2.0, 3.0])


def test_unknown_normalizer_raises():
    with pytest.raises(ValueError, match="unknown normalizer"):
        fit_normalizer("NopeNormalizer", jnp.zeros((2, 2)))
