"""Pallas fused-U-Net parity tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpd_tpu.nets.temporal_unet import TemporalUnet


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run pallas kernels in interpreter mode on the CPU backend."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def test_fused_unet_matches_flax():
    from mpd_tpu.kernels import pallas_unet_apply

    B, H, D = 8, 32, 4
    mults = (1, 2)
    net = TemporalUnet(state_dim=D, n_support_points=H, unet_input_dim=16, dim_mults=mults)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, D))
    t = jnp.asarray(np.arange(B) % 25, jnp.int32)
    variables = net.init(jax.random.PRNGKey(1), x, t)

    ref = net.apply(variables, x, t)
    fused = pallas_unet_apply(variables, x, t, dim_mults=mults, block_b=4)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_fused_unet_matches_flax_full_size():
    from mpd_tpu.kernels import pallas_unet_apply

    B, H, D = 4, 64, 4
    mults = (1, 2, 4, 8)
    net = TemporalUnet(state_dim=D, n_support_points=H, unet_input_dim=32, dim_mults=mults)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, H, D))
    t = jnp.full((B,), 7, jnp.int32)
    variables = net.init(jax.random.PRNGKey(3), x, t)

    ref = net.apply(variables, x, t)
    fused = pallas_unet_apply(variables, x, t, dim_mults=mults, block_b=4)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-4, atol=5e-5)
