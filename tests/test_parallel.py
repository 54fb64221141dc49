"""Sharding tests on the virtual 8-device CPU mesh: data-parallel training
and candidate-batch-sharded sampling must agree with single-device runs
(SURVEY.md section 4 item 4, section 5.2 determinism-across-shardings)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mpd_tpu.diffusion import SamplerConfig, make_schedule, run_sampling
from mpd_tpu.nets.temporal_unet import TemporalUnet
from mpd_tpu.parallel import make_mesh, replicate, shard_batch


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    H, D = 16, 4
    net = TemporalUnet(state_dim=D, n_support_points=H, unet_input_dim=16, dim_mults=(1, 2))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, H, D)), jnp.zeros((2,), jnp.int32))
    sched = make_schedule("exponential", 25)
    return net, params, sched, H, D


def test_sharded_sampling_matches_single_device(setup):
    net, params, sched, H, D = setup
    B = 16
    eps_fn = lambda x, t: net.apply(params, x, t)
    conds_host = {
        0: jnp.tile(jnp.asarray([0.5, 0.5, 0.0, 0.0]), (B, 1)),
        H - 1: jnp.tile(jnp.asarray([-0.5, -0.5, 0.0, 0.0]), (B, 1)),
    }
    cfg = SamplerConfig(n_extra_steps=3, t_start_guide=-(10**9))

    def query(key, conds):
        return run_sampling(sched, eps_fn, key, (B, H, D), conds, cfg)

    x_single = jax.jit(query)(jax.random.PRNGKey(0), conds_host)

    mesh = make_mesh(8)
    conds_sharded = shard_batch(mesh, conds_host)
    x_sharded = jax.jit(query)(jax.random.PRNGKey(0), conds_sharded)

    # tiny fusion/reduction-order differences across shardings are expected
    np.testing.assert_allclose(
        np.asarray(x_single), np.asarray(x_sharded), rtol=2e-3, atol=1e-4
    )


def test_dp_train_step_matches_single_device(setup):
    net, params, sched, H, D = setup
    import optax

    from mpd_tpu.diffusion.gaussian_diffusion import diffusion_loss

    B = 16
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    batch_host = jax.random.normal(jax.random.PRNGKey(5), (B, H, D)) * 0.5

    def train_step(params, opt_state, batch, key):
        def loss_fn(p):
            conds = {0: batch[:, 0, :], H - 1: batch[:, -1, :]}
            return diffusion_loss(sched, lambda x, t: net.apply(p, x, t), key, batch, conds)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    key = jax.random.PRNGKey(7)
    p_single, loss_single = jax.jit(train_step)(params, opt_state, batch_host, key)

    mesh = make_mesh(8)
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data", None, None))
    step_sharded = jax.jit(train_step, in_shardings=(repl, repl, bsh, repl))
    p_shard, loss_shard = step_sharded(
        replicate(mesh, params), replicate(mesh, opt_state),
        jax.device_put(batch_host, bsh), key,
    )

    assert float(loss_single) == pytest.approx(float(loss_shard), rel=1e-5)
    # Adam divides by sqrt(v): reduction-order noise in the psum'd grads gets
    # amplified near-zero — compare against the update scale (lr=1e-3)
    for a, b in zip(jax.tree.leaves(p_single), jax.tree.leaves(p_shard)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


def test_ddim_sampler_runs_and_pins(setup):
    from mpd_tpu.diffusion import run_ddim_sampling

    net, params, sched, H, D = setup
    B = 4
    eps_fn = lambda x, t: net.apply(params, x, t)
    conds = {0: jnp.zeros((B, D)), H - 1: jnp.ones((B, D)) * 0.3}
    x, chain = jax.jit(
        lambda k: run_ddim_sampling(
            sched, eps_fn, k, (B, H, D), conds,
            SamplerConfig(t_start_guide=-(10**9)), return_chain=True,
        )
    )(jax.random.PRNGKey(0))
    assert x.shape == (B, H, D)
    assert chain.shape[0] == 7  # init + 5 pairs + final x0 step
    np.testing.assert_allclose(np.asarray(x[:, 0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x[:, -1]), 0.3, atol=1e-6)
    assert np.isfinite(np.asarray(x)).all()
