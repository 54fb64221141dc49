"""Summary rollout + experiment logger tests."""

import numpy as np
import jax
import jax.numpy as jnp

from mpd_tpu.data import TrajectoryDataset
from mpd_tpu.diffusion import make_schedule
from mpd_tpu.nets.temporal_unet import TemporalUnet
from mpd_tpu.train.logging import ExperimentLogger
from mpd_tpu.train.summary import rollout_summary


def test_rollout_summary_metrics():
    rng = np.random.RandomState(0)
    u = np.linspace(0, 1, 16)[None, :, None]
    pos = rng.uniform(-0.9, -0.5, (12, 1, 2)) * (1 - u) + rng.uniform(0.5, 0.9, (12, 1, 2)) * u
    vel = np.gradient(pos, 5.0 / 16, axis=1)
    trajs = np.concatenate([pos, vel], axis=-1).astype(np.float32)
    ds = TrajectoryDataset(base_dir="unused", trajectories=trajs,
                           env_id="EnvSimple2D", robot_id="RobotPointMass")
    net = TemporalUnet(state_dim=4, n_support_points=16, unet_input_dim=16, dim_mults=(1, 2))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 4)), jnp.zeros((2,), jnp.int32))
    out = rollout_summary(ds, make_schedule("exponential", 25),
                          lambda x, t: net.apply(params, x, t),
                          jax.random.PRNGKey(1), n_samples=5)
    assert set(out) == {"traj_idx", "fraction_free", "collision_intensity", "success"}
    assert 0.0 <= out["fraction_free"] <= 1.0


def test_experiment_logger_stdout(capsys):
    logger = ExperimentLogger(mode="disabled")
    logger.log({"loss": 0.5, "step_kind": "train"}, step=10)
    captured = capsys.readouterr()
    assert "loss=0.5" in captured.out and "[step 10]" in captured.out
    logger.finish()


def test_interpolate_traj_via_points():
    from mpd_tpu.world.task import interpolate_traj_via_points

    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 4), jnp.float32)
    out = interpolate_traj_via_points(x, 2)
    assert out.shape == (2, 15, 4)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(x[:, 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, -1]), np.asarray(x[:, -1]), atol=1e-6)
