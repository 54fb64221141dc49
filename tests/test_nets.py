"""Network tests: U-Net shapes/param counts across configs, conditioning
modes, attention stack, visualizer smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpd_tpu.nets.layers import group_norm_n_groups, mish
from mpd_tpu.nets.temporal_unet import UNET_DIM_MULTS, TemporalUnet


def _init_and_run(net, H, D, context=None, C=None):
    B = 3
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, D))
    t = jnp.asarray([0, 5, 24], jnp.int32)
    ctx = None if context is None else jax.random.normal(jax.random.PRNGKey(1), (B, C))
    params = net.init(jax.random.PRNGKey(2), x, t, ctx)
    out = net.apply(params, x, t, ctx)
    return params, out


def test_unet_shapes_both_mult_options():
    for opt, mults in UNET_DIM_MULTS.items():
        for D in (4, 14):  # point-mass and Panda state dims
            net = TemporalUnet(state_dim=D, n_support_points=64, dim_mults=mults)
            _, out = _init_and_run(net, 64, D)
            assert out.shape == (3, 64, D)


def test_unet_param_count_plausible():
    # dim 32, mults (1,2,4,8): the reference model is ~4M params; ours should
    # be the same order of magnitude
    net = TemporalUnet(state_dim=4, n_support_points=64, dim_mults=(1, 2, 4, 8))
    params, _ = _init_and_run(net, 64, 4)
    n = sum(p.size for p in jax.tree.leaves(params))
    assert 1_000_000 < n < 10_000_000


@pytest.mark.slow  # >=19 s compile-heavy (fast loop: -m 'not slow')
def test_unet_conditioning_modes():
    C = 4
    for mode in ("default", "attention", "concatenate"):
        net = TemporalUnet(
            state_dim=4, n_support_points=32, unet_input_dim=16, dim_mults=(1, 2),
            conditioning_type=mode, conditioning_embed_dim=C,
        )
        _, out = _init_and_run(net, 32, 4, context=True, C=C)
        assert out.shape == (3, 32, 4), mode
        assert np.isfinite(np.asarray(out)).all()


def test_unet_concatenate_state_encoder_branch():
    """ref temporal_unet.py:44-52: with state_dim < conditioning_embed_dim
    // 4 the state is embedded through a mish-MLP (out = embed_dim // 4,
    hidden = out // 2) before concatenating the context; otherwise the raw
    state is concatenated and NO encoder params exist."""
    # active branch: state_dim 2 < 16 // 4 = 4 -> encoder with out_dim 4
    net = TemporalUnet(
        state_dim=2, n_support_points=32, unet_input_dim=16, dim_mults=(1, 2),
        conditioning_type="concatenate", conditioning_embed_dim=16,
    )
    params, out = _init_and_run(net, 32, 2, context=True, C=16)
    assert out.shape == (3, 32, 2)
    assert np.isfinite(np.asarray(out)).all()
    flat = {"/".join(map(str, k)): v for k, v in
            jax.tree_util.tree_leaves_with_path(params)}
    enc = {k: v for k, v in flat.items() if "_StateEncoderMLP" in k}
    # 3 Dense layers (kernel+bias each): state_dim->hidden->hidden->out
    kernels = sorted(v.shape for k, v in enc.items() if v.ndim == 2)
    assert kernels == [(2, 2), (2, 2), (2, 4)]
    # first conv consumes state_emb_dim + embed_dim = 4 + 16 channels
    in_ch = [v.shape for k, v in flat.items() if v.ndim == 3]
    assert any(s[-2] == 20 for s in in_ch)

    # inactive branch: state_dim 4 >= 4 -> raw concat, no encoder params
    net2 = TemporalUnet(
        state_dim=4, n_support_points=32, unet_input_dim=16, dim_mults=(1, 2),
        conditioning_type="concatenate", conditioning_embed_dim=16,
    )
    params2, _ = _init_and_run(net2, 32, 4, context=True, C=16)
    flat2 = {"/".join(map(str, k)): v for k, v in
             jax.tree_util.tree_leaves_with_path(params2)}
    assert not any("_StateEncoderMLP" in k for k in flat2)


def test_unet_self_attention_path():
    net = TemporalUnet(state_dim=4, n_support_points=32, unet_input_dim=16,
                       dim_mults=(1, 2), self_attention=True)
    _, out = _init_and_run(net, 32, 4)
    assert out.shape == (3, 32, 4)


def test_group_norm_n_groups_rule():
    assert group_norm_n_groups(32) == 8
    assert group_norm_n_groups(4) == 1
    assert group_norm_n_groups(33) == 11
    assert group_norm_n_groups(31) == 1


def test_mish_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.linspace(-5, 5, 101, dtype=np.float32)
    expected = torch.nn.functional.mish(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(mish(jnp.asarray(x))), expected, atol=1e-6)


def test_visualizer_smoke(tmp_path):
    from mpd_tpu.viz import PlanningVisualizer
    from mpd_tpu.world import PlanningTask, get_env, get_robot

    task = PlanningTask(env=get_env("EnvDense2D"), robot=get_robot("RobotPointMass"))
    viz = PlanningVisualizer(task)
    trajs = np.random.RandomState(0).uniform(-0.9, 0.9, (4, 16, 2))
    fig, _ = viz.render_robot_trajectories(trajs=trajs, start_state=trajs[0, 0], goal_state=trajs[0, -1])
    fig.savefig(tmp_path / "render.png")
    fig2, _ = viz.plot_joint_space_state_trajectories(
        np.concatenate([trajs, trajs], axis=-1), pos_start_state=trajs[0, 0]
    )
    fig2.savefig(tmp_path / "joint.png")
    out = viz.animate_robot_trajectories(
        trajs=trajs, start_state=trajs[0, 0], goal_state=trajs[0, -1],
        video_filepath=str(tmp_path / "anim.mp4"), n_frames=4,
    )
    import os
    assert any(os.path.exists(str(tmp_path / f"anim.{ext}")) for ext in ("mp4", "gif"))


def test_visualizer_panda_3d_highlighted_path(tmp_path):
    """The 3D branch draws the traj_best EE trace + start/goal EE markers
    (training summaries pass the dataset trajectory; ADVICE r3 #3)."""
    from mpd_tpu.viz import PlanningVisualizer
    from mpd_tpu.world import PlanningTask, get_env, get_robot

    robot = get_robot("RobotPanda")
    task = PlanningTask(env=get_env("EnvSpheres3D"), robot=robot)
    viz = PlanningVisualizer(task)
    rng = np.random.RandomState(0)
    qmin, qmax = np.asarray(robot.q_min), np.asarray(robot.q_max)
    trajs = rng.uniform(qmin, qmax, (2, 8, 7)).astype(np.float32)
    fig, ax = viz.render_robot_trajectories(
        trajs=trajs, traj_best=trajs[0], start_state=trajs[0, 0],
        goal_state=trajs[0, -1],
    )
    # sampled traces + highlighted path drawn as Line3D; markers present
    assert len(ax.lines) == 3
    assert len(ax.collections) >= 2
    fig.savefig(tmp_path / "panda_paths.png")


def test_visualizer_panda_3d_animation(tmp_path):
    from mpd_tpu.viz import PlanningVisualizer
    from mpd_tpu.world import PlanningTask, get_env, get_robot

    robot = get_robot("RobotPanda")
    task = PlanningTask(env=get_env("EnvSpheres3D"), robot=robot)
    viz = PlanningVisualizer(task)
    rng = np.random.RandomState(0)
    qmin, qmax = np.asarray(robot.q_min), np.asarray(robot.q_max)
    trajs = rng.uniform(qmin, qmax, (2, 8, 7)).astype(np.float32)
    viz.animate_robot_trajectories(
        trajs=trajs, start_state=trajs[0, 0], goal_state=trajs[0, -1],
        video_filepath=str(tmp_path / "panda.mp4"), n_frames=3,
    )
    import os
    assert any(os.path.exists(str(tmp_path / f"panda.{ext}")) for ext in ("mp4", "gif"))
