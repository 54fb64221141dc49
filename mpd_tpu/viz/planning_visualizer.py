"""Planning visualization: environments, trajectories, joint-space plots.

Counterpart of torch_robotics' PlanningVisualizer (consumed at reference
scripts/inference/inference.py:358-432 and mpd/datasets/trajectories.py:55,
129-138; the dep is an empty submodule, so this is a clean-room build with
the same API surface: render_robot_trajectories,
plot_joint_space_state_trajectories, animate_robot_trajectories,
animate_opt_iters_robots). 2D envs render obstacles + trajectories directly;
the Panda renders end-effector / collision-sphere workspace traces in 3D.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib import animation, patches

from mpd_tpu.world.task import PlanningTask


class PlanningVisualizer:
    def __init__(self, task: PlanningTask):
        self.task = task
        self.env = task.env
        self.robot = task.robot

    # ------------------------------------------------------------------
    def _draw_env_2d(self, ax, include_extra: bool = True):
        objs = self.env.objects
        sc = np.asarray(objs.sphere_centers)
        sr = np.asarray(objs.sphere_radii)
        bc = np.asarray(objs.box_centers)
        bh = np.asarray(objs.box_half_extents)
        for c, r in zip(sc, sr):
            if r >= 0:
                ax.add_patch(patches.Circle(c, r, color="0.35", zorder=2))
        for c, h in zip(bc, bh):
            if h[0] >= 0:
                ax.add_patch(
                    patches.Rectangle(c - h, 2 * h[0], 2 * h[1], color="0.35", zorder=2)
                )
        lim = np.asarray(self.env.limits)
        ax.set_xlim(lim[0, 0], lim[1, 0])
        ax.set_ylim(lim[0, 1], lim[1, 1])
        ax.set_aspect("equal")

    def render_robot_trajectories(
        self,
        trajs: Optional[np.ndarray] = None,  # [B, H, q] positions
        start_state: Optional[np.ndarray] = None,
        goal_state: Optional[np.ndarray] = None,
        traj_best: Optional[np.ndarray] = None,
        colors: Optional[Sequence] = None,
        **kwargs,
    ):
        """Static figure of position trajectories in the workspace (2D) or
        end-effector traces (Panda)."""
        if self.env.ws_dim == 2:
            fig, ax = plt.subplots(figsize=(6, 6))
            self._draw_env_2d(ax)
            if trajs is not None:
                trajs = np.asarray(trajs)
                for i, tr in enumerate(trajs):
                    c = None if colors is None else colors[i % len(colors)]
                    ax.plot(tr[:, 0], tr[:, 1], lw=1.0, alpha=0.6, color=c or "C0", zorder=3)
            if traj_best is not None:
                tb = np.asarray(traj_best)
                ax.plot(tb[:, 0], tb[:, 1], lw=2.5, color="C3", zorder=4)
            if start_state is not None:
                ax.scatter(*np.asarray(start_state)[:2], c="C2", s=80, zorder=5, marker="o")
            if goal_state is not None:
                ax.scatter(*np.asarray(goal_state)[:2], c="C3", s=80, zorder=5, marker="*")
            return fig, ax
        else:
            fig = plt.figure(figsize=(7, 7))
            ax = fig.add_subplot(projection="3d")
            objs = self.env.objects
            sc = np.asarray(objs.sphere_centers)
            sr = np.asarray(objs.sphere_radii)
            u, v = np.mgrid[0 : 2 * np.pi : 12j, 0 : np.pi : 8j]
            for c, r in zip(sc, sr):
                if r >= 0:
                    ax.plot_surface(
                        c[0] + r * np.cos(u) * np.sin(v),
                        c[1] + r * np.sin(u) * np.sin(v),
                        c[2] + r * np.cos(v),
                        color="0.5",
                        alpha=0.35,
                    )
            import jax.numpy as jnp

            if trajs is not None:
                for tr in np.asarray(trajs):
                    ee = np.asarray(self.robot.fk_ee(jnp.asarray(tr)))
                    ax.plot(ee[:, 0], ee[:, 1], ee[:, 2], lw=1.0, alpha=0.7)
            # highlighted path + start/goal markers as EE-space equivalents
            # of the 2D branch (training summaries pass the dataset
            # trajectory here; ADVICE r3 #3)
            if traj_best is not None:
                eb = np.asarray(self.robot.fk_ee(jnp.asarray(traj_best)))
                ax.plot(eb[:, 0], eb[:, 1], eb[:, 2], lw=2.5, color="C3",
                        zorder=4)
            for state, c, m in ((start_state, "C2", "o"), (goal_state, "C3", "*")):
                if state is not None:
                    q1 = jnp.asarray(state)[None, : self.robot.q_dim]
                    es = np.asarray(self.robot.fk_ee(q1))[0]
                    ax.scatter([es[0]], [es[1]], [es[2]], c=c, s=80, marker=m)
            lim = np.asarray(self.env.limits)
            ax.set_xlim(lim[0, 0], lim[1, 0])
            ax.set_ylim(lim[0, 1], lim[1, 1])
            ax.set_zlim(lim[0, 2], lim[1, 2])
            return fig, ax

    def plot_joint_space_state_trajectories(
        self,
        trajs: np.ndarray,  # [B, H, q] or [B, H, 2q]
        pos_start_state=None,
        pos_goal_state=None,
        **kwargs,
    ):
        """Per-dof position (and velocity, if present) curves over time."""
        trajs = np.asarray(trajs)
        q_dim = self.robot.q_dim
        has_vel = trajs.shape[-1] >= 2 * q_dim
        n_rows = 2 if has_vel else 1
        fig, axs = plt.subplots(n_rows, q_dim, figsize=(3 * q_dim, 3 * n_rows), squeeze=False)
        H = trajs.shape[1]
        t = np.arange(H)
        for d in range(q_dim):
            for tr in trajs:
                axs[0][d].plot(t, tr[:, d], lw=0.8, alpha=0.6)
            axs[0][d].set_title(f"q{d}")
            if pos_start_state is not None:
                axs[0][d].scatter([0], [np.asarray(pos_start_state)[d]], c="C2", zorder=5)
            if pos_goal_state is not None:
                axs[0][d].scatter([H - 1], [np.asarray(pos_goal_state)[d]], c="C3", zorder=5)
            if has_vel:
                for tr in trajs:
                    axs[1][d].plot(t, tr[:, q_dim + d], lw=0.8, alpha=0.6)
                axs[1][d].set_title(f"dq{d}")
        fig.tight_layout()
        return fig, axs

    def animate_robot_trajectories(
        self,
        trajs: np.ndarray,  # [B, H, q]
        start_state=None,
        goal_state=None,
        video_filepath: str = "trajs.mp4",
        n_frames: int = 30,
        anim_time: float = 5.0,
        **kwargs,
    ):
        """Animate robots moving along their trajectories.

        2D: every robot as a moving dot over its path. 3D (Panda): the
        kinematic chain (frame-origin skeleton + collision spheres) of the
        first trajectory replayed along the horizon, with end-effector
        traces of the rest — the counterpart of the reference's IsaacGym
        position-control playback (ref scripts/inference/inference.py:388-414),
        rendered from our own FK instead of a closed-source simulator.
        """
        if self.env.ws_dim == 3:
            return self._animate_robot_trajectories_3d(
                trajs, start_state, goal_state, video_filepath, n_frames, anim_time
            )
        trajs = np.asarray(trajs)
        B, H, _ = trajs.shape
        frame_idx = np.linspace(0, H - 1, n_frames).astype(int)

        fig, ax = plt.subplots(figsize=(6, 6))
        self._draw_env_2d(ax)
        for tr in trajs:
            ax.plot(tr[:, 0], tr[:, 1], lw=0.8, alpha=0.4, color="C0")
        dots = ax.scatter(trajs[:, 0, 0], trajs[:, 0, 1], c="C1", s=25, zorder=6)
        if start_state is not None:
            ax.scatter(*np.asarray(start_state)[:2], c="C2", s=80, zorder=5)
        if goal_state is not None:
            ax.scatter(*np.asarray(goal_state)[:2], c="C3", s=80, zorder=5, marker="*")

        def update(f):
            h = frame_idx[f]
            dots.set_offsets(trajs[:, h, :2])
            return (dots,)

        anim = animation.FuncAnimation(
            fig, update, frames=n_frames, interval=1000 * anim_time / n_frames, blit=True
        )
        self._save_anim(anim, video_filepath, fig)
        return video_filepath

    def _animate_robot_trajectories_3d(
        self,
        trajs: np.ndarray,  # [B, H, 7] joint positions
        start_state,
        goal_state,
        video_filepath: str,
        n_frames: int,
        anim_time: float,
    ):
        import jax.numpy as jnp

        trajs = np.asarray(trajs)
        B, H, _ = trajs.shape
        frame_idx = np.linspace(0, H - 1, min(n_frames, H)).astype(int)

        # FK once for the replayed trajectory (chain skeleton + spheres)
        origins = np.asarray(self.robot.frame_origins(jnp.asarray(trajs[0])))  # [H, 9, 3]
        spheres = np.asarray(
            self.robot.collision_sphere_positions(jnp.asarray(trajs[0]))
        )  # [H, S, 3]

        fig = plt.figure(figsize=(7, 7))
        ax = fig.add_subplot(projection="3d")
        objs = self.env.objects
        u, v = np.mgrid[0 : 2 * np.pi : 12j, 0 : np.pi : 8j]
        for c, r in zip(np.asarray(objs.sphere_centers), np.asarray(objs.sphere_radii)):
            if r >= 0:
                ax.plot_surface(
                    c[0] + r * np.cos(u) * np.sin(v),
                    c[1] + r * np.sin(u) * np.sin(v),
                    c[2] + r * np.cos(v),
                    color="0.5",
                    alpha=0.3,
                )
        for tr in trajs:
            ee = np.asarray(self.robot.fk_ee(jnp.asarray(tr)))
            ax.plot(ee[:, 0], ee[:, 1], ee[:, 2], lw=0.8, alpha=0.4, color="C0")
        if start_state is not None:
            ee0 = np.asarray(self.robot.fk_ee(jnp.asarray(start_state)[None, :7]))[0]
            ax.scatter(*ee0, c="C2", s=60)
        if goal_state is not None:
            eeg = np.asarray(self.robot.fk_ee(jnp.asarray(goal_state)[None, :7]))[0]
            ax.scatter(*eeg, c="C3", s=80, marker="*")

        (skel,) = ax.plot(
            origins[0, :, 0], origins[0, :, 1], origins[0, :, 2],
            lw=3.0, color="C1", marker="o", ms=4, zorder=6,
        )
        sph = ax.scatter(
            spheres[0, :, 0], spheres[0, :, 1], spheres[0, :, 2],
            c="C1", s=120, alpha=0.45, zorder=5,
        )
        lim = np.asarray(self.env.limits)
        ax.set_xlim(lim[0, 0], lim[1, 0])
        ax.set_ylim(lim[0, 1], lim[1, 1])
        ax.set_zlim(lim[0, 2], lim[1, 2])
        title = ax.set_title("t 0")

        def update(f):
            h = frame_idx[f]
            skel.set_data(origins[h, :, 0], origins[h, :, 1])
            skel.set_3d_properties(origins[h, :, 2])
            sph._offsets3d = (
                spheres[h, :, 0], spheres[h, :, 1], spheres[h, :, 2],
            )
            title.set_text(f"t {h}")
            return skel, sph

        anim = animation.FuncAnimation(
            fig, update, frames=len(frame_idx),
            interval=1000 * anim_time / len(frame_idx),
        )
        self._save_anim(anim, video_filepath, fig)
        return video_filepath

    def animate_opt_iters_robots(
        self,
        trajs: np.ndarray,  # [iters, B, H, q]
        start_state=None,
        goal_state=None,
        traj_best=None,
        video_filepath: str = "opt_iters.mp4",
        n_frames: int = 30,
        anim_time: float = 5.0,
        **kwargs,
    ):
        """Animate the denoising chain: one frame per (subsampled) iteration."""
        if self.env.ws_dim != 2:
            raise NotImplementedError("animation currently supports 2D envs")
        trajs = np.asarray(trajs)
        S = trajs.shape[0]
        frame_idx = np.linspace(0, S - 1, min(n_frames, S)).astype(int)

        fig, ax = plt.subplots(figsize=(6, 6))
        self._draw_env_2d(ax)
        lines = [
            ax.plot(trajs[0, b, :, 0], trajs[0, b, :, 1], lw=0.8, alpha=0.5, color="C0")[0]
            for b in range(trajs.shape[1])
        ]
        if start_state is not None:
            ax.scatter(*np.asarray(start_state)[:2], c="C2", s=80, zorder=5)
        if goal_state is not None:
            ax.scatter(*np.asarray(goal_state)[:2], c="C3", s=80, zorder=5, marker="*")
        title = ax.set_title("iter 0")

        def update(f):
            s = frame_idx[f]
            for b, ln in enumerate(lines):
                ln.set_data(trajs[s, b, :, 0], trajs[s, b, :, 1])
            title.set_text(f"iter {s}")
            return lines

        anim = animation.FuncAnimation(
            fig, update, frames=len(frame_idx), interval=1000 * anim_time / len(frame_idx)
        )
        self._save_anim(anim, video_filepath, fig)
        return video_filepath

    @staticmethod
    def _save_anim(anim, path: str, fig):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        try:
            anim.save(path, writer="ffmpeg")
        except Exception:
            # no ffmpeg in the image: fall back to GIF via pillow
            alt = os.path.splitext(path)[0] + ".gif"
            anim.save(alt, writer="pillow")
        plt.close(fig)


# ----------------------------------------------------------------------
# Standalone plotting statistics helpers (clean-room equivalents of the
# reference's unused-by-pipelines utilities, ref mpd/plotting/base.py:
# export_legend :17-26, confidence_ellipse :80-130,
# mean_confidence_interval :133-139 — rebuilt from their call contracts
# for surface completeness; nothing in the pipelines consumes them).


def export_legend(ax, filename="legend.pdf", plot_dir="", ncol=10,
                  linewidth=7):
    """Save ONLY the legend of `ax` as its own figure file (paper-figure
    helper): thick line handles, `ncol` columns, tight crop."""
    handles, labels = ax.get_legend_handles_labels()
    fig2 = plt.figure()
    legend = fig2.legend(
        handles, labels, ncol=ncol, loc="center", frameon=False
    )
    for line in legend.get_lines():
        line.set_linewidth(linewidth)
    fig2.canvas.draw()
    bbox = legend.get_window_extent().transformed(
        fig2.dpi_scale_trans.inverted()
    )
    path = os.path.join(plot_dir, filename) if plot_dir else filename
    fig2.savefig(path, dpi=300, bbox_inches=bbox)
    plt.close(fig2)
    return path


def confidence_ellipse(x, y, ax, n_std=3.0, facecolor="none", **kwargs):
    """Draw the n_std-sigma covariance-confidence ellipse of (x, y) on
    `ax` (standard Pearson-correlation construction: unit circle scaled
    by sqrt(1 +- r), then stretched by the per-axis stds and recentered).
    Returns the added patch."""
    import matplotlib.transforms as transforms

    x = np.asarray(x, np.float64).ravel()
    y = np.asarray(y, np.float64).ravel()
    if x.size != y.size:
        raise ValueError("x and y must be the same size")
    cov = np.cov(x, y)
    denom = np.sqrt(cov[0, 0] * cov[1, 1])
    pearson = cov[0, 1] / denom if denom > 0 else 0.0
    rx = np.sqrt(1 + pearson)
    ry = np.sqrt(1 - pearson)
    ellipse = patches.Ellipse(
        (0, 0), width=2 * rx, height=2 * ry, facecolor=facecolor, **kwargs
    )
    sx = np.sqrt(cov[0, 0]) * n_std
    sy = np.sqrt(cov[1, 1]) * n_std
    transf = (
        transforms.Affine2D()
        .rotate_deg(45)
        .scale(sx, sy)
        .translate(np.mean(x), np.mean(y))
    )
    ellipse.set_transform(transf + ax.transData)
    return ax.add_patch(ellipse)


def mean_confidence_interval(data, confidence=0.95, axis=0):
    """(mean, half-width) of the Student-t confidence interval of `data`
    along `axis` (standard error x t-quantile at the given confidence)."""
    from scipy import stats

    a = np.asarray(data, np.float64)
    n = a.shape[axis]
    mean = np.mean(a, axis=axis)
    se = stats.sem(a, axis=axis)
    h = se * stats.t.ppf((1 + confidence) / 2.0, n - 1)
    return mean, h
