#!/usr/bin/env python
"""Render generated expert trajectories for one context directory.

Counterpart of the reference's scripts/generate_data/visualize_trajectories.py.

Example:
  python scripts/visualize_data.py --data data_trajectories/EnvSimple2D-RobotPointMass \
      --context 0 --out /tmp/viz
"""

import argparse
import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True)
    p.add_argument("--context", type=int, default=0)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from mpd_tpu.core import setup_runtime

    setup_runtime(cpu=True)

    from mpd_tpu.viz import PlanningVisualizer
    from mpd_tpu.world import PlanningTask, get_env, get_robot

    ctx_dir = os.path.join(args.data, str(args.context))
    meta = yaml.safe_load(open(os.path.join(ctx_dir, "metadata.yaml")))
    cfg = yaml.safe_load(open(os.path.join(ctx_dir, "args.yaml")))
    trajs = np.load(os.path.join(ctx_dir, "trajs-free.npy"))
    print(f"{meta['env_id']}-{meta['robot_id']} context {args.context}: "
          f"{len(trajs)} free trajectories")

    env = get_env(meta["env_id"])
    robot = get_robot(meta["robot_id"])
    task = PlanningTask(env=env, robot=robot,
                       obstacle_cutoff_margin=cfg.get("obstacle_cutoff_margin", 0.03))
    viz = PlanningVisualizer(task)
    out = args.out or ctx_dir
    os.makedirs(out, exist_ok=True)

    pos = trajs[..., : robot.q_dim]
    fig, _ = viz.render_robot_trajectories(
        trajs=pos, start_state=pos[0, 0], goal_state=pos[0, -1])
    fig.savefig(os.path.join(out, "trajectories.png"), dpi=120)
    fig2, _ = viz.plot_joint_space_state_trajectories(
        trajs, pos_start_state=pos[0, 0], pos_goal_state=pos[0, -1])
    fig2.savefig(os.path.join(out, "joint_space.png"), dpi=120)
    print(f"saved renders to {out}")


if __name__ == "__main__":
    main()
