#!/usr/bin/env python
"""Expert-trajectory data generation CLI.

Counterpart of the reference's scripts/generate_data/generate_trajectories.py
+ launch_generate_trajectories.py: contexts are independent (seed == context
id); shard the [--context-start, --context-end) range across processes/hosts.

Example:
  python scripts/generate_data.py --env EnvSimple2D --robot RobotPointMass \
      --out data_trajectories/EnvSimple2D-RobotPointMass \
      --context-start 0 --context-end 50 --num-trajectories 20
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env", required=True)
    p.add_argument("--robot", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--context-start", type=int, default=0)
    p.add_argument("--context-end", type=int, default=500)
    p.add_argument("--num-trajectories", type=int, default=20)
    p.add_argument("--n-support-points", type=int, default=64)
    p.add_argument("--duration", type=float, default=5.0)
    p.add_argument("--threshold-start-goal-pos", type=float, default=1.0)
    p.add_argument("--obstacle-cutoff-margin", type=float, default=0.02)
    p.add_argument("--rrt-max-time", type=float, default=120.0)
    p.add_argument("--gpmp-opt-iters", type=int, default=300)
    p.add_argument("--max-workers", type=int, default=-1,
                   help="RRT seed fan-out threads (ref MultiSampleBasedPlanner "
                        "max_processes; -1 = one per seed, 1 = sequential)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = p.parse_args()

    from mpd_tpu.core import setup_runtime

    setup_runtime(cpu=args.cpu)

    from mpd_tpu.data.datagen import generate_context

    os.makedirs(args.out, exist_ok=True)
    t_start = time.time()
    n_ok = 0
    for ctx in range(args.context_start, args.context_end):
        t0 = time.time()
        try:
            stats = generate_context(
                args.env,
                args.robot,
                seed=ctx,
                results_dir=args.out,
                num_trajectories=args.num_trajectories,
                n_support_points=args.n_support_points,
                duration=args.duration,
                threshold_start_goal_pos=args.threshold_start_goal_pos,
                obstacle_cutoff_margin=args.obstacle_cutoff_margin,
                rrt_max_time=args.rrt_max_time,
                gpmp_opt_iters=args.gpmp_opt_iters,
                max_workers=args.max_workers,
            )
            n_ok += 1
            print(
                f"[ctx {ctx}] free {stats['n_free']}/{stats['n_trajs']} "
                f"coll_int {stats['collision_intensity']:.3f} "
                f"({time.time()-t0:.1f}s)",
                flush=True,
            )
        except Exception as e:  # a failed context = missing dir, like the ref
            print(f"[ctx {ctx}] FAILED: {e}", flush=True)
    print(f"done: {n_ok} contexts in {time.time()-t_start:.0f}s")


if __name__ == "__main__":
    main()
