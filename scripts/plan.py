#!/usr/bin/env python
"""Planning-inference CLI: the full MPD pipeline on a trained model dir.

Counterpart of the reference's scripts/inference/inference.py: loads the
model dir's args.yaml + latest checkpoint, rebuilds dataset/env/task with
held-out extra objects, samples N guided candidates, prints the metric block
and saves results_data_dict.pkl.

Example:
  python scripts/plan.py --model-dir data_trained_models/EnvSimple2D-RobotPointMass \
      --planner-alg mpd --n-samples 50 --seed 30
"""

import argparse
import os
import pickle
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-dir", required=True)
    # reference knobs: inference.py:41-75
    p.add_argument("--planner-alg", default="mpd",
                   choices=("mpd", "diffusion_prior", "diffusion_prior_then_guide"))
    p.add_argument("--n-samples", type=int, default=50)
    p.add_argument("--start-guide-steps-fraction", type=float, default=0.25)
    p.add_argument("--n-guide-steps", type=int, default=5)
    p.add_argument("--n-diffusion-steps-without-noise", type=int, default=5)
    p.add_argument("--weight-grad-cost-collision", type=float, default=1e-2)
    p.add_argument("--weight-grad-cost-smoothness", type=float, default=1e-7)
    p.add_argument("--trajectory-duration", type=float, default=5.0)
    p.add_argument("--use-extra-objects", type=int, default=1)
    p.add_argument("--obstacle-cutoff-margin", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=30)
    p.add_argument("--results-dir", default=None)
    p.add_argument("--n-queries", type=int, default=1)
    p.add_argument("--use-ddim", action="store_true")
    p.add_argument("--ddim-refine-anneal-t", type=int, default=0,
                   help="annealed re-noise refine tail (see evaluate.py)")
    p.add_argument("--ddim-refine-steps", type=int, default=0,
                   help="extra noiseless denoise+guide steps after the DDIM "
                        "chain (0 = reference-faithful ddim_sample)")
    p.add_argument("--n-post-guide-steps", type=int, default=None,
                   help="pure-guide tail after the chain (mpd hybrid / "
                        "prior_then_guide override); default = variant "
                        "default, explicit 0 = tail-free")
    p.add_argument("--post-guide-ramp", default=None,
                   help="'s0,s1': linear w_coll multiplier ramp over the "
                        "post-guide tail (see evaluate.py)")
    p.add_argument("--post-guide-freeze-free", action="store_true",
                   help="freeze-when-free adaptive tail: tail steps update "
                        "only trajectories still in collision")
    p.add_argument("--use-respaced", action="store_true",
                   help="respaced-DDPM fast lane (see evaluate.py)")
    p.add_argument("--n-devices", type=int, default=0,
                   help=">1: shard the candidate batch over the first N "
                        "devices (params replicated; best-plan argmin is "
                        "the only collective)")
    p.add_argument("--render", action="store_true",
                   help="save trajectory figures + denoise-chain animation")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    from mpd_tpu.core import setup_runtime

    setup_runtime(cpu=args.cpu)
    import jax
    import jax.numpy as jnp

    from mpd_tpu.data import TrajectoryDataset
    from mpd_tpu.diffusion import make_schedule
    from mpd_tpu.nets.temporal_unet import UNET_DIM_MULTS, TemporalUnet
    from mpd_tpu.planner import MotionPlanner, PlannerConfig
    from mpd_tpu.train import load_checkpoint

    with open(os.path.join(args.model_dir, "args.yaml")) as f:
        margs = yaml.safe_load(f)

    ds = TrajectoryDataset(
        base_dir=margs["data_dir"],
        include_velocity=margs["include_velocity"],
        use_extra_objects=bool(args.use_extra_objects),
        obstacle_cutoff_margin=args.obstacle_cutoff_margin,
    )

    tn = margs.get("traj_normalizer")
    if tn and tn.get("mins") is not None:
        ds.override_traj_normalizer_stats(tn["mins"], tn["maxs"])

    net = TemporalUnet(
        state_dim=margs["state_dim"],
        n_support_points=margs["n_support_points"],
        unet_input_dim=margs["unet_input_dim"],
        dim_mults=UNET_DIM_MULTS[margs["unet_dim_mults_option"]],
    )
    # build an abstract state to restore into
    from mpd_tpu.diffusion import make_schedule as _ms
    from mpd_tpu.train import TrainConfig, Trainer

    trainer = Trainer(
        net, _ms(margs["variance_schedule"], margs["n_diffusion_steps"]),
        ds.trajs_normalized, TrainConfig(), seed=0,
    )
    state, step = load_checkpoint(args.model_dir, trainer.state)
    print(f"loaded checkpoint @ step {step}")
    params = state.ema_params if margs.get("use_ema", True) else state.params
    eps_fn = lambda p, x, t: net.apply(p, x, t)

    mesh = None
    if args.n_devices > 1:
        from mpd_tpu.parallel import make_mesh

        mesh = make_mesh(args.n_devices)
        print(f"candidate batch sharded over {args.n_devices} devices")

    schedule = make_schedule(margs["variance_schedule"], margs["n_diffusion_steps"])
    planner = MotionPlanner(
        ds, schedule, eps_fn, params=params, mesh=mesh,
        config=PlannerConfig(
            planner_alg=args.planner_alg,
            n_samples=args.n_samples,
            start_guide_steps_fraction=args.start_guide_steps_fraction,
            n_guide_steps=args.n_guide_steps,
            n_diffusion_steps_without_noise=args.n_diffusion_steps_without_noise,
            weight_grad_cost_collision=args.weight_grad_cost_collision,
            weight_grad_cost_smoothness=args.weight_grad_cost_smoothness,
            trajectory_duration=args.trajectory_duration,
            use_ddim=args.use_ddim,
            ddim_refine_steps=args.ddim_refine_steps,
            ddim_refine_anneal_t=args.ddim_refine_anneal_t,
            use_respaced=args.use_respaced,
            n_post_guide_steps=args.n_post_guide_steps,
            post_guide_w_coll_ramp=(
                tuple(float(s) for s in args.post_guide_ramp.split(","))
                if args.post_guide_ramp else None
            ),
            post_guide_freeze_free=args.post_guide_freeze_free,
        ),
    )

    key = jax.random.PRNGKey(args.seed)
    for q in range(args.n_queries):
        key, k1, k2 = jax.random.split(key, 3)
        # rejection-sample distant start/goal (ref inference.py:158-166)
        for _ in range(100):
            k1, sub = jax.random.split(k1)
            qs = ds.task.random_coll_free_q(sub, n_samples=2)
            if float(jnp.linalg.norm(qs[0] - qs[1])) > ds.threshold_start_goal_pos:
                break
        res = planner.plan(k2, qs[0], qs[1], return_chain=args.render)

        print("\n----------------METRICS----------------")
        print(f"t_total: {res.t_total:.3f} sec")
        print(f"success: {res.success}")
        print(f"percentage free trajs: {res.fraction_free*100:.2f}")
        print(f"percentage collision intensity: {res.collision_intensity*100:.2f}")
        if res.success:
            print(f"cost smoothness: {res.cost_smoothness.mean():.4f}, {res.cost_smoothness.std():.4f}")
            print(f"cost path length: {res.cost_path_length.mean():.4f}, {res.cost_path_length.std():.4f}")
            print(f"cost best: {res.cost_best:.3f}")
            print(f"variance waypoint: {res.variance_waypoints:.4f}")
        print("--------------------------------------\n")

        if args.render:
            from mpd_tpu.viz import PlanningVisualizer

            out = os.path.join(args.results_dir or args.model_dir, "results_inference", str(args.seed))
            os.makedirs(out, exist_ok=True)
            viz = PlanningVisualizer(ds.task)
            pos = ds.robot.get_position(res.trajs_final)
            best = None if res.idx_best is None else pos[res.idx_best]
            fig, _ = viz.render_robot_trajectories(
                trajs=pos, start_state=qs[0], goal_state=qs[1], traj_best=best)
            fig.savefig(os.path.join(out, f"trajs_q{q}.png"), dpi=120)
            fig2, _ = viz.plot_joint_space_state_trajectories(
                res.trajs_final, pos_start_state=qs[0], pos_goal_state=qs[1])
            fig2.savefig(os.path.join(out, f"joint_space_q{q}.png"), dpi=120)
            if ds.robot.ws_dim == 2 and res.trajs_chain is not None:
                chain_pos = ds.robot.get_position(res.trajs_chain)
                viz.animate_opt_iters_robots(
                    trajs=chain_pos, start_state=qs[0], goal_state=qs[1],
                    traj_best=best,
                    video_filepath=os.path.join(out, f"opt_iters_q{q}.mp4"))
            print(f"renders saved under {out}")

        if args.results_dir:
            out = os.path.join(args.results_dir, str(args.seed))
            os.makedirs(out, exist_ok=True)
            results = dict(
                trajs_final=res.trajs_final,
                free_mask=res.free_mask,
                success_free_trajs=res.success,
                fraction_free_trajs=res.fraction_free,
                collision_intensity_trajs=res.collision_intensity,
                idx_best_traj=res.idx_best,
                cost_best_free_traj=res.cost_best,
                cost_smoothness_trajs_final_free=res.cost_smoothness,
                cost_path_length_trajs_final_free=res.cost_path_length,
                variance_waypoint_trajs_final_free=res.variance_waypoints,
                t_total=res.t_total,
            )
            with open(os.path.join(out, f"results_data_dict_q{q}.pkl"), "wb") as f:
                pickle.dump(results, f)


if __name__ == "__main__":
    main()
