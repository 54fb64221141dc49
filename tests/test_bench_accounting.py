"""Bench flop-accounting guards (ADVICE r2 #1): the per-variant chain
composition counts build_query attaches for chain_cost must match the
sampler's actual structure — a single hardcoded count silently overstated
fast-lane flops ~2x before round 3."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_query


def _counts(**kw):
    q = build_query(8, fused="off", **kw)
    return q._n_fwd, q._n_guide


def test_ddpm_chain_counts():
    # 25 noisy + 5 extra forwards; (7 noisy + 5 extra) x 5 guide evals
    assert _counts() == (30, 60)


def test_ddim_chain_counts():
    # 10 subsequence pairs + 5 refine forwards; guide on pairs with
    # 0 <= t_next < 7 (t_next in {6, 3, 0} — the final (0, -1) pair breaks
    # before the guide block, sampler.py) plus every refine step, x5
    assert _counts(ddim=True) == (15, 40)


def test_respaced_chain_counts():
    # 10 sub-steps + 5 extra forwards; sub-indices below the remapped
    # t_start_guide (3: original times 0,3,6) + 5 extra, x5
    assert _counts(respaced=True) == (15, 40)


def test_panda_gs15_chain_counts():
    # same DDPM chain, 15 guide steps -> (7 + 5) x 15
    assert _counts(env_id="EnvSpheres3D", robot_id="RobotPanda",
                   n_guide_steps=15, w_coll=5e-2) == (30, 180)
