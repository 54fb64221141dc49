"""Real multi-process jax.distributed runtime exercise (VERDICT r2 item 4).

Launches TWO actual OS processes that `jax.distributed.initialize` against
each other on the CPU backend (gloo collectives), run a PRODUCTION
`Trainer(mesh=...)` DP training loop over the 2-process global mesh, and
round-trip `all_reduce_metrics` through the real `process_allgather` branch
(mpd_tpu/parallel/distributed.py:56-72). The reference has no distributed
runtime at all (SURVEY §2.3); multi-host is a deliverable of THIS framework
(SURVEY §5.8, BASELINE.md), so these code paths need live >1-process
coverage, not just the single-process degenerate branch.

The 2-process DP result is asserted equal to an in-process single-device
run with the same seeds: the training math is layout-independent, only the
gradient psum rides the cross-process collective.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

# cross-process integration lanes: >10 s each (VERDICT r3 #8); excluded
# from the fast dev loop via `pytest -m 'not slow'`
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_runtime_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """Same workload as the worker, single device, no mesh."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    from mpd_tpu.diffusion import make_schedule
    from mpd_tpu.nets.temporal_unet import TemporalUnet
    from mpd_tpu.train import TrainConfig, Trainer

    rng = np.random.RandomState(0)
    H = 16
    u = np.linspace(0, 1, H)[None, :, None]
    a = rng.uniform(-0.9, -0.5, (64, 1, 2))
    b = rng.uniform(0.5, 0.9, (64, 1, 2))
    pos = a * (1 - u) + b * u
    vel = np.gradient(pos, 5.0 / H, axis=1)
    trajs = np.concatenate([pos, vel], axis=-1).astype(np.float32)

    net = TemporalUnet(
        state_dim=4, n_support_points=H, unet_input_dim=16, dim_mults=(1, 2)
    )
    trainer = Trainer(
        net,
        make_schedule("exponential", 25),
        trajs,
        TrainConfig(batch_size=16, lr=1e-3, steps_til_summary=10**9),
        seed=0,
        mesh=None,
    )
    hist = trainer.fit(
        num_steps=20, key=jax.random.PRNGKey(3), steps_per_call=10, log_every=10
    )
    params_sum = float(
        sum(np.abs(np.asarray(l)).sum() for l in jax.tree.leaves(trainer.state.params))
    )
    return hist["train_loss"][-1], params_sum


def test_two_process_distributed_runtime(tmp_path):
    port = _free_port()
    # each worker must see exactly ONE local CPU device (the parent test
    # env forces an 8-virtual-device mesh; strip that so the global mesh is
    # 2 devices = 2 processes and the grad psum crosses the process boundary)
    env = dict(os.environ)
    env["XLA_FLAGS"] = ""
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("MPD_TPU_REAL", None)

    outs = [str(tmp_path / f"worker{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), outs[i]],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.load(open(o)) for o in outs]
    r0, r1 = sorted(results, key=lambda r: r["pid"])

    # the real runtime came up: both ranks saw 2 processes
    assert r0["process_count"] == 2 and r1["process_count"] == 2

    # DP training state is replicated: both ranks hold identical results
    assert r0["train_loss"] == pytest.approx(r1["train_loss"], rel=1e-6)
    assert r0["params_abs_sum"] == pytest.approx(r1["params_abs_sum"], rel=1e-6)

    # process_allgather round-trip: mean over ranks {0,1} and {10,20}
    for r in (r0, r1):
        assert r["metrics"]["rank"] == pytest.approx(0.5)
        assert r["metrics"]["ten_x"] == pytest.approx(15.0)

    # shard_contexts splits the id range disjointly and completely
    assert r0["ctxs"] == [0, 1, 2, 3, 4]
    assert r1["ctxs"] == [5, 6, 7, 8, 9]

    # and the 2-process DP run reproduces the single-process trajectory
    # (same seeds/batches; only the gradient reduction crossed DCN)
    ref_loss, ref_params_sum = _single_process_reference()
    assert r0["train_loss"] == pytest.approx(ref_loss, rel=2e-3)
    assert r0["params_abs_sum"] == pytest.approx(ref_params_sum, rel=2e-3)
