"""Checkpointing with true resume: params + EMA + optimizer + step + stats.

The reference saves state_dicts/pickles but has no resume path (optimizer,
EMA and step state are never restored; reference mpd/trainer/trainer.py:20-37,
SURVEY section 5.4). Here a checkpoint is one orbax PyTree save of the whole
TrainState plus the normalizer stats and config needed to rebuild inference —
model dirs stay self-describing (the reference's args.yaml round-trip).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import jax
import yaml

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

import pickle


def _ckpt_dir(base_dir: str, step: int) -> str:
    return os.path.join(base_dir, "checkpoints", f"step_{step:08d}")


def save_checkpoint(
    base_dir: str,
    step: int,
    state,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Save TrainState (+ extra metadata dict) at `base_dir/checkpoints/step_*`."""
    path = _ckpt_dir(base_dir, step)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    state_np = jax.tree.map(np.asarray, state)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), state_np, force=True)
        ckptr.wait_until_finished()
    else:  # fallback
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "state.pkl"), "wb") as f:
            pickle.dump(state_np, f)
    if extra is not None:
        with open(os.path.join(os.path.dirname(path), "meta.yaml"), "w") as f:
            yaml.safe_dump(_yaml_safe(extra), f)
    return path


def _yaml_safe(d):
    out = {}
    for k, v in d.items():
        if isinstance(v, (np.floating, np.integer)):
            out[k] = v.item()
        elif isinstance(v, np.ndarray):
            out[k] = v.tolist()
        elif isinstance(v, dict):
            out[k] = _yaml_safe(v)
        else:
            out[k] = v
    return out


def latest_step(base_dir: str) -> Optional[int]:
    d = os.path.join(base_dir, "checkpoints")
    if not os.path.isdir(d):
        return None
    steps = [
        int(name.split("_")[1])
        for name in os.listdir(d)
        if name.startswith("step_")
    ]
    return max(steps) if steps else None


def load_checkpoint(base_dir: str, abstract_state, step: Optional[int] = None):
    """Restore a TrainState saved by save_checkpoint. `abstract_state` is a
    pytree with the target structure/shapes (e.g. a freshly-built state)."""
    if step is None:
        step = latest_step(base_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {base_dir}")
    path = _ckpt_dir(base_dir, step)
    if _HAS_ORBAX and not os.path.exists(os.path.join(path, "state.pkl")):
        ckptr = ocp.StandardCheckpointer()
        target = jax.tree.map(np.asarray, abstract_state)
        return ckptr.restore(os.path.abspath(path), target=target), step
    with open(os.path.join(path, "state.pkl"), "rb") as f:
        return pickle.load(f), step
