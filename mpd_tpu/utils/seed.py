"""Seeding discipline.

Counterpart of torch_robotics' fix_random_seed (consumed at reference
scripts/inference/inference.py:78, generate_trajectories.py:207-208). JAX
PRNG keys are explicit, so this only pins the host-side RNGs; device
randomness flows from the returned key.
"""

from __future__ import annotations

import random

import numpy as np
import jax


def fix_random_seed(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
