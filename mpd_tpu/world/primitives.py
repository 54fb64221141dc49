"""Signed-distance-field primitives, packed for TPU-friendly batch evaluation.

Obstacles are stored as fixed-shape arrays (padded object sets), so an SDF
query over [..., ws_dim] points is one fused broadcast/reduce — no Python
loops over objects, no ragged shapes. This replaces the reference's
per-object distance-field classes from the torch_robotics dependency
(reference call sites: mpd/datasets/trajectories.py:54,
scripts/inference/inference.py:190-204; the dep itself is an empty submodule
in the snapshot, so the field math here is a clean-room reconstruction).

Everything is plain jnp so it differentiates, vmaps and shards freely.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

_BIG = 1e6  # SDF value of padded (inactive) objects


class ObjectSet(NamedTuple):
    """A padded set of sphere + axis-aligned-box obstacles in the workspace.

    sphere_centers: [Ns, D]   sphere_radii: [Ns]
    box_centers:    [Nb, D]   box_half_extents: [Nb, D]
    Padded entries have radius/extent < 0 and are masked to +inf distance.
    """

    sphere_centers: jnp.ndarray
    sphere_radii: jnp.ndarray
    box_centers: jnp.ndarray
    box_half_extents: jnp.ndarray

    @property
    def ws_dim(self) -> int:
        return self.sphere_centers.shape[-1]

    @property
    def n_objects(self) -> int:
        return int(self.sphere_centers.shape[0] + self.box_centers.shape[0])


def make_object_set(
    spheres: Sequence[Tuple[Sequence[float], float]] = (),
    boxes: Sequence[Tuple[Sequence[float], Sequence[float]]] = (),
    ws_dim: int = 2,
    dtype=jnp.float32,
) -> ObjectSet:
    """Build an ObjectSet from (center, radius) spheres and
    (center, half_extents) boxes. Empty categories get a single padded slot so
    shapes stay static."""
    if spheres:
        sc = np.array([c for c, _ in spheres], dtype=np.float64).reshape(-1, ws_dim)
        sr = np.array([r for _, r in spheres], dtype=np.float64)
    else:
        sc = np.zeros((1, ws_dim)) + _BIG
        sr = np.array([-1.0])
    if boxes:
        bc = np.array([c for c, _ in boxes], dtype=np.float64).reshape(-1, ws_dim)
        bh = np.array([h for _, h in boxes], dtype=np.float64).reshape(-1, ws_dim)
    else:
        bc = np.zeros((1, ws_dim)) + _BIG
        bh = np.zeros((1, ws_dim)) - 1.0
    return ObjectSet(
        sphere_centers=jnp.asarray(sc, dtype),
        sphere_radii=jnp.asarray(sr, dtype),
        box_centers=jnp.asarray(bc, dtype),
        box_half_extents=jnp.asarray(bh, dtype),
    )


def concat_object_sets(a: ObjectSet, b: ObjectSet) -> ObjectSet:
    return ObjectSet(
        sphere_centers=jnp.concatenate([a.sphere_centers, b.sphere_centers]),
        sphere_radii=jnp.concatenate([a.sphere_radii, b.sphere_radii]),
        box_centers=jnp.concatenate([a.box_centers, b.box_centers]),
        box_half_extents=jnp.concatenate([a.box_half_extents, b.box_half_extents]),
    )


def _safe_norm(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """norm with a zero (not NaN) gradient at v == 0.

    The guide differentiates through the SDF; plain jnp.linalg.norm has a NaN
    gradient at the origin, which a box SDF hits for every point *inside* a
    box (max(q,0) == 0). There the outside-distance term is constant zero, so
    a zero gradient is the correct subgradient.
    """
    sq = jnp.sum(v * v, axis=axis)
    pos = sq > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0)


def sdf_spheres(x: jnp.ndarray, centers: jnp.ndarray, radii: jnp.ndarray) -> jnp.ndarray:
    """Min signed distance from points x [..., D] to spheres. Returns [...]."""
    # [..., Ns]
    d = _safe_norm(x[..., None, :] - centers) - radii
    d = jnp.where(radii >= 0, d, _BIG)
    return jnp.min(d, axis=-1)


def sdf_boxes(x: jnp.ndarray, centers: jnp.ndarray, half_extents: jnp.ndarray) -> jnp.ndarray:
    """Min signed distance from points x [..., D] to axis-aligned boxes."""
    q = jnp.abs(x[..., None, :] - centers) - half_extents  # [..., Nb, D]
    outside = _safe_norm(jnp.maximum(q, 0.0))
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    d = outside + inside
    d = jnp.where(half_extents[..., 0] >= 0, d, _BIG)
    return jnp.min(d, axis=-1)


def sdf_object_set(x: jnp.ndarray, objs: ObjectSet) -> jnp.ndarray:
    """Min signed distance from points x [..., D] to all obstacles. [...]."""
    ds = sdf_spheres(x, objs.sphere_centers, objs.sphere_radii)
    db = sdf_boxes(x, objs.box_centers, objs.box_half_extents)
    return jnp.minimum(ds, db)


# ---------------------------------------------------------------------------
# NumPy mirrors, used by the host-side sampling planners (RRT-Connect) where
# per-query device dispatch would dominate.
# ---------------------------------------------------------------------------

def sdf_object_set_np(x: np.ndarray, objs: ObjectSet) -> np.ndarray:
    sc = np.asarray(objs.sphere_centers)
    sr = np.asarray(objs.sphere_radii)
    bc = np.asarray(objs.box_centers)
    bh = np.asarray(objs.box_half_extents)

    ds = np.linalg.norm(x[..., None, :] - sc, axis=-1) - sr
    ds = np.where(sr >= 0, ds, _BIG).min(axis=-1)

    q = np.abs(x[..., None, :] - bc) - bh
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    inside = np.minimum(np.max(q, axis=-1), 0.0)
    db = np.where(bh[..., 0] >= 0, outside + inside, _BIG).min(axis=-1)
    return np.minimum(ds, db)
