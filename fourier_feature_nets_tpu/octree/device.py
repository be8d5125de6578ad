"""On-device (JAX) octree traversal.

The TPU answer to the reference's per-ray numba DDA
(octree.py:418-501): point queries and ray marching over the *linear
octree* (sorted id arrays + binary search) expressed as fixed-bound
``lax.scan``s vmapped over rays — every ray advances through the tree
in lockstep, searchsorted handles the id lookups, and the whole
traversal jits onto the accelerator with static shapes.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["device_batch_query", "device_batch_intersect", "Path"]

X_POS, Y_POS, Z_POS = 0b100, 0b010, 0b001


class Path(NamedTuple):
    """Ray-marching output: per-step entry depths and leaf indices
    (-1 = empty space), matching the reference Path contract
    (octree.py:23)."""

    t_stops: jnp.ndarray
    leaves: jnp.ndarray


def _sorted_member(arr: jnp.ndarray, ids: jnp.ndarray):
    """(found, index) of ids in the sorted array arr."""
    if arr.shape[0] == 0:
        # root-only trees have an empty node_index: gathering a
        # size-1 slice from a zero-length array is a trace-time error
        return (jnp.zeros(ids.shape, bool),
                jnp.zeros(ids.shape, jnp.int32))
    index = jnp.searchsorted(arr, ids).astype(jnp.int32)
    clipped = jnp.minimum(index, arr.shape[0] - 1)
    found = arr[clipped] == ids
    return found, index


def _descend(node_index: jnp.ndarray, leaf_index: jnp.ndarray,
             scale: float, max_depth: int, points: jnp.ndarray):
    """Descends all points from the root to their deepest cell.

    Returns (center, half_scale, leaf (index or -1), in_tree) where
    ``in_tree`` distinguishes interior termination (empty space /
    leaf) from never entering the volume.
    """
    # linear-octree ids fit int32 through depth 10
    # ((8**12 - 1) / 7 > 2**31 only beyond that); the C++/NumPy hosts
    # handle deeper trees, the device path guards explicitly
    assert max_depth <= 10, "device traversal supports depth <= 10"
    num = points.shape[0]

    def body(state, _):
        center, half, node_id, leaf, done = state
        oct_x = (points[:, 0] >= center[:, 0]).astype(jnp.int32) * X_POS
        oct_y = (points[:, 1] >= center[:, 1]).astype(jnp.int32) * Y_POS
        oct_z = (points[:, 2] >= center[:, 2]).astype(jnp.int32) * Z_POS
        octant = oct_x + oct_y + oct_z
        child_id = (node_id << 3) + 1 + octant
        child_half = half * 0.5
        offsets = jnp.stack([
            jnp.where(octant & X_POS, child_half, -child_half),
            jnp.where(octant & Y_POS, child_half, -child_half),
            jnp.where(octant & Z_POS, child_half, -child_half)], -1)
        child_center = center + offsets

        is_leaf, leaf_pos = _sorted_member(leaf_index, child_id)
        is_node, _ = _sorted_member(node_index, child_id)

        step = ~done
        center = jnp.where(step[:, None], child_center, center)
        half = jnp.where(step, child_half, half)
        node_id = jnp.where(step, child_id, node_id)
        leaf = jnp.where(step & is_leaf, leaf_pos, leaf)
        done = done | is_leaf | ~is_node
        return (center, half, node_id, leaf, done), None

    init = (jnp.zeros((num, 3), jnp.float32),
            jnp.full((num,), scale, jnp.float32),
            jnp.zeros((num,), jnp.int32),
            jnp.full((num,), -1, jnp.int32),
            jnp.zeros((num,), bool))
    (center, half, _, leaf, _), _ = jax.lax.scan(body, init, None,
                                                 length=max_depth)
    return center, half, leaf


@partial(jax.jit, static_argnames=("scale", "max_depth"))
def device_batch_query(node_index: jnp.ndarray, leaf_index: jnp.ndarray,
                       points: jnp.ndarray, *, scale: float,
                       max_depth: int) -> jnp.ndarray:
    """Point -> leaf index (or -1), octree.py:513-541 parity."""
    _, _, leaf = _descend(node_index, leaf_index, scale, max_depth,
                          points)
    inside = jnp.max(jnp.abs(points), axis=-1) <= scale
    return jnp.where(inside, leaf, -1)


def _cell_near_far(center, half, starts, inv_dirs):
    t0 = (center - half[:, None] - starts) * inv_dirs
    t1 = (center + half[:, None] - starts) * inv_dirs
    near = jnp.minimum(t0, t1).max(-1)
    far = jnp.maximum(t0, t1).min(-1)
    return near, far


@partial(jax.jit, static_argnames=("scale", "max_depth", "max_length"))
def device_batch_intersect(node_index: jnp.ndarray,
                           leaf_index: jnp.ndarray, starts: jnp.ndarray,
                           directions: jnp.ndarray, *, scale: float,
                           max_depth: int, max_length: int) -> Path:
    """Marches rays cell-to-cell through the sparse tree.

    Per step: descend to the deepest cell containing the current
    point, record (t_entry, leaf or -1), jump past the cell's exit
    plane. Unvisited tail entries hold the root exit t and leaf -1
    (octree.py:418-501 contract).
    """
    directions = jnp.where(directions == 0, 1e-8, directions)
    inv_dirs = 1.0 / directions
    num_rays = starts.shape[0]

    root_center = jnp.zeros((num_rays, 3), jnp.float32)
    root_half = jnp.full((num_rays,), scale, jnp.float32)
    root_t0, root_t1 = _cell_near_far(root_center, root_half, starts,
                                      inv_dirs)
    hit = root_t0 < root_t1

    def body(state, _):
        t, stop = state
        points = starts + t[:, None] * directions
        inside = (jnp.max(jnp.abs(points), axis=-1) <= scale) & hit
        active = inside & (t < root_t1) & (stop < max_length - 1)

        center, half, leaf = _descend(node_index, leaf_index, scale,
                                      max_depth, points)
        _, cell_t1 = _cell_near_far(center, half, starts, inv_dirs)

        out_t = jnp.where(active, t, root_t1)
        out_leaf = jnp.where(active, leaf, -1)
        # forward-progress guard: a fixed +1e-5 nudge underflows one
        # f32 ulp once t >= ~256 (ulp(t) = t * 2^-24), stalling the
        # march on the same cell — the relative term keeps the nudge
        # above an ulp at any depth (reference escape loop,
        # octree.py:451-458; C++ uses nextafter)
        base = jnp.maximum(cell_t1, t)
        next_t = jnp.where(active,
                           base + jnp.maximum(1e-5, base * 1e-6), t)
        next_stop = stop + active.astype(jnp.int32)
        return (next_t, next_stop), (out_t, out_leaf, active)

    init = (root_t0 + 1e-5, jnp.zeros((num_rays,), jnp.int32))
    _, (t_steps, leaf_steps, actives) = jax.lax.scan(
        body, init, None, length=max_length)

    # Once a ray goes inactive it stays inactive (t stops advancing),
    # so the active steps form a prefix and scan position == output
    # slot; inactive slots take the tail values (root exit, leaf -1).
    actives = actives.T              # (R, L)
    t_stops = jnp.where(actives, t_steps.T,
                        jnp.broadcast_to(root_t1[:, None],
                                         (num_rays, max_length)))
    leaves = jnp.where(actives, leaf_steps.T, -1)
    return Path(t_stops.astype(jnp.float32), leaves)
