"""Sparse octree with native and on-device traversal.

TPU re-design of the reference octree
(/root/reference/fourier_feature_nets/octree.py). The data model is
the same *linear octree* (children of node i occupy ids 8i+1..8i+8;
sorted id arrays + binary search instead of pointers), but each
component runs where it belongs:

  * construction (BFS) — C++ (csrc/octree.cpp) via ctypes, with a
    vectorized NumPy fallback; replaces the numba @njit kernels.
  * query / intersect — C++ host kernels for offline use AND jitted
    JAX traversal (device.py) for on-accelerator rendering.
  * leaf geometry — arithmetic id decoding, replacing the BFS
    reconstruction in the reference (_leaf_nodes).
"""

import os
from typing import Dict, Optional, Union

import numpy as np

from .build import load_library
from .device import Path, device_batch_intersect, device_batch_query
from .host import build_from_samples_numpy, decode_ids_numpy

__all__ = ["OcTree", "Path"]


class OcTree:
    """Sparse octree over the cube [-scale, scale]^3."""

    def __init__(self, scale: float, node_ids, leaf_ids,
                 leaf_data: Optional[np.ndarray] = None):
        """Constructor.

        Args:
            scale: root half side length.
            node_ids: interior node ids (iterable of int).
            leaf_ids: leaf ids (iterable of int).
            leaf_data: optional (num_leaves, D) per-leaf payload.
        """
        self._update(node_ids, leaf_ids, scale)
        self._leaf_data = leaf_data

    def _update(self, node_ids, leaf_ids, scale: float):
        self._scale = float(scale)
        leaf_set = set(int(i) for i in leaf_ids)
        node_set = set(int(i) for i in node_ids) - leaf_set
        self._node_index = np.array(sorted(node_set), np.int64)
        self._leaf_index = np.array(sorted(leaf_set), np.int64)
        self._leaf_centers, self._leaf_depths = self._decode(
            self._leaf_index)

    def _decode(self, ids: np.ndarray):
        lib = load_library()
        if lib is not None and len(ids):
            import ctypes
            centers = np.zeros((len(ids), 3), np.float32)
            depths = np.zeros(len(ids), np.int32)
            lib.octree_decode_ids(
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(ids), self._scale,
                centers.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                depths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            return centers, depths
        return decode_ids_numpy(ids, self._scale)

    # ------------------------------------------------------------------
    # basic properties
    # ------------------------------------------------------------------

    def leaf_centers(self) -> np.ndarray:
        """(N, 3) leaf center coordinates."""
        return self._leaf_centers

    def leaf_depths(self) -> np.ndarray:
        """(N,) leaf depths."""
        return self._leaf_depths

    def leaf_data(self) -> Optional[np.ndarray]:
        """Per-leaf payload (or None)."""
        return self._leaf_data

    def __len__(self) -> int:
        """Total node count (interior + leaves)."""
        return len(self._node_index) + len(self._leaf_index)

    @property
    def num_leaves(self) -> int:
        """Number of leaves."""
        return len(self._leaf_index)

    @property
    def scale(self) -> float:
        """Root half side length."""
        return self._scale

    @property
    def depth(self) -> int:
        """Maximum depth of the tree (octree.py:624-633 parity:
        depth of the deepest leaf + 1)."""
        if len(self._leaf_index) == 0:
            return 1
        return int(self._leaf_depths.max()) + 1

    # ------------------------------------------------------------------
    # queries
    # ------------------------------------------------------------------

    def query(self, positions: np.ndarray) -> np.ndarray:
        """Maps positions to containing-leaf indices (-1 = empty/out).

        Host (C++) when available; falls back to the jitted device
        traversal otherwise.
        """
        positions = np.asarray(positions, np.float32)
        assert positions.shape[-1] == 3 and positions.ndim <= 2
        if positions.ndim == 1:
            positions = positions.reshape(1, 3)

        lib = load_library()
        if lib is not None:
            import ctypes
            result = np.zeros(len(positions), np.int64)
            positions = np.ascontiguousarray(positions)
            lib.octree_batch_query(
                self._scale,
                self._node_index.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int64)),
                len(self._node_index),
                self._leaf_index.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int64)),
                len(self._leaf_index),
                positions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                len(positions),
                result.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            return result
        return np.asarray(self.query_device(positions))

    def query_device(self, positions) -> np.ndarray:
        """On-device point query (jit-safe)."""
        import jax.numpy as jnp
        return device_batch_query(jnp.asarray(self._node_index),
                                  jnp.asarray(self._leaf_index),
                                  jnp.asarray(positions),
                                  scale=self._scale,
                                  max_depth=self.depth)

    def intersect(self, starts: np.ndarray, directions: np.ndarray,
                  max_length: int) -> Path:
        """Marches rays through the tree -> (t_stops, leaves)."""
        starts = np.asarray(starts, np.float32)
        directions = np.asarray(directions, np.float32)
        assert starts.shape[-1] == 3 and directions.shape[-1] == 3
        if starts.ndim == 1:
            starts = starts.reshape(1, 3)
            directions = directions.reshape(1, 3)
        if starts.shape != directions.shape:
            # the C++ kernel sizes its loop from `starts` alone and
            # would read past a shorter directions buffer (the
            # reference asserts matching ranks, octree.py:722)
            raise ValueError(
                "starts and directions must have matching shapes; got "
                f"{starts.shape} vs {directions.shape}")

        lib = load_library()
        if lib is not None:
            import ctypes
            num_rays = len(starts)
            t_stops = np.zeros((num_rays, max_length), np.float32)
            leaves = np.zeros((num_rays, max_length), np.int64)
            starts = np.ascontiguousarray(starts)
            directions = np.ascontiguousarray(directions)
            lib.octree_batch_intersect(
                self._scale,
                self._node_index.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int64)),
                len(self._node_index),
                self._leaf_index.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int64)),
                len(self._leaf_index),
                starts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                directions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                num_rays, max_length,
                t_stops.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                leaves.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            return Path(t_stops, leaves)
        path = self.intersect_device(starts, directions, max_length)
        return Path(np.asarray(path.t_stops), np.asarray(path.leaves))

    def intersect_device(self, starts, directions,
                         max_length: int) -> Path:
        """On-device ray marching (jit-safe, TPU render path)."""
        import jax.numpy as jnp
        return device_batch_intersect(jnp.asarray(self._node_index),
                                      jnp.asarray(self._leaf_index),
                                      jnp.asarray(starts),
                                      jnp.asarray(directions),
                                      scale=self._scale,
                                      max_depth=self.depth,
                                      max_length=max_length)

    # ------------------------------------------------------------------
    # construction / editing
    # ------------------------------------------------------------------

    @staticmethod
    def build_from_samples(positions: np.ndarray, depth: int,
                           min_leaf_size: int,
                           data: Optional[np.ndarray] = None) -> "OcTree":
        """Builds a sparse octree from a point cloud
        (octree.py:733-805 parity; C++ when available).

        1-D ``data`` (one scalar per point, as the reference's
        data[index].mean(0) accepted) is treated as a single-column
        payload; leaf data then has shape (num_leaves, 1).
        """
        if data is not None:
            data = np.asarray(data)
            if data.ndim == 1:
                data = data[:, None]
        positions = np.asarray(positions, np.float32).copy()
        min_pos = positions.min(0)
        max_pos = positions.max(0)
        scale = float((max_pos - min_pos).max() * 0.5)
        positions -= 0.5 * (min_pos + max_pos)

        lib = load_library()
        if lib is not None:
            import ctypes
            data_arr = (np.ascontiguousarray(data, np.float64)
                        if data is not None else np.zeros((0, 0)))
            data_dim = 0 if data is None else data_arr.shape[1]
            positions = np.ascontiguousarray(positions)
            handle = lib.octree_build(
                positions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                len(positions),
                data_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                data_dim, depth, min_leaf_size, scale)
            try:
                counts = (ctypes.c_int64(), ctypes.c_int64(),
                          ctypes.c_int64())
                lib.octree_counts(handle, *(ctypes.byref(c)
                                            for c in counts))
                num_nodes, num_leaves, dim = (c.value for c in counts)
                node_ids = np.zeros(num_nodes, np.int64)
                leaf_ids = np.zeros(num_leaves, np.int64)
                leaf_data = np.zeros((num_leaves, max(dim, 1)),
                                     np.float64)
                lib.octree_export(
                    handle,
                    node_ids.ctypes.data_as(
                        ctypes.POINTER(ctypes.c_int64)),
                    leaf_ids.ctypes.data_as(
                        ctypes.POINTER(ctypes.c_int64)),
                    leaf_data.ctypes.data_as(
                        ctypes.POINTER(ctypes.c_double)))
            finally:
                lib.octree_release(handle)
            payload = leaf_data if data is not None else None
        else:
            node_ids, leaf_ids, payload = build_from_samples_numpy(
                positions, depth, min_leaf_size,
                None if data is None
                else np.asarray(data, np.float64), scale)

        return OcTree(scale, node_ids.tolist(), leaf_ids.tolist(),
                      payload)

    @staticmethod
    def build_from_mesh(mesh_path: str, voxel_depth: int,
                        min_leaf_size: int, up_dir=(0, 1, 0)) -> "OcTree":
        """Builds an octree by low-discrepancy sampling of a textured
        mesh surface (octree.py:807-853 parity). Requires ``trimesh``."""
        from .mesh import build_octree_from_mesh
        return build_octree_from_mesh(mesh_path, voxel_depth,
                                      min_leaf_size, up_dir)

    def prune(self) -> "OcTree":
        """Merges all deepest-level leaves into their parents
        (octree.py:635-671 parity, payload averaged)."""
        if self._leaf_data is None:
            leaf_data = np.zeros((self.num_leaves, 1))
            no_data = True
        else:
            leaf_data = self._leaf_data
            no_data = False

        max_depth = self.depth - 1
        node_ids = set(self._node_index.tolist())
        new_data: Dict[int, np.ndarray] = {}
        new_counts: Dict[int, int] = {}
        for leaf_id, depth, data in zip(self._leaf_index.tolist(),
                                        self._leaf_depths, leaf_data):
            if depth < max_depth:
                new_data[leaf_id] = data
                new_counts[leaf_id] = 1
                continue
            parent = (leaf_id - 1) >> 3
            if parent not in new_data:
                node_ids.discard(parent)
                new_data[parent] = np.zeros_like(data)
                new_counts[parent] = 0
            new_data[parent] = new_data[parent] + data
            new_counts[parent] += 1

        leaf_ids = sorted(new_data)
        payload = None if no_data else np.stack(
            [new_data[i] / new_counts[i] for i in leaf_ids])
        return OcTree(self._scale, node_ids, leaf_ids, payload)

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------

    @property
    def state_dict(self) -> Dict[str, np.ndarray]:
        """State needed to reconstruct the tree (octree.py:868-880)."""
        state = {
            "node_index": self._node_index,
            "leaf_index": self._leaf_index,
            "scale": self._scale,
        }
        if self._leaf_data is not None:
            state["leaf_data"] = self._leaf_data
        return state

    def save(self, path: str):
        """Saves the tree as NPZ."""
        np.savez(path, **self.state_dict)

    @staticmethod
    def load(path_or_data: Union[str, Dict[str, np.ndarray]]) -> "OcTree":
        """Loads a tree from an NPZ path or a state dict."""
        if isinstance(path_or_data, str):
            if not os.path.exists(path_or_data):
                raise FileNotFoundError(path_or_data)
            data = np.load(path_or_data)
        else:
            data = path_or_data
        scale = float(data["scale"])
        leaf_data = data["leaf_data"] if "leaf_data" in data else None
        return OcTree(scale, data["node_index"].tolist(),
                      data["leaf_index"].tolist(), leaf_data)

    def load_state(self, state_dict: Dict[str, np.ndarray]):
        """Re-initializes from a state dict (octree.py:922-927)."""
        self._update(state_dict["node_index"].tolist(),
                     state_dict["leaf_index"].tolist(),
                     float(state_dict["scale"]))
        self._leaf_data = state_dict.get("leaf_data")
