"""Octree tests: id arithmetic, build, query, intersect — C++ vs
NumPy vs on-device JAX cross-validation."""

import numpy as np
import pytest

from fourier_feature_nets_tpu.octree import OcTree
from fourier_feature_nets_tpu.octree.build import load_library
from fourier_feature_nets_tpu.octree.host import (
    build_from_samples_numpy,
    decode_ids_numpy,
)
from fourier_feature_nets_tpu.octree.mesh import (
    sample_regular_barys,
    van_der_corput,
)


@pytest.fixture(scope="module")
def cloud():
    """Two clusters + a shell: a cloud with clear sparse structure."""
    rng = np.random.default_rng(7)
    a = rng.normal([0.5, 0.5, 0.5], 0.1, (2000, 3))
    b = rng.normal([-0.5, -0.2, 0.3], 0.15, (2000, 3))
    theta = rng.uniform(0, 2 * np.pi, 1000)
    phi = rng.uniform(0, np.pi, 1000)
    shell = 0.9 * np.stack([np.sin(phi) * np.cos(theta),
                            np.sin(phi) * np.sin(theta),
                            np.cos(phi)], -1)
    return np.concatenate([a, b, shell]).astype(np.float32)


@pytest.fixture(scope="module")
def tree(cloud):
    data = np.concatenate([cloud, np.ones_like(cloud[:, :1])], -1)
    return OcTree.build_from_samples(cloud, depth=6, min_leaf_size=4,
                                     data=data)


class TestIdArithmetic:
    def test_decode_root_children(self):
        centers, depths = decode_ids_numpy(np.arange(1, 9), 2.0)
        np.testing.assert_array_equal(depths, 1)
        # child ids 1..8 = octants 0..7; bit pattern X=4, Y=2, Z=1
        np.testing.assert_allclose(centers[0], [-1, -1, -1])
        np.testing.assert_allclose(centers[7], [1, 1, 1])
        np.testing.assert_allclose(centers[4], [1, -1, -1])  # X_POS
        np.testing.assert_allclose(centers[2], [-1, 1, -1])  # Y_POS
        np.testing.assert_allclose(centers[1], [-1, -1, 1])  # Z_POS

    def test_decode_grandchild(self):
        # child 8 (octant 7 -> +++), its child octant 0 (---):
        # id = 8*8 + 1 = 65
        centers, depths = decode_ids_numpy(np.array([65]), 2.0)
        assert depths[0] == 2
        np.testing.assert_allclose(centers[0], [0.5, 0.5, 0.5])

    def test_native_decode_matches_numpy(self):
        lib = load_library()
        if lib is None:
            pytest.skip("no native library")
        import ctypes
        ids = np.array([0, 1, 8, 9, 64, 65, 72, 585, 4681], np.int64)
        centers = np.zeros((len(ids), 3), np.float32)
        depths = np.zeros(len(ids), np.int32)
        lib.octree_decode_ids(
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(ids), 1.5,
            centers.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            depths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        exp_centers, exp_depths = decode_ids_numpy(ids, 1.5)
        np.testing.assert_allclose(centers, exp_centers, atol=1e-6)
        np.testing.assert_array_equal(depths, exp_depths)


class TestBuild:
    def test_native_library_builds(self):
        assert load_library() is not None, "g++ build must succeed here"

    def test_build_basic_properties(self, tree):
        assert tree.num_leaves > 10
        assert tree.depth <= 6
        assert len(tree) > tree.num_leaves
        assert tree.leaf_centers().shape == (tree.num_leaves, 3)
        assert tree.leaf_data().shape[0] == tree.num_leaves

    def test_cpp_matches_numpy_build(self, cloud):
        if load_library() is None:
            pytest.skip("no native library")
        data = np.ones((len(cloud), 2))
        t_cpp = OcTree.build_from_samples(cloud, 5, 8, data)

        centered = cloud.copy()
        lo, hi = centered.min(0), centered.max(0)
        scale = float((hi - lo).max() * 0.5)
        centered -= 0.5 * (lo + hi)
        node_ids, leaf_ids, leaf_data = build_from_samples_numpy(
            centered, 5, 8, data.astype(np.float64), scale)

        np.testing.assert_array_equal(t_cpp._leaf_index, leaf_ids)
        np.testing.assert_array_equal(t_cpp._node_index, node_ids)
        np.testing.assert_allclose(t_cpp.leaf_data(), leaf_data,
                                   rtol=1e-9)

    def test_leaf_data_averages_payload(self, cloud, tree):
        """Leaf payload = mean of contained point payloads: the
        position channels (shifted to the tree's centered frame)
        should land inside the leaf cell."""
        shift = 0.5 * (cloud.min(0) + cloud.max(0))
        centers = tree.leaf_centers()
        payload = tree.leaf_data()[:, :3] - shift
        half = tree.scale / (2.0 ** tree.leaf_depths())
        err = np.abs(payload - centers).max(-1)
        assert (err <= half[:, None].reshape(-1) * (1 + 1e-5) + 1e-5).all()


class TestQuery:
    def test_query_leaf_centers_hit_themselves(self, tree):
        result = tree.query(tree.leaf_centers())
        np.testing.assert_array_equal(result, np.arange(tree.num_leaves))

    def test_query_out_of_bounds(self, tree):
        result = tree.query(np.array([[10.0, 10.0, 10.0]]))
        assert result[0] == -1

    def test_device_query_matches_host(self, tree, rng):
        points = rng.uniform(-tree.scale, tree.scale,
                             (512, 3)).astype(np.float32)
        host = tree.query(points)
        device = np.asarray(tree.query_device(points))
        np.testing.assert_array_equal(host, device)


class TestIntersect:
    def test_intersect_shapes_and_monotonic(self, tree, rng):
        starts = np.tile(np.array([[0.0, 0.0, -3.0]], np.float32),
                         (16, 1))
        dirs = rng.normal(size=(16, 3)).astype(np.float32)
        dirs[:, 2] = np.abs(dirs[:, 2]) + 0.5
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        path = tree.intersect(starts, dirs, max_length=64)
        assert path.t_stops.shape == (16, 64)
        assert path.leaves.shape == (16, 64)
        assert (np.diff(path.t_stops, axis=-1) >= -1e-6).all()

    def test_intersect_leaves_match_query_at_midpoints(self, tree, rng):
        """Each recorded interval's midpoint must query to the same
        leaf the tracer reported."""
        starts = np.tile(np.array([[0.0, 0.0, -3.0]], np.float32),
                         (32, 1))
        dirs = rng.normal(0, 0.2, (32, 3)).astype(np.float32)
        dirs[:, 2] = 1.0
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        path = tree.intersect(starts, dirs, max_length=128)

        checked = 0
        for r in range(32):
            t = path.t_stops[r]
            leaves = path.leaves[r]
            for i in range(127):
                if t[i + 1] <= t[i] + 1e-5:
                    continue
                mid = starts[r] + 0.5 * (t[i] + t[i + 1]) * dirs[r]
                expected = tree.query(mid[None])[0]
                assert expected == leaves[i], (r, i)
                checked += 1
        assert checked > 100

    def test_device_intersect_consistent_with_host(self, tree, rng):
        """Device and host tracers agree on which leaves each ray
        visits (interval boundaries may differ by epsilons)."""
        starts = np.tile(np.array([[0.0, 0.0, -3.0]], np.float32),
                         (8, 1))
        dirs = rng.normal(0, 0.15, (8, 3)).astype(np.float32)
        dirs[:, 2] = 1.0
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        host = tree.intersect(starts, dirs, max_length=96)
        device = tree.intersect_device(starts, dirs, max_length=96)
        dev_leaves = np.asarray(device.leaves)
        for r in range(8):
            hv = [x for x in host.leaves[r] if x >= 0]
            dv = [x for x in dev_leaves[r] if x >= 0]
            # drop consecutive duplicates (epsilon re-entries)
            dedup = lambda xs: [x for i, x in enumerate(xs)  # noqa: E731
                                if i == 0 or xs[i - 1] != x]
            assert dedup(hv) == dedup(dv), r

    def test_ray_missing_volume(self, tree):
        starts = np.array([[0.0, 10.0, -3.0]], np.float32)
        dirs = np.array([[0.0, 0.0, 1.0]], np.float32)
        path = tree.intersect(starts, dirs, max_length=16)
        assert (path.leaves == -1).all()


class TestPrune:
    def test_prune_reduces_depth(self, tree):
        pruned = tree.prune()
        assert pruned.depth == tree.depth - 1
        assert pruned.num_leaves < tree.num_leaves
        # pruned leaves must still tile consistently
        result = pruned.query(pruned.leaf_centers())
        np.testing.assert_array_equal(result,
                                      np.arange(pruned.num_leaves))


class TestPersistence:
    def test_save_load_roundtrip(self, tree, tmp_path):
        path = str(tmp_path / "tree.npz")
        tree.save(path)
        loaded = OcTree.load(path)
        assert loaded.scale == tree.scale
        np.testing.assert_array_equal(loaded._leaf_index,
                                      tree._leaf_index)
        np.testing.assert_array_equal(loaded._node_index,
                                      tree._node_index)
        np.testing.assert_allclose(loaded.leaf_data(), tree.leaf_data())

    def test_load_state(self, tree):
        other = OcTree(1.0, [0], [1, 2, 3, 4, 5, 6, 7, 8])
        other.load_state(tree.state_dict)
        assert other.num_leaves == tree.num_leaves
        assert other.scale == tree.scale


class TestMeshSampling:
    def test_van_der_corput(self):
        vals = van_der_corput(8, base=2)
        np.testing.assert_allclose(
            vals, [0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875, 0.0625])

    def test_barys_valid_and_low_discrepancy(self):
        counts = np.array([64, 32])
        barys = sample_regular_barys(counts)
        assert barys.shape == (96, 3)
        assert (barys >= 0).all() and (barys <= 1).all()
        np.testing.assert_allclose(barys.sum(-1), 1.0, atol=1e-5)
        # low-discrepancy: mean near the centroid
        np.testing.assert_allclose(barys[:64].mean(0), [1 / 3] * 3,
                                   atol=0.05)


class TestReviewRegressions:
    def test_device_query_root_only_tree(self):
        """A root-only tree has an EMPTY node_index; the device query
        must return gracefully instead of crashing on a zero-length
        gather (the C++/reference paths return leaves for the root)."""
        tree = OcTree(1.0, [], [0])
        points = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]],
                          np.float32)
        leaves = np.asarray(tree.query_device(points))
        assert leaves.shape == (2,)
        assert leaves[1] == -1  # outside the volume

    def test_intersect_rejects_mismatched_shapes(self, tree):
        """The C++ kernel sizes its loop from starts alone — a shorter
        directions buffer would be read out of bounds (the reference
        asserts matching ranks, octree.py:722)."""
        starts = np.zeros((4, 3), np.float32)
        directions = np.array([0.0, 0.0, 1.0], np.float32)
        with pytest.raises(ValueError, match="matching shapes"):
            tree.intersect(starts, directions, max_length=8)

    def test_build_accepts_1d_data(self, cloud):
        """Reference build_from_samples accepted per-point SCALAR data
        (data[index].mean(0)); 1-D payloads become one-column leaf
        data."""
        densities = np.linspace(0.0, 1.0, len(cloud)).astype(np.float64)
        tree = OcTree.build_from_samples(cloud, depth=4,
                                         min_leaf_size=4,
                                         data=densities)
        assert tree.leaf_data() is not None
        data = np.asarray(tree.leaf_data())
        assert data.ndim == 2 and data.shape[1] == 1
        assert np.isfinite(data).all()

    def test_device_intersect_advances_at_large_t(self, tree):
        """At t >= ~256 one f32 ulp exceeds the old fixed +1e-5 nudge;
        the march must still make forward progress instead of filling
        every slot with the same stalled cell."""
        starts = np.array([[0.0, 0.0, -1000.0]], np.float32)
        dirs = np.array([[0.0, 0.0, 1.0]], np.float32)
        path = tree.intersect_device(starts, dirs, max_length=64)
        t = np.asarray(path.t_stops)[0]
        leaves = np.asarray(path.leaves)[0]
        # the ray crosses the volume: it must visit real leaves and
        # the recorded depths must strictly increase while active
        active = leaves >= 0
        assert active.any()
        active_t = t[np.asarray(path.leaves)[0] >= -1][: active.sum()]
        diffs = np.diff(t[: max(active.sum(), 2)])
        assert (diffs > 0).all(), t[:16]


def test_normalize_points_antiparallel_up():
    """A y-down asset (up_dir = -y) is a valid input: the reference's
    unguarded Rodrigues (1 + cos) divides by zero and NaNs the whole
    octree; the port must rotate 180 degrees instead."""
    from fourier_feature_nets_tpu.octree.mesh import normalize_points

    rng = np.random.default_rng(0)
    verts = rng.normal(0, 1, (100, 3))
    verts[:, 1] -= 3.0  # clearly "down" in -y
    out = normalize_points(verts, np.array([0.0, -1.0, 0.0]))
    assert np.isfinite(out).all()
    # the formerly-down direction now points up (+y dominates)
    down_most = out[np.argmin(verts[:, 1])]
    up_most = out[np.argmax(verts[:, 1])]
    assert down_most[1] > up_most[1]
