"""Golden-value and torch-parity tests for the numeric core ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourier_feature_nets_tpu import ops


class TestBlendWeights:
    def test_golden_single_ray(self):
        """Hand-computed case following utils.py:72-97 semantics."""
        t = jnp.array([[1.0, 2.0, 3.0]])
        sigma = jnp.array([[0.5, 1.0, 2.0]])
        # deltas = [1, 1, 1e10]
        alpha = 1 - np.exp(-np.array([0.5, 1.0, 2.0e10]))
        trans = np.minimum(1.0, 1 - alpha + 1e-10)
        trans = np.concatenate([[1.0], np.cumprod(trans[:-1])])
        expected = alpha * trans
        actual = ops.calculate_blend_weights(t, sigma)
        np.testing.assert_allclose(np.asarray(actual)[0], expected,
                                   rtol=1e-5)

    def test_weights_sum_to_one_with_opaque_tail(self):
        """The 1e10 final delta makes any positive opacity fully absorb."""
        t = jnp.linspace(0.5, 3.5, 16)[None]
        sigma = jnp.full((1, 16), 0.2)
        weights = ops.calculate_blend_weights(t, sigma)
        assert float(jnp.sum(weights)) == pytest.approx(1.0, abs=1e-5)

    def test_zero_opacity_gives_zero_weights(self):
        t = jnp.linspace(0.5, 3.5, 8)[None]
        sigma = jnp.zeros((1, 8))
        weights = ops.calculate_blend_weights(t, sigma)
        np.testing.assert_allclose(np.asarray(weights), 0.0, atol=1e-7)

    def test_torch_parity(self, rng):
        """Cross-check against a direct torch transcription of the formula."""
        torch = pytest.importorskip("torch")
        t = np.sort(rng.uniform(0.1, 4.0, (5, 32)), axis=-1)
        sigma = rng.uniform(0, 3.0, (5, 32)).astype(np.float32)
        t = t.astype(np.float32)

        tt, ts = torch.from_numpy(t), torch.from_numpy(sigma)
        deltas = torch.cat([tt[:, 1:] - tt[:, :-1],
                            torch.full_like(tt[:, :1], 1e10)], -1)
        alpha = 1 - torch.exp(-(ts * deltas))
        trans = torch.minimum(torch.ones_like(alpha), 1 - alpha + 1e-10)
        trans = torch.cat([torch.ones_like(trans[:, :1]),
                           trans[:, :-1]], -1)
        expected = (alpha * torch.cumprod(trans, -1)).numpy()

        actual = np.asarray(ops.calculate_blend_weights(jnp.asarray(t),
                                                        jnp.asarray(sigma)))
        np.testing.assert_allclose(actual, expected, rtol=1e-4, atol=1e-5)


class TestExclusiveCumprod:
    def test_basic(self):
        x = jnp.array([[2.0, 3.0, 4.0]])
        out = ops.exclusive_cumprod(x)
        np.testing.assert_allclose(np.asarray(out), [[1.0, 2.0, 6.0]])


class TestRayAABB:
    def test_axis_ray_hits_unit_cube(self):
        starts = jnp.array([[0.0, 0.0, -5.0]])
        dirs = jnp.array([[0.0, 0.0, 1.0]])
        nf = ops.ray_aabb_near_far(starts, dirs,
                                   jnp.array([-1.0, -1.0, -1.0]),
                                   jnp.array([1.0, 1.0, 1.0]))
        assert bool(nf.valid[0])
        assert float(nf.near[0]) == pytest.approx(4.0)
        assert float(nf.far[0]) == pytest.approx(6.0)

    def test_miss_is_invalid(self):
        starts = jnp.array([[0.0, 5.0, -5.0]])
        dirs = jnp.array([[0.0, 0.0, 1.0]])
        nf = ops.ray_aabb_near_far(starts, dirs,
                                   jnp.array([-1.0, -1.0, -1.0]),
                                   jnp.array([1.0, 1.0, 1.0]))
        assert not bool(nf.valid[0])

    def test_near_clamped_to_min(self):
        """Rays starting inside the volume get near >= 0.1."""
        starts = jnp.array([[0.0, 0.0, 0.0]])
        dirs = jnp.array([[0.0, 0.0, 1.0]])
        nf = ops.ray_aabb_near_far(starts, dirs,
                                   jnp.array([-1.0, -1.0, -1.0]),
                                   jnp.array([1.0, 1.0, 1.0]))
        assert bool(nf.valid[0])
        assert float(nf.near[0]) == pytest.approx(0.1)

    def test_zero_direction_component(self):
        """Parallel rays: div-by-zero must not poison the slab test."""
        starts = jnp.array([[0.5, 0.0, -5.0], [2.0, 0.0, -5.0]])
        dirs = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        nf = ops.ray_aabb_near_far(starts, dirs,
                                   jnp.array([-1.0, -1.0, -1.0]),
                                   jnp.array([1.0, 1.0, 1.0]))
        assert bool(nf.valid[0])       # inside the x-slab
        assert not bool(nf.valid[1])   # outside the x-slab, parallel

    def test_origin_on_face_with_zero_direction_is_invalid(self):
        """0/0 slab (origin ON a face, direction parallel to it): the
        reference's NaN-propagating max/min marks the ray invalid; we
        must match that while keeping near/far finite."""
        starts = jnp.array([[1.0, 0.0, -5.0],    # on the max-x face
                            [-1.0, 0.0, -5.0]])  # on the min-x face
        dirs = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        nf = ops.ray_aabb_near_far(starts, dirs,
                                   jnp.array([-1.0, -1.0, -1.0]),
                                   jnp.array([1.0, 1.0, 1.0]))
        assert not bool(nf.valid[0])
        assert not bool(nf.valid[1])
        # unlike the reference, no NaN leaks into downstream masked math
        assert not bool(jnp.any(jnp.isnan(nf.near)))
        assert not bool(jnp.any(jnp.isnan(nf.far)))

    def test_numpy_reference_parity(self, rng):
        """Random rays against a NumPy slab-method oracle."""
        starts = rng.uniform(-3, 3, (256, 3)).astype(np.float32)
        dirs = rng.normal(size=(256, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        lo = np.array([-1.0, -1.5, -0.5], np.float32)
        hi = np.array([1.0, 0.5, 1.5], np.float32)

        with np.errstate(divide="ignore", invalid="ignore"):
            t0 = (lo - starts) / dirs
            t1 = (hi - starts) / dirs
        near = np.minimum(t0, t1).max(-1)
        far = np.maximum(t0, t1).min(-1)
        valid = near < far
        near[valid] = np.maximum(0.1, near[valid])

        nf = ops.ray_aabb_near_far(jnp.asarray(starts), jnp.asarray(dirs),
                                   jnp.asarray(lo), jnp.asarray(hi))
        np.testing.assert_array_equal(np.asarray(nf.valid), valid)
        np.testing.assert_allclose(np.asarray(nf.near)[valid], near[valid],
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(nf.far)[valid], far[valid],
                                   rtol=1e-4)

    def test_bounds_min_max(self):
        bounds = np.diag([4.0, 4.0, 4.0, 1.0]).astype(np.float32)
        lo, hi = ops.bounds_min_max(bounds)
        np.testing.assert_allclose(lo, [-2, -2, -2])
        np.testing.assert_allclose(hi, [2, 2, 2])


class TestSampling:
    def test_batch_linspace(self):
        out = ops.batch_linspace(jnp.array([0.0, 10.0]),
                                 jnp.array([1.0, 20.0]), 5)
        np.testing.assert_allclose(np.asarray(out)[0],
                                   [0, 0.25, 0.5, 0.75, 1.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(out)[1],
                                   [10, 12.5, 15, 17.5, 20], atol=1e-5)

    def test_uniform_deterministic(self):
        t = ops.uniform_t_values(jnp.array([1.0]), jnp.array([3.0]), 5)
        np.testing.assert_allclose(np.asarray(t)[0], [1, 1.5, 2, 2.5, 3],
                                   atol=1e-6)

    def test_stratified_within_bin(self):
        near, far = jnp.array([1.0]), jnp.array([3.0])
        base = ops.uniform_t_values(near, far, 8)
        jittered = ops.uniform_t_values(near, far, 8,
                                        jax.random.PRNGKey(0))
        delta = np.asarray(jittered - base)
        bin_width = 2.0 / 8
        assert (delta >= 0).all() and (delta <= bin_width).all()

    def test_anneal_midpoint_shrink(self):
        near, far = jnp.array([1.0]), jnp.array([3.0])
        n, f = ops.anneal_near_far(near, far, 0, 0.5, 100)
        assert float(n[0]) == pytest.approx(1.5)
        assert float(f[0]) == pytest.approx(2.5)
        # past the anneal window: unchanged
        n, f = ops.anneal_near_far(near, far, 100, 0.5, 100)
        assert float(n[0]) == pytest.approx(1.0)
        assert float(f[0]) == pytest.approx(3.0)

    def test_anneal_disabled(self):
        near, far = jnp.array([1.0]), jnp.array([3.0])
        n, f = ops.anneal_near_far(near, far, 0, 0.5, 0)
        assert float(n[0]) == 1.0 and float(f[0]) == 3.0

    def test_determine_cdf_properties(self, rng):
        t = np.sort(rng.uniform(0.5, 4.0, (4, 32)), -1).astype(np.float32)
        sigma = rng.uniform(0, 2, (4, 32)).astype(np.float32)
        cdf = np.asarray(ops.determine_cdf(jnp.asarray(t),
                                           jnp.asarray(sigma)))
        assert cdf.shape == (4, 31)
        np.testing.assert_allclose(cdf[:, 0], 0.0, atol=1e-7)
        np.testing.assert_allclose(cdf[:, -1], 1.0, rtol=1e-5)
        assert (np.diff(cdf, axis=-1) >= 0).all()

    def test_inverse_cdf_uniform_weights_recover_linear(self):
        """A flat CDF must map even quantiles to evenly spaced depths."""
        near = jnp.array([1.0])
        far = jnp.array([3.0])
        num_cdf = 65
        cdf = jnp.linspace(0, 1, num_cdf - 1)[None]
        t = ops.inverse_cdf_t_values(near, far, cdf, 16, num_cdf)
        t = np.asarray(t)[0]
        mids_lo = 1.0 + (3.0 - 1.0) / (num_cdf - 1) / 2
        mids_hi = 3.0 - (3.0 - 1.0) / (num_cdf - 1) / 2
        np.testing.assert_allclose(t, np.linspace(mids_lo, mids_hi, 16),
                                   rtol=1e-4)

    def test_inverse_cdf_concentrates_samples(self):
        """Mass concentrated in one bin pulls samples into that bin."""
        near = jnp.array([0.0])
        far = jnp.array([1.0])
        weights = np.full(15, 1e-5, np.float32)
        weights[7] = 1.0
        cdf = np.concatenate([[0], np.cumsum(weights) / weights.sum()])
        t = ops.inverse_cdf_t_values(near, far, jnp.asarray(cdf)[None],
                                     64, 17, jax.random.PRNGKey(1))
        t = np.asarray(t)[0]
        # bin 7 of the midpoint grid spans roughly [7.5/16, 9/16]
        assert (np.abs(t - 0.5) < 0.1).mean() > 0.9

    def test_sample_positions(self):
        starts = jnp.array([[1.0, 0.0, 0.0]])
        dirs = jnp.array([[0.0, 1.0, 0.0]])
        t = jnp.array([[2.0, 3.0]])
        pos = ops.sample_positions(starts, dirs, t)
        np.testing.assert_allclose(np.asarray(pos),
                                   [[[1, 2, 0], [1, 3, 0]]], atol=1e-6)


class TestEncoding:
    def test_positional_matrix_shape_and_values(self):
        b = ops.positional_encoding_matrix(2.0, 3, 2)
        assert b.shape == (2, 6)
        # frequencies 2^0, 2^1, 2^2 on the diagonal blocks
        np.testing.assert_allclose(b[0], [1, 0, 2, 0, 4, 0])
        np.testing.assert_allclose(b[1], [0, 1, 0, 2, 0, 4])

    def test_positional_matrix_torch_parity(self):
        torch = pytest.importorskip("torch")
        max_log_scale, num_freq, num_inputs = 9.0, 10, 3
        freqs = 2.0 ** torch.linspace(0, max_log_scale, num_freq)
        fm = freqs.reshape(-1, 1, 1) * torch.eye(num_inputs)
        expected = fm.reshape(-1, num_inputs).T.numpy()
        actual = ops.positional_encoding_matrix(max_log_scale, num_freq,
                                                num_inputs)
        np.testing.assert_allclose(actual, expected, rtol=1e-6)

    def test_fourier_encode_golden(self):
        x = jnp.array([[0.5]])
        b = jnp.array([[1.0, 2.0]])
        a = jnp.array([1.0, 0.5])
        out = np.asarray(ops.fourier_encode(x, b, a))
        e = np.pi * 0.5 * np.array([1.0, 2.0])
        expected = np.concatenate([np.array([1.0, 0.5]) * np.cos(e),
                                   np.array([1.0, 0.5]) * np.sin(e)])
        np.testing.assert_allclose(out[0], expected, rtol=1e-6, atol=1e-6)

    def test_encode_scale_one_for_nerf(self):
        x = jnp.array([[0.25, 0.5, -0.5]])
        b = jnp.asarray(ops.positional_encoding_matrix(1.0, 2, 3))
        out = np.asarray(ops.fourier_encode(x, b, scale=1.0))
        e = np.asarray(x @ b)
        np.testing.assert_allclose(
            out, np.concatenate([np.cos(e), np.sin(e)], -1), rtol=1e-6)


class TestGridSample:
    def test_torch_parity(self, rng):
        """Must match F.grid_sample(border, align_corners=False) exactly."""
        torch = pytest.importorskip("torch")
        side = 7
        grid = rng.normal(size=(side, side, side, 4)).astype(np.float32)
        coords = rng.uniform(-1.3, 1.3, (512, 3)).astype(np.float32)

        ours = np.asarray(ops.grid_sample_3d(jnp.asarray(grid),
                                             jnp.asarray(coords)))

        tgrid = torch.from_numpy(np.moveaxis(grid, -1, 0))[None]  # 1,C,D,H,W
        tcoords = torch.from_numpy(coords).reshape(1, -1, 1, 1, 3)
        theirs = torch.nn.functional.grid_sample(
            tgrid, tcoords, padding_mode="border", align_corners=False)
        theirs = theirs.reshape(4, -1).T.numpy()

        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_center_sample(self):
        grid = jnp.ones((4, 4, 4, 2)) * jnp.array([3.0, 5.0])
        out = np.asarray(ops.grid_sample_3d(grid, jnp.zeros((1, 3))))
        np.testing.assert_allclose(out, [[3.0, 5.0]], rtol=1e-6)


class TestInterpolateBilinear:
    def test_constant_grid(self):
        grid = jnp.full((8, 8, 3), 2.0)
        pts = jnp.array([[0.3, 0.7], [0.9, 0.1]])
        out = np.asarray(ops.interpolate_bilinear(grid, pts))
        np.testing.assert_allclose(out, 2.0, rtol=1e-6)

    def test_numpy_oracle(self, rng):
        """Parity with a NumPy transcription of utils.py:197-241."""
        grid = rng.normal(size=(16, 24, 3)).astype(np.float32)
        q = rng.uniform(0, 1, (64, 2)).astype(np.float32)

        h, w, _ = grid.shape
        col, row = q[:, 0] * w, q[:, 1] * h
        i0, j0 = np.floor(row).astype(int), np.floor(col).astype(int)
        di, dj = (row - i0)[:, None], (col - j0)[:, None]
        i1, j1 = np.clip(i0 + 1, 0, h - 1), np.clip(j0 + 1, 0, w - 1)
        i0, j0 = np.clip(i0, 0, h - 1), np.clip(j0, 0, w - 1)
        expected = ((1 - di) * (1 - dj) * grid[i0, j0]
                    + (1 - di) * dj * grid[i0, j1]
                    + di * (1 - dj) * grid[i1, j0]
                    + di * dj * grid[i1, j1])

        out = np.asarray(ops.interpolate_bilinear(jnp.asarray(grid),
                                                  jnp.asarray(q)))
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


class TestMetrics:
    def test_psnr(self):
        pred = jnp.full((10,), 0.5)
        target = jnp.full((10,), 0.6)
        expected = -10 * np.log10(0.01)
        assert float(ops.psnr(pred, target)) == pytest.approx(expected,
                                                              rel=1e-4)


class TestGatherFreeInverseCDF:
    """The masked-min/max bracketing must match the textbook
    searchsorted + take_along_axis formulation bit-for-bit."""

    @staticmethod
    def _reference(t_edges, cdf, quantiles):
        t_edges, cdf, quantiles = map(np.asarray, (t_edges, cdf, quantiles))
        out = np.empty_like(quantiles)
        for r in range(quantiles.shape[0]):
            index = np.searchsorted(cdf[r], quantiles[r], side="right")
            i = np.maximum(index - 1, 0)
            j = np.minimum(index, cdf.shape[-1] - 1)
            denom = cdf[r, j] - cdf[r, i]
            denom = np.where(denom < 1e-9, 1.0, denom)
            frac = (quantiles[r] - cdf[r, i]) / denom
            out[r] = t_edges[r, i] + frac * (t_edges[r, j] - t_edges[r, i])
        return out

    def test_matches_searchsorted_random(self, rng):
        bins = 16
        weights = rng.random((32, bins)).astype(np.float32) + 1e-3
        cdf = np.cumsum(weights, -1)
        cdf = cdf / cdf[:, -1:]
        cdf = np.concatenate([np.zeros((32, 1), np.float32), cdf], -1)
        edges = np.sort(rng.random((32, bins + 1)).astype(np.float32), -1)
        got = np.asarray(ops.inverse_cdf_from_bins(
            jnp.asarray(edges), jnp.asarray(cdf), 24))
        quantiles = np.broadcast_to(
            np.linspace(0, 1, 24, dtype=np.float32), (32, 24))
        want = self._reference(edges, cdf, quantiles)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_edge_quantiles(self):
        """q == 0 and q == 1 exactly (the clamp paths)."""
        edges = jnp.asarray([[0.0, 1.0, 2.0]])
        cdf = jnp.asarray([[0.0, 0.25, 1.0]])
        t = np.asarray(ops.inverse_cdf_from_bins(edges, cdf, 3))[0]
        np.testing.assert_allclose(t, [0.0, 1.33333337, 2.0], rtol=1e-5)

    def test_flat_cdf_regions(self):
        """Repeated cdf values (empty bins) bracket like searchsorted."""
        edges = np.linspace(0, 1, 9, dtype=np.float32)[None].repeat(4, 0)
        cdf = np.asarray([[0, 0, 0, 0.5, 0.5, 0.5, 1, 1, 1]],
                         np.float32).repeat(4, 0)
        quantiles = np.broadcast_to(
            np.linspace(0, 1, 12, dtype=np.float32), (4, 12))
        got = np.asarray(ops.inverse_cdf_from_bins(
            jnp.asarray(edges), jnp.asarray(cdf), 12))
        want = self._reference(edges, cdf, quantiles)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestMergeSorted:
    """ops.merge_sorted: sort-free union of two sorted sequences."""

    def test_matches_sort(self, rng):
        a = np.sort(rng.uniform(0, 10, (32, 7)).astype(np.float32), -1)
        b = np.sort(rng.uniform(0, 10, (32, 5)).astype(np.float32), -1)
        got = np.asarray(ops.merge_sorted(jnp.asarray(a), jnp.asarray(b)))
        want = np.sort(np.concatenate([a, b], -1), -1)
        # a permutation, not arithmetic: exact equality required
        np.testing.assert_array_equal(got, want)

    def test_ties_and_duplicates(self):
        a = jnp.asarray([[1.0, 2.0, 2.0, 5.0]])
        b = jnp.asarray([[2.0, 2.0, 3.0]])
        got = np.asarray(ops.merge_sorted(a, b))[0]
        np.testing.assert_array_equal(got, [1, 2, 2, 2, 2, 3, 5])

    def test_under_jit_and_grad(self):
        """merge is a permutation: gradients flow through unchanged."""
        a = jnp.asarray([[0.0, 2.0]])
        b = jnp.asarray([[1.0]])

        def f(a, b):
            return jnp.sum(ops.merge_sorted(a, b) * jnp.asarray([1., 2., 3.]))

        ga, gb = jax.jit(jax.grad(f, argnums=(0, 1)))(a, b)
        np.testing.assert_allclose(np.asarray(ga), [[1.0, 3.0]])
        np.testing.assert_allclose(np.asarray(gb), [[2.0]])


class TestPerRayUniform:
    """ops.per_ray_uniform: layout-invariant stratified RNG."""

    def test_layout_invariant(self):
        key = jax.random.PRNGKey(7)
        idx = jnp.asarray([3, 1, 4, 1, 5, 9, 2, 6], jnp.int32)
        full = np.asarray(ops.per_ray_uniform(key, idx, 4))
        # any re-ordering / sharding of the batch draws the same values
        perm = np.asarray([5, 2, 0, 7, 1, 3, 4, 6])
        shuffled = np.asarray(ops.per_ray_uniform(key, idx[perm], 4))
        np.testing.assert_array_equal(shuffled, full[perm])
        # shards (as shard_map would see them) also agree
        lo = np.asarray(ops.per_ray_uniform(key, idx[:4], 4))
        np.testing.assert_array_equal(lo, full[:4])

    def test_salt_decorrelates(self):
        key = jax.random.PRNGKey(7)
        idx = jnp.arange(8, dtype=jnp.int32)
        a = np.asarray(ops.per_ray_uniform(key, idx, 4, salt=0))
        b = np.asarray(ops.per_ray_uniform(key, idx, 4, salt=1))
        assert not np.array_equal(a, b)
        assert (a >= 0).all() and (a < 1).all()
