"""Single-dispatch frame renderer vs the chunked parity path."""

import jax
import numpy as np
import pytest

import fourier_feature_nets_tpu as ffn
from fourier_feature_nets_tpu.cameras import Resolution
from fourier_feature_nets_tpu.models import NeRF, Voxels
from fourier_feature_nets_tpu.render import RaySampler
from fourier_feature_nets_tpu.utils.camera_paths import orbit


@pytest.fixture(scope="module")
def cameras():
    return orbit(np.array([0.0, 1.0, 0.0]), np.array([0.0, 0.0, 1.0]),
                 3, 40.0, Resolution(20, 20), 3.0)


@pytest.fixture(scope="module")
def bounds():
    return np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)


def test_render_frame_matches_render_image_voxels(cameras, bounds):
    """Whole-frame scan == per-chunk dispatches, non-view model."""
    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model)
    sampler = RaySampler(bounds, cameras, num_samples=16)
    for camera in (0, 2):
        ref = caster.render_image(params, sampler, camera, batch_size=64)
        out = caster.render_frame(params, sampler, camera, chunk_size=96)
        # uint8 quantization of identical float math: allow 1 LSB
        assert out.shape == ref.shape == (20, 20, 3)
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_render_frame_matches_render_image_nerf(cameras, bounds):
    """View-dependent model, chunk not dividing the ray count."""
    model = NeRF(num_layers=2, num_channels=16, max_log_scale_pos=3.0,
                 num_freq_pos=4, max_log_scale_view=1.0, num_freq_view=2,
                 skips=[1], include_inputs=True)
    params = model.init(jax.random.PRNGKey(1))
    caster = ffn.Raycaster(model)
    sampler = RaySampler(bounds, cameras, num_samples=8)
    ref = caster.render_image(params, sampler, 1, batch_size=64)
    out = caster.render_frame(params, sampler, 1, chunk_size=112)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_render_frame_single_compile_across_cameras(cameras, bounds):
    """One compiled executable serves every orbit camera."""
    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model)
    sampler = RaySampler(bounds, cameras, num_samples=8)
    caster.render_frame(params, sampler, 0, chunk_size=100)
    fn, _ = caster._render_fns[
        ("frame", id(sampler), 100, False, False, 2, False, 0.0, 0,
         None)]
    sizes = fn._cache_size()
    caster.render_frame(params, sampler, 1, chunk_size=100)
    caster.render_frame(params, sampler, 2, chunk_size=100)
    assert fn._cache_size() == sizes == 1


def test_render_frame_occupancy_sampler(bounds, cameras):
    """Composes with the occupancy-grid sampler (the fast orbit path)."""
    from fourier_feature_nets_tpu.octree import OcTree
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )
    rng = np.random.default_rng(1)
    points = rng.normal([0.4, 0.0, 0.0], 0.08, (4000, 3))
    anchors = np.array([[-1, -1, -1], [1, 1, 1]], np.float64)
    cloud = np.concatenate([points, anchors]).astype(np.float32)
    tree = OcTree.build_from_samples(cloud, depth=5, min_leaf_size=2)

    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model)
    sampler = OccupancyGridSampler(tree, cameras, num_samples=8,
                                   grid_resolution=16, num_probes=8,
                                   bounds=bounds)
    ref = caster.render_image(params, sampler, 0, batch_size=64)
    out = caster.render_frame(params, sampler, 0, chunk_size=128)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_render_frame_cull_empty(bounds, cameras):
    """Culled == unculled on hit rays; probe-missed rays render black."""
    import jax.numpy as jnp
    from fourier_feature_nets_tpu.octree import OcTree
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )
    rng = np.random.default_rng(2)
    points = rng.normal([0.4, 0.0, 0.0], 0.08, (4000, 3))
    anchors = np.array([[-1, -1, -1], [1, 1, 1]], np.float64)
    cloud = np.concatenate([points, anchors]).astype(np.float32)
    tree = OcTree.build_from_samples(cloud, depth=5, min_leaf_size=2)

    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model)
    sampler = OccupancyGridSampler(tree, cameras, num_samples=8,
                                   grid_resolution=16, num_probes=8,
                                   bounds=bounds)
    culled = caster.render_frame(params, sampler, 0, chunk_size=64,
                                 cull_empty=True, probe_subsample=1)
    full = caster.render_frame(params, sampler, 0, chunk_size=64,
                               cull_empty=False)

    idx = jnp.arange(sampler.rays_per_camera, dtype=jnp.int32)
    _, _, hit = sampler.probe_cdf(idx)
    hit = (np.asarray(hit)
           & sampler.valid[:sampler.rays_per_camera]).reshape(20, 20)
    assert hit.any() and not hit.all()
    # hit rays: identical to the unculled render
    np.testing.assert_array_equal(culled[hit], full[hit])
    # probe-missed rays: exact background
    assert (culled[~hit] == 0).all()

    # coarse probe raster (probe_subsample=2): the dilated coarse hit
    # set must be a SUPERSET of the exact per-ray hit set
    # (conservative culling — rays are only ever added, never lost),
    # and hit rays still match the unculled render exactly. At THIS
    # scene's scale the safety guard would clamp the stride (cells ~1
    # px on screen), so drive the stride-2 raster directly through
    # _frame_fn to keep the code path covered.
    assert ffn.Raycaster._safe_probe_subsample(sampler, 2) == 1
    frame_fn, geometry = caster._frame_fn(sampler, 64, cull=True,
                                          probe_subsample=2)
    coarse = np.asarray(frame_fn(params, jnp.int32(0), geometry))
    np.testing.assert_array_equal(coarse[hit], full[hit])
    # superset ⇒ the coarse path culls no more rays than the exact one
    assert ((coarse == 0).all(-1).sum()
            <= (culled == 0).all(-1).sum())


def test_render_frame_multichip_matches_single(cameras, bounds):
    """shard_map frame render over 8 virtual devices == single-device,
    both plain and culled paths."""
    from fourier_feature_nets_tpu.octree import OcTree
    from fourier_feature_nets_tpu.parallel import make_mesh
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )
    mesh = make_mesh(jax.devices("cpu"))
    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model)

    sampler = RaySampler(bounds, cameras, num_samples=8)
    single = caster.render_frame(params, sampler, 1, chunk_size=96)
    multi = caster.render_frame(params, sampler, 1, chunk_size=96,
                                mesh=mesh)
    assert np.abs(multi.astype(int) - single.astype(int)).max() <= 1

    rng = np.random.default_rng(2)
    cloud = np.concatenate([rng.normal([0.4, 0, 0], 0.08, (4000, 3)),
                            [[-1, -1, -1], [1, 1, 1]]]).astype(np.float32)
    tree = OcTree.build_from_samples(cloud, depth=5, min_leaf_size=2)
    occ = OccupancyGridSampler(tree, cameras, num_samples=8,
                               grid_resolution=16, num_probes=8,
                               bounds=bounds)
    single_c = caster.render_frame(params, occ, 0, chunk_size=64)
    multi_c = caster.render_frame(params, occ, 0, chunk_size=64,
                                  mesh=mesh)
    np.testing.assert_array_equal(multi_c, single_c)

    # early ray termination under shard_map
    single_e = caster.render_frame(params, occ, 0, chunk_size=64,
                                   early_term=1e-12)
    multi_e = caster.render_frame(params, occ, 0, chunk_size=64,
                                  early_term=1e-12, mesh=mesh)
    np.testing.assert_array_equal(multi_e, single_e)
    assert np.abs(single_e.astype(int) - single_c.astype(int)).max() <= 1


def test_probe_subsample_guard(bounds, cameras):
    """The coarse cull-probe raster auto-clamps to stride 1 when
    occupancy cells are too small on screen for 3x3 dilation to stay
    conservative (fine grids / low resolutions), and keeps the
    requested stride when cells span enough pixels."""
    from fourier_feature_nets_tpu.octree import OcTree
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )
    rng = np.random.default_rng(2)
    cloud = np.concatenate([rng.normal([0.4, 0, 0], 0.08, (2000, 3)),
                            [[-1, -1, -1], [1, 1, 1]]]).astype(np.float32)
    tree = OcTree.build_from_samples(cloud, depth=5, min_leaf_size=2)
    fine = OccupancyGridSampler(tree, cameras, num_samples=8,
                                grid_resolution=64, num_probes=8,
                                bounds=bounds)
    # 20px frame, 64-cell grid: a cell is ~a pixel — must clamp
    assert ffn.Raycaster._safe_probe_subsample(fine, 2) == 1
    big_rig = orbit(np.array([0.0, 1.0, 0.0]),
                    np.array([0.0, 0.0, 1.0]), 3, 40.0,
                    Resolution(60, 60), 3.0)
    coarse_grid = OccupancyGridSampler(tree, big_rig, num_samples=8,
                                       grid_resolution=4,
                                       num_probes=8, bounds=bounds)
    # 60px rig + 4-cell grid: a cell spans ~14 px >= 3*stride — keep
    assert ffn.Raycaster._safe_probe_subsample(coarse_grid, 2) == 2
    # plain samplers (no occupancy metadata) pass through
    plain = RaySampler(bounds, cameras, num_samples=8)
    assert ffn.Raycaster._safe_probe_subsample(plain, 2) == 2


def test_lazy_ray_tables(cameras, bounds):
    """Per-ray tables are NOT built by whole-frame rendering (they're
    ~1 GB for an 800px orbit and the gather-free path never reads
    them); index-based access materializes them on demand with
    identical values."""
    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model)

    sampler = RaySampler(bounds, cameras, num_samples=16)
    assert not sampler._ray_tables_ready
    caster.render_frame(params, sampler, 0, chunk_size=96)
    assert not sampler._ray_tables_ready, \
        "render_frame must not materialize per-ray tables"

    # on-demand build via attribute access; values match an eager
    # sampler exactly
    starts = np.asarray(sampler.starts)
    assert sampler._ray_tables_ready
    eager = RaySampler(bounds, cameras, num_samples=16)
    eager.ensure_ray_tables()
    np.testing.assert_array_equal(starts, np.asarray(eager.starts))
    np.testing.assert_array_equal(np.asarray(sampler.directions),
                                  np.asarray(eager.directions))
    np.testing.assert_array_equal(np.asarray(sampler.valid),
                                  np.asarray(eager.valid))

    # unknown attributes still raise cleanly (no __getattr__ loops)
    with pytest.raises(AttributeError):
        sampler.not_an_attribute


def test_render_frame_picks_up_occupancy_refresh(bounds, cameras):
    """``set_occupancy_grid`` promises same-shape refreshes are picked
    up with zero recompiles; the frame cache must therefore re-collect
    the sampler's device arrays per call instead of serving the
    build-time snapshot (regression: a cached geometry dict silently
    rendered through the STALE occupancy grid)."""
    import jax.numpy as jnp
    from fourier_feature_nets_tpu.octree import OcTree
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )
    rng = np.random.default_rng(3)
    points = rng.normal([0.4, 0.0, 0.0], 0.08, (4000, 3))
    anchors = np.array([[-1, -1, -1], [1, 1, 1]], np.float64)
    cloud = np.concatenate([points, anchors]).astype(np.float32)
    tree = OcTree.build_from_samples(cloud, depth=5, min_leaf_size=2)

    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    # an untrained Voxels field renders black (bias logit(1e-5)) —
    # light it up so culled vs unculled frames are distinguishable
    params = {"bias": params["bias"],
              "voxels": jnp.full_like(params["voxels"], 15.0)}
    caster = ffn.Raycaster(model)
    sampler = OccupancyGridSampler(tree, cameras, num_samples=8,
                                   grid_resolution=16, num_probes=8,
                                   bounds=bounds)
    before = caster.render_frame(params, sampler, 0, chunk_size=64,
                                 cull_empty=True, probe_subsample=1)
    assert (before != 0).any()

    # an all-empty refreshed grid must cull EVERY ray (black frame);
    # a stale snapshot would keep rendering the old occupancy
    sampler.set_occupancy_grid(
        np.zeros((sampler._grid_resolution,) * 3, np.float32))
    after = caster.render_frame(params, sampler, 0, chunk_size=64,
                                cull_empty=True, probe_subsample=1)
    assert (after == 0).all(), "stale occupancy snapshot served"
