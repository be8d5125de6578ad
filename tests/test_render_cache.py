"""Bounded compiled-frame cache: LRU eviction + server endurance.

A long-lived ``Raycaster`` (the ``RenderServer`` case) caches one
compiled executable per (sampler, chunk size, cull/early-term, pose,
mesh) combination, and each frame entry's closure pins its sampler's
device tables. ``_render_fns`` is a bounded LRU so cycling samplers or
settings cannot grow executables/device memory forever; these tests
assert the bound, that eviction actually releases the sampler, that
re-use after eviction stays correct, and (slow tier) that a server
cycling poses holds a flat memory profile over hundreds of frames.
"""

import gc
import weakref

import jax
import numpy as np
import pytest

import fourier_feature_nets_tpu as ffn
from fourier_feature_nets_tpu.cameras import Resolution
from fourier_feature_nets_tpu.models import Voxels
from fourier_feature_nets_tpu.render import RaySampler
from fourier_feature_nets_tpu.render.raycaster import _LRUCache
from fourier_feature_nets_tpu.utils.camera_paths import orbit


@pytest.fixture(scope="module")
def cameras():
    return orbit(np.array([0.0, 1.0, 0.0]), np.array([0.0, 0.0, 1.0]),
                 3, 40.0, Resolution(12, 12), 3.0)


@pytest.fixture(scope="module")
def bounds():
    return np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)


def test_lru_cache_semantics():
    cache = _LRUCache(2)
    cache["a"] = 1
    cache["b"] = 2
    _ = cache["a"]          # refresh a
    cache["c"] = 3          # evicts b (least recently used)
    assert set(cache) == {"a", "c"}
    cache["a"] = 10         # overwrite does not evict
    assert set(cache) == {"a", "c"}
    assert cache["a"] == 10


def test_frame_cache_bounded_and_samplers_released(cameras, bounds):
    """Cycling many samplers through render_frame keeps the compiled
    cache at its cap and lets evicted samplers be garbage-collected
    (their closure is the only strong reference once the caller drops
    theirs)."""
    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model, render_cache_size=4)

    refs = []
    for _ in range(10):
        sampler = RaySampler(bounds, cameras, num_samples=8)
        caster.render_frame(params, sampler, 0, chunk_size=48)
        refs.append(weakref.ref(sampler))
        del sampler

    assert len(caster._render_fns) <= 4
    gc.collect()
    dead = sum(ref() is None for ref in refs)
    # all but the cached tail must have been released
    assert dead >= len(refs) - 4, (dead, len(refs))
    # ...and the cached tail must still be ALIVE: the compiled
    # closures pin their samplers, which is what makes the
    # ("frame", id(sampler), ...) cache key sound — a collected
    # sampler's id() can be recycled by a new object, which would
    # then hit a stale executable with the wrong rig geometry
    assert all(ref() is not None for ref in refs[-4:]), \
        [ref() for ref in refs[-4:]]


def test_render_correct_after_eviction(cameras, bounds):
    """A sampler whose entry was evicted re-compiles and produces the
    same frame (eviction is a perf event, never a correctness one)."""
    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model, render_cache_size=1)

    sampler_a = RaySampler(bounds, cameras, num_samples=8)
    sampler_b = RaySampler(bounds, cameras, num_samples=8)
    first = caster.render_frame(params, sampler_a, 0, chunk_size=48)
    caster.render_frame(params, sampler_b, 0, chunk_size=48)  # evicts A
    assert len(caster._render_fns) == 1
    again = caster.render_frame(params, sampler_a, 0, chunk_size=48)
    np.testing.assert_array_equal(first, again)


@pytest.mark.slow
def test_server_soak_memory_bounded():
    """Endurance: ≥200 frames cycling ≥20 distinct poses through a
    RenderServer — compiled-fn count stays at the cap and host RSS
    stays flat (no per-pose executable/table accumulation)."""
    import resource

    from fourier_feature_nets_tpu.render import RenderServer

    cams = orbit(np.array([0.0, 1.0, 0.0]), np.array([0.0, 0.0, 1.0]),
                 4, 40.0, Resolution(16, 16), 3.0)
    bounds = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model, render_cache_size=4)
    sampler = RaySampler(bounds, cams, num_samples=8, stratified=False)
    server = RenderServer(caster, params, sampler, chunk_size=64)
    server.warmup()

    # 20 distinct poses around the scene (the /pose endpoint path —
    # one executable serves all of them)
    poses = orbit(np.array([0.0, 1.0, 0.0]), np.array([0.0, 0.0, 1.0]),
                  20, 40.0, Resolution(16, 16), 3.0)

    def run_round():
        for camera in range(sampler.num_cameras):
            server.frame(camera)
        for pose_cam in poses:
            server.frame_pose(pose_cam.extrinsics)

    run_round()  # warm every executable once before measuring
    gc.collect()
    rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    rounds = -(-200 // (sampler.num_cameras + len(poses)))
    for _ in range(rounds):
        run_round()
    gc.collect()
    rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    assert len(caster._render_fns) <= 4
    # ru_maxrss is a high-water mark in KB on Linux: flat memory means
    # the soak adds (almost) nothing beyond the warmed-up peak
    assert rss_after - rss_before < 64 * 1024, (rss_before, rss_after)
