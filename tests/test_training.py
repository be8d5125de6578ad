"""End-to-end training tests: convergence, crop curriculum,
checkpoint/resume, and hierarchical (opacity-guided) sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fourier_feature_nets_tpu as ffn
from fourier_feature_nets_tpu.datasets.synthetic import (
    generate_synthetic_dataset,
)
from fourier_feature_nets_tpu.models import Voxels
from fourier_feature_nets_tpu.utils import adam_init
from fourier_feature_nets_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_train_state,
    save_train_state,
)


@pytest.fixture(scope="module")
def scene_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "scene.npz"
    return generate_synthetic_dataset(str(path), resolution=40,
                                      split_counts=(6, 2, 1),
                                      volume_side=24, num_samples=96)


@pytest.fixture(scope="module")
def datasets(scene_path):
    train = ffn.ImageDataset.load(scene_path, "train", num_samples=48,
                                  stratified=True)
    val = ffn.ImageDataset.load(scene_path, "val", num_samples=48)
    return train, val


def test_voxel_training_converges(datasets):
    """PSNR must improve substantially within 400 steps."""
    train, val = datasets
    model = Voxels(side=24, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model)
    params, log = caster.fit(params, train, val, batch_size=512,
                             learning_rate=0.05, num_steps=400,
                             crop_steps=0, report_interval=200,
                             decay_rate=0.9, decay_steps=25000)
    first = log[0].val_psnr
    last = log[-1].val_psnr
    assert last > first + 3.0, (first, last)
    assert last > 15.0, last


def test_crop_curriculum_switches_mode(datasets):
    train, val = datasets
    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model)
    params, _ = caster.fit(params, train, val, batch_size=256,
                           learning_rate=0.01, num_steps=25,
                           crop_steps=10, report_interval=20,
                           decay_rate=0.9, decay_steps=25000)
    # after fit, dataset returned to its original (Full) mode
    assert train.mode == ffn.Mode.Full
    assert val.mode == ffn.Mode.Full


class TestCheckpoint:
    def test_train_state_roundtrip(self, tmp_path):
        model = Voxels(side=4, scale=1.0)
        params = model.init(jax.random.PRNGKey(0))
        opt = adam_init(params)
        opt = opt._replace(step=jnp.asarray(17, jnp.int32))
        path = str(tmp_path / "state.npz")
        save_train_state(path, model, params, opt, step=17, seed=3)

        state = load_train_state(path)
        assert state.step == 17
        assert state.seed == 3
        assert int(state.opt_state.step) == 17
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_load_train_state_rejects_weights_only(self, tmp_path):
        """A weights-only save_model NPZ is not resumable; pointing
        load_train_state at one must fail with a clear ValueError, not
        an opaque KeyError on 'opt/step' (ADVICE r3)."""
        from fourier_feature_nets_tpu.models import save_model

        model = Voxels(side=4, scale=1.0)
        params = model.init(jax.random.PRNGKey(0))
        path = str(tmp_path / "weights.npz")
        save_model(model, params, path)

        with pytest.raises(ValueError, match="not a resumable"):
            load_train_state(path)

    def test_load_model_reads_train_state(self, tmp_path):
        """load_model on a resumable checkpoint returns ONLY the model
        weights (serve/orbit/distill point at mid-training checkpoints;
        the opt/ moments must not leak into the params pytree)."""
        from fourier_feature_nets_tpu.models import load_model

        model = Voxels(side=4, scale=1.0)
        params = model.init(jax.random.PRNGKey(0))
        opt = adam_init(params)
        path = str(tmp_path / "ckpt_00000017.npz")
        save_train_state(path, model, params, opt, step=17, seed=3)

        loaded_model, loaded_params = load_model(path)
        assert loaded_model.model_type == model.model_type
        assert jax.tree.structure(loaded_params) == \
            jax.tree.structure(params)
        for a, b in zip(jax.tree.leaves(loaded_params),
                        jax.tree.leaves(params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # and the loaded tree actually drives the model
        points = jnp.zeros((2, 3), jnp.float32)
        loaded_model.apply(loaded_params, points)

    def test_latest_checkpoint(self, tmp_path):
        model = Voxels(side=4, scale=1.0)
        params = model.init(jax.random.PRNGKey(0))
        opt = adam_init(params)
        for step in (100, 300, 200):
            save_train_state(str(tmp_path / f"ckpt_{step:08d}.npz"),
                             model, params, opt, step)
        best = latest_checkpoint(str(tmp_path))
        assert best.endswith("ckpt_00000300.npz")

    def test_fit_resume_continues(self, datasets, tmp_path):
        """Interrupted fit + resumed fit lands at a sane state."""
        train, val = datasets
        model = Voxels(side=8, scale=1.0)
        caster = ffn.Raycaster(model)
        ckpt_dir = str(tmp_path / "ckpts")

        params = model.init(jax.random.PRNGKey(0))
        caster.fit(params, train, val, batch_size=256,
                   learning_rate=0.02, num_steps=40, crop_steps=0,
                   report_interval=100, decay_rate=0.9,
                   decay_steps=25000, checkpoint_dir=ckpt_dir,
                   checkpoint_interval=20)
        assert latest_checkpoint(ckpt_dir) is not None

        params2 = model.init(jax.random.PRNGKey(0))
        final, log = caster.fit(params2, train, val, batch_size=256,
                                learning_rate=0.02, num_steps=60,
                                crop_steps=0, report_interval=10,
                                decay_rate=0.9, decay_steps=25000,
                                checkpoint_dir=ckpt_dir,
                                checkpoint_interval=20, resume=True)
        # resumed from step 40 -> first report happens past it
        assert log[0].step > 20


class TestHierarchicalSampling:
    def test_opacity_model_cdf_and_focus(self, scene_path):
        """A dataset built with an opacity model draws half its
        samples by inverse-CDF and concentrates them on the object."""
        # first train a quick coarse voxel model
        coarse = ffn.ImageDataset.load(scene_path, "train",
                                       num_samples=32)
        val = ffn.ImageDataset.load(scene_path, "val", num_samples=32)
        model = Voxels(side=16, scale=1.0)
        params = model.init(jax.random.PRNGKey(0))
        caster = ffn.Raycaster(model)
        params, _ = caster.fit(params, coarse, val, batch_size=512,
                               learning_rate=0.05, num_steps=200,
                               crop_steps=0, report_interval=200,
                               decay_rate=0.9, decay_steps=25000)

        focused = ffn.ImageDataset.load(scene_path, "train",
                                        num_samples=32,
                                        opacity_model=model,
                                        opacity_params=params,
                                        batch_size=2048)
        sampler = focused.sampler
        assert sampler.focus_sampling
        assert sampler.cdfs.shape == (len(sampler),
                                      sampler.num_focus_samples - 1)

        # rays through the object center should focus samples near it
        idx = sampler._valid_for_camera(0)
        rays = sampler.sample(jnp.asarray(idx), None)
        assert rays.t_values.shape == (len(idx), 32)
        t = np.asarray(rays.t_values)
        assert (np.diff(t, axis=-1) >= -1e-5).all()  # sorted

        # focused samples must differ from the uniform-only dataset
        plain = ffn.ImageDataset.load(scene_path, "train",
                                      num_samples=32)
        rays_plain = plain.sampler.sample(jnp.asarray(idx), None)
        assert not np.allclose(t, np.asarray(rays_plain.t_values))

    def test_focus_sampling_improves_distribution(self, scene_path):
        """Focus samples concentrate where a synthetic opacity model
        places mass."""

        class PeakOpacity:
            """Opacity spike at a known depth band (|x| < 0.2)."""

            use_view = False
            model_type = "fourier"

            def apply(self, params, positions, compute_dtype=None):
                dist = jnp.linalg.norm(positions, axis=-1,
                                       keepdims=True)
                logit = jnp.where(dist < 0.25, 5.0, -20.0)
                return jnp.tile(logit, (1, 4))

        dataset = ffn.ImageDataset.load(scene_path, "train",
                                        num_samples=64,
                                        opacity_model=PeakOpacity(),
                                        opacity_params={},
                                        batch_size=4096)
        sampler = dataset.sampler
        idx = sampler._valid_for_camera(0)
        rays = sampler.sample(jnp.asarray(idx), None)
        positions = np.asarray(rays.positions)
        # for rays whose CDF saw the spike, over half the samples
        # should land within the central sphere region
        dist = np.linalg.norm(positions, axis=-1)
        through_center = dist.min(-1) < 0.2
        if through_center.any():
            frac_near = (dist[through_center] < 0.5).mean()
            assert frac_near > 0.5, frac_near


def test_steps_per_call_chunked_fit(datasets):
    """Chunked (scan) fit trains comparably to single-step fit."""
    train, val = datasets
    results = {}
    for spc in (1, 20):
        model = Voxels(side=12, scale=1.0)
        caster = ffn.Raycaster(model)
        params, log = caster.fit(model.init(jax.random.PRNGKey(0)),
                                 train, val, batch_size=256,
                                 learning_rate=0.05, num_steps=100,
                                 crop_steps=0, report_interval=50,
                                 decay_rate=0.9, decay_steps=25000,
                                 steps_per_call=spc)
        results[spc] = log[-1].val_psnr
    # same budget, same data: within a dB of each other
    assert abs(results[1] - results[20]) < 1.5, results


def test_crop_to_dilate_rebuilds_compiled_step(datasets, monkeypatch):
    """The jitted train step traces the loss under Center mode; Dilate
    DISABLES the alpha term (image_dataset.py:287-296), so the crop
    transition must rebuild the compiled step — the eager reference
    re-evaluates the branch every step (parity). Full-mode runs share
    the Center trace and must NOT pay a recompile."""
    train, val = datasets
    calls = []
    original = ffn.Raycaster._make_train_step

    def counting(self, *args, **kwargs):
        calls.append(1)
        return original(self, *args, **kwargs)

    monkeypatch.setattr(ffn.Raycaster, "_make_train_step", counting)

    def run(mode):
        calls.clear()
        train.mode = mode
        val.mode = mode
        model = Voxels(side=8, scale=1.0)
        caster = ffn.Raycaster(model)
        caster.fit(model.init(jax.random.PRNGKey(0)), train, val,
                   batch_size=256, learning_rate=0.02, num_steps=16,
                   crop_steps=8, report_interval=8, decay_rate=0.9,
                   decay_steps=25000)
        assert train.mode == mode  # restored
        return len(calls)

    try:
        assert run(ffn.Mode.Full) == 1
        assert run(ffn.Mode.Dilate) == 2
    finally:
        # the fixture is module-scoped: leaking Dilate breaks later
        # tests (only visible under `-m slow`, where the intermediate
        # test that happened to restore Full is deselected)
        train.mode = ffn.Mode.Full
        val.mode = ffn.Mode.Full


def test_dilate_loss_differs_from_center(datasets):
    """Premise guard for the rebuild above: Center and Dilate modes
    trace DIFFERENT losses on alpha-carrying data (the alpha term)."""
    import jax.numpy as jnp
    train, _ = datasets
    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model)
    idx = jnp.asarray(np.asarray(train.dilate_index[:64]))
    batches = idx.reshape(1, 64)

    losses = {}
    try:
        for mode in (ffn.Mode.Center, ffn.Mode.Dilate):
            train.mode = mode
            loss_fn = caster._make_loss_fn(train, 64)
            losses[mode] = float(loss_fn(params, batches,
                                         jnp.asarray(0, jnp.int32)))
    finally:
        train.mode = ffn.Mode.Full
    assert losses[ffn.Mode.Center] != losses[ffn.Mode.Dilate], losses


def test_checkpoint_boundary_with_crop_in_same_chunk(datasets,
                                                     monkeypatch):
    """Step-accounting boundary (VERDICT r1 weak #8): with chunk > 1,
    a checkpoint whose interval multiple falls inside the SAME chunk
    as the crop transition must still fire, and every checkpoint must
    be labeled with the last step that actually executed (so resume
    restarts at label + 1 without skipping a step).

    With steps_per_call=5, crop/report/checkpoint interval 10 and
    num_steps=20 the executed windows are [0,4] [5,9] [10,14]
    (report -> crop transition -> epoch restart) [15,19] [20,24]; the
    windows covering a multiple of 10 are [0,4], [10,14], [20,24], so
    the checkpoint labels must be exactly 4, 14, 24 — the pre-fix
    accounting bumped `step` at the crop transition before the
    checkpoint check and silently dropped the step-14 save."""
    train, val = datasets
    saved = []

    class RecordingCheckpointer:
        def __init__(self, directory, prefix="ckpt_", keep=3):
            pass

        def save(self, model, params, opt_state, step, seed):
            saved.append(step)

        def close(self):
            pass

    import fourier_feature_nets_tpu.utils.checkpoint as ckpt_mod
    monkeypatch.setattr(ckpt_mod, "AsyncCheckpointer",
                        RecordingCheckpointer)

    model = Voxels(side=8, scale=1.0)
    caster = ffn.Raycaster(model)
    caster.fit(model.init(jax.random.PRNGKey(0)), train, val,
               batch_size=256, learning_rate=0.02, num_steps=20,
               crop_steps=10, report_interval=10, decay_rate=0.9,
               decay_steps=25000, steps_per_call=5,
               checkpoint_dir="/tmp/unused-recording",
               checkpoint_interval=10)
    assert saved == [4, 14, 24], saved
    assert train.mode == ffn.Mode.Full


class TestAsyncCheckpointer:
    def test_save_wait_round_trip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from fourier_feature_nets_tpu.models import Voxels
        from fourier_feature_nets_tpu.utils import (
            AsyncCheckpointer,
            adam_init,
            latest_checkpoint,
            load_train_state,
        )
        model = Voxels(side=4, scale=1.0)
        params = model.init(jax.random.PRNGKey(0))
        opt = adam_init(params)
        with AsyncCheckpointer(str(tmp_path), keep=2) as ckpt:
            for step in (10, 20, 30, 40):
                tweaked = jax.tree.map(lambda x: x + step, params)
                ckpt.save(model, tweaked, opt, step, seed=1)
                ckpt.wait()
        # keep=2: only the newest two survive pruning
        names = sorted(p.name for p in tmp_path.glob("ckpt_*.npz"))
        assert names == ["ckpt_00000030.npz", "ckpt_00000040.npz"]
        state = load_train_state(latest_checkpoint(str(tmp_path)))
        assert state.step == 40 and state.seed == 1
        np.testing.assert_allclose(
            np.asarray(state.params["bias"]),
            np.asarray(params["bias"]) + 40)

    def test_latest_wins_under_backpressure(self, tmp_path):
        """Saves faster than the writer drains only keep the newest."""
        import jax
        from fourier_feature_nets_tpu.models import Voxels
        from fourier_feature_nets_tpu.utils import (
            AsyncCheckpointer,
            adam_init,
            latest_checkpoint,
            load_train_state,
        )
        model = Voxels(side=4, scale=1.0)
        params = model.init(jax.random.PRNGKey(0))
        opt = adam_init(params)
        with AsyncCheckpointer(str(tmp_path), keep=0) as ckpt:
            for step in range(1, 31):
                ckpt.save(model, params, opt, step)
        # close() flushed the queue: the newest step is always on disk
        state = load_train_state(latest_checkpoint(str(tmp_path)))
        assert state.step == 30

    def test_fit_checkpoints_asynchronously(self, datasets, tmp_path):
        """fit() writes resumable checkpoints through the async path."""
        import jax
        import fourier_feature_nets_tpu as ffn
        from fourier_feature_nets_tpu.models import Voxels
        from fourier_feature_nets_tpu.utils import (
            latest_checkpoint,
            load_train_state,
        )
        train, val = datasets
        model = Voxels(side=8, scale=1.0)
        caster = ffn.Raycaster(model)
        params = model.init(jax.random.PRNGKey(0))
        ckpt_dir = str(tmp_path / "ckpts")
        caster.fit(params, train, val, batch_size=64, learning_rate=0.01,
                   num_steps=25, crop_steps=0, report_interval=100,
                   decay_rate=0.9, decay_steps=25000,
                   checkpoint_dir=ckpt_dir, checkpoint_interval=10)
        path = latest_checkpoint(ckpt_dir)
        assert path is not None
        state = load_train_state(path)
        assert state.step >= 10


def test_occupancy_guided_training(datasets):
    """Occupancy-guided fit: the sampler swaps to a density grid at
    occupancy_start, refreshes WITHOUT recompiling, trains at the
    reduced sample count, and restores the base sampler at the end —
    while still converging on the scene."""
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )
    train, val = datasets
    base_sampler = train.sampler
    model = Voxels(side=24, scale=1.0)
    caster = ffn.Raycaster(model)

    swapped = {}
    original_visualize = []

    class SamplerProbe:
        _interval = 10

        def visualize(self, step, render, act_render):
            if isinstance(train.sampler, OccupancyGridSampler):
                swapped.setdefault("first_step", step)
                swapped["grid_id"] = id(train.sampler.occupancy)
                swapped.setdefault("grids", set()).add(
                    id(train.sampler.occupancy))
                swapped["num_samples"] = train.sampler.num_samples

    params, log = caster.fit(model.init(jax.random.PRNGKey(0)), train,
                             val, batch_size=512, learning_rate=0.05,
                             num_steps=300, crop_steps=0,
                             report_interval=150, decay_rate=0.9,
                             decay_steps=25000, steps_per_call=10,
                             visualizers=[SamplerProbe()],
                             occupancy_interval=100,
                             occupancy_samples=16,
                             occupancy_start=100)
    # swapped in during training, restored after
    assert train.sampler is base_sampler
    assert swapped["num_samples"] == 16
    assert swapped["first_step"] >= 100
    # the grid refreshed at least once past activation (new arrays)
    assert len(swapped["grids"]) >= 2, swapped
    # still converges
    assert log[-1].val_psnr > 14.0, log[-1].val_psnr


def test_train_step_pins_build_time_sampler(datasets):
    """A built train step must keep sampling through ITS sampler even
    if fit later swaps ``dataset.sampler`` (regression: the
    occupancy_mix full-sampling anchor step traced AFTER the guided
    sampler was installed and silently became another guided step
    with a stale frozen grid). Poisoning the dataset's sampler makes
    any trace-time re-read crash."""
    import jax.numpy as jnp

    from fourier_feature_nets_tpu.utils import adam_init

    train, _ = datasets
    model = Voxels(side=8, scale=1.0)
    caster = ffn.Raycaster(model)
    params = model.init(jax.random.PRNGKey(0))
    opt_state = adam_init(params)
    step_fn = caster._make_train_step(train, 64, 0.01, 0.9, 25000,
                                      0.0)
    original = train.sampler
    try:
        train.sampler = None  # any trace-time re-read would crash
        perm = jnp.arange(256, dtype=jnp.int32)
        params, opt_state, loss = step_fn(
            params, opt_state, perm, jnp.int32(0), jnp.int32(0),
            jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
    finally:
        train.sampler = original


def test_occupancy_mix_anchor_uses_base_sampler(datasets):
    """With occupancy_mix, the anchor steps must run the BASE
    (full-sampling) quadrature: count traces through each sampler
    class's sample()."""
    from fourier_feature_nets_tpu.render import RaySampler
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )
    train, val = datasets
    model = Voxels(side=16, scale=1.0)
    caster = ffn.Raycaster(model)

    counts = {"base": 0, "occ": 0}
    base_sample = RaySampler.sample
    occ_sample = OccupancyGridSampler.sample

    def counting_base(self, idx, step=None, rng=None):
        if self is not None and getattr(self, "num_samples", 0) == 48:
            counts["base"] += 1
        return base_sample(self, idx, step, rng)

    def counting_occ(self, idx, step=None, rng=None):
        counts["occ"] += 1
        return occ_sample(self, idx, step, rng)

    RaySampler.sample = counting_base
    OccupancyGridSampler.sample = counting_occ
    try:
        caster.fit(model.init(jax.random.PRNGKey(0)), train, val,
                   batch_size=512, learning_rate=0.05, num_steps=200,
                   crop_steps=0, report_interval=200, decay_rate=0.9,
                   decay_steps=25000, steps_per_call=10,
                   occupancy_interval=100, occupancy_samples=16,
                   occupancy_start=100, occupancy_mix=2)
    finally:
        RaySampler.sample = base_sample
        OccupancyGridSampler.sample = occ_sample
    # the guided step traces occ.sample once; the mix anchor must
    # trace the BASE sampler (once more beyond the initial step's)
    assert counts["occ"] >= 1
    assert counts["base"] >= 2, counts


def test_occupancy_fine_tune_tail(datasets):
    """With occupancy_end, the base (full-sample) sampler is restored
    for the final steps while training continues."""
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )
    train, val = datasets
    base_sampler = train.sampler
    model = Voxels(side=16, scale=1.0)
    caster = ffn.Raycaster(model)

    seen = {}

    class Probe:
        _interval = 10

        def visualize(self, step, render, act_render):
            if isinstance(train.sampler, OccupancyGridSampler):
                seen.setdefault("occ_steps", []).append(step)
            elif step >= 100:
                seen.setdefault("tail_steps", []).append(step)

    params, log = caster.fit(model.init(jax.random.PRNGKey(0)), train,
                             val, batch_size=512, learning_rate=0.05,
                             num_steps=300, crop_steps=0,
                             report_interval=150, decay_rate=0.9,
                             decay_steps=25000, steps_per_call=10,
                             visualizers=[Probe()],
                             occupancy_interval=100,
                             occupancy_samples=16,
                             occupancy_start=100,
                             occupancy_end=250)
    assert train.sampler is base_sampler
    assert seen["occ_steps"], seen
    assert max(seen["occ_steps"]) < 250 + 10, seen
    # the tail really runs on the base sampler
    assert seen["tail_steps"] and min(seen["tail_steps"]) >= 249, seen
    assert log[-1].val_psnr > 14.0, log[-1].val_psnr


def test_reports_checkpoints_window_exact_with_occupancy_mix(
        datasets, tmp_path):
    """occupancy_mix widens each loop window from ``chunk`` to
    chunk+mix steps, so report/checkpoint due-tests must cover the
    whole [first, last] window (regression: the fixed-width
    ``last % interval < chunk`` checkpoint test skipped every
    interval multiple that landed in the mix portion)."""
    import os

    train, val = datasets
    model = Voxels(side=8, scale=1.0)
    caster = ffn.Raycaster(model)
    ckpt_dir = str(tmp_path / "ckpts")
    _, log = caster.fit(model.init(jax.random.PRNGKey(0)), train, val,
                        batch_size=256, learning_rate=0.05,
                        num_steps=200, crop_steps=0,
                        report_interval=50, decay_rate=0.9,
                        decay_steps=25000, steps_per_call=10,
                        occupancy_interval=1000, occupancy_samples=16,
                        occupancy_start=50, occupancy_mix=5,
                        checkpoint_dir=ckpt_dir,
                        checkpoint_interval=50)
    # windows after activation are 15 steps wide: every multiple of 50
    # must be covered by a LogEntry within its window
    steps = [entry.step for entry in log]
    for multiple in (50, 100, 150, 200):
        assert any(multiple <= s < multiple + 15 for s in steps), \
            (multiple, steps)
    # checkpoints fire on the same windows (keep=3 prunes the oldest;
    # step 100's window [96, 110] must survive among the newest 3)
    ckpt_steps = sorted(int(name[5:-4]) for name in os.listdir(ckpt_dir)
                        if name.startswith("ckpt_"))
    assert any(100 <= s < 115 for s in ckpt_steps), ckpt_steps


def test_report_window_exact_with_single_step_mix(datasets):
    """chunk == 1 with occupancy_mix: `last` advances by 1 + mix per
    iteration, so the old ``last % report_interval == 0`` test
    silently skipped most reports."""
    train, val = datasets
    model = Voxels(side=8, scale=1.0)
    caster = ffn.Raycaster(model)
    _, log = caster.fit(model.init(jax.random.PRNGKey(0)), train, val,
                        batch_size=256, learning_rate=0.05,
                        num_steps=60, crop_steps=0, report_interval=20,
                        decay_rate=0.9, decay_steps=25000,
                        occupancy_interval=1000, occupancy_samples=16,
                        occupancy_start=10, occupancy_mix=2)
    steps = [entry.step for entry in log]
    for multiple in (20, 40, 60):
        assert any(multiple <= s < multiple + 3 for s in steps), \
            (multiple, steps)


def test_prune_unlinks_listed_filenames(tmp_path):
    """_prune must unlink the filename it LISTED, not a %08d
    reconstruction — a hand-written non-padded checkpoint (e.g. via
    save_train_state) would otherwise raise FileNotFoundError out of a
    later unrelated save()."""
    from fourier_feature_nets_tpu.models import Voxels
    from fourier_feature_nets_tpu.utils.checkpoint import (
        AsyncCheckpointer,
        save_train_state,
    )

    model = Voxels(side=4, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    opt_state = adam_init(params)

    directory = str(tmp_path)
    # a non-zero-padded stale checkpoint dropped in by hand
    save_train_state(f"{directory}/ckpt_7.npz", model,
                     jax.tree.map(np.asarray, params),
                     jax.tree.map(np.asarray, opt_state), 7, 0)
    with AsyncCheckpointer(directory, keep=2) as writer:
        for step in (10, 20, 30):
            writer.save(model, params, opt_state, step)
            # wait per save: the writer coalesces queued saves
            # (latest wins under backpressure), which would leave
            # fewer than `keep` padded files and never trigger prune
            writer.wait()
    import os
    names = sorted(os.listdir(directory))
    assert "ckpt_7.npz" not in names, names
    assert names == ["ckpt_00000020.npz", "ckpt_00000030.npz"], names


def test_resume_into_occupancy_phase(datasets, tmp_path):
    """Resuming from a checkpoint taken BEFORE occupancy_start must
    activate occupancy-guided sampling on schedule after the resume
    (start_step bookkeeping, window-exact activation, sampler
    restored at exit)."""
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )

    train, val = datasets
    base_sampler = train.sampler
    model = Voxels(side=8, scale=1.0)
    caster = ffn.Raycaster(model)
    ckpt_dir = str(tmp_path / "ckpts")
    common = dict(batch_size=256, learning_rate=0.05, crop_steps=0,
                  report_interval=100, decay_rate=0.9,
                  decay_steps=25000, steps_per_call=10,
                  checkpoint_dir=ckpt_dir, checkpoint_interval=50)

    # phase 1: stop before occupancy_start
    caster.fit(model.init(jax.random.PRNGKey(0)), train, val,
               num_steps=100, **common)

    seen = {}

    class Probe:
        _interval = 10

        def visualize(self, step, render, act_render):
            if isinstance(train.sampler, OccupancyGridSampler):
                seen.setdefault("first", step)

    # phase 2: resume; occupancy_start=150 falls in THIS run
    _, log = caster.fit(model.init(jax.random.PRNGKey(0)), train, val,
                        num_steps=260, resume=True,
                        occupancy_interval=100, occupancy_samples=16,
                        occupancy_start=150, visualizers=[Probe()],
                        **common)
    assert seen.get("first", 10**9) >= 150, seen
    assert seen["first"] < 200, seen
    assert train.sampler is base_sampler
    # resumed log continues past the checkpointed step
    assert log[0].step > 100
