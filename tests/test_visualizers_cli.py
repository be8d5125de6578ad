"""Visualizer artifact tests + CLI smoke tests (subprocess-free)."""

import os

import jax
import pytest

import fourier_feature_nets_tpu as ffn
from fourier_feature_nets_tpu.datasets.synthetic import (
    generate_synthetic_dataset,
)
from fourier_feature_nets_tpu.models import Voxels, load_model


@pytest.fixture(scope="module")
def scene_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "scene.npz"
    return generate_synthetic_dataset(str(path), resolution=24,
                                      split_counts=(3, 2, 1),
                                      volume_side=16, num_samples=64)


@pytest.fixture(scope="module")
def trained(scene_path):
    train = ffn.ImageDataset.load(scene_path, "train", num_samples=16)
    val = ffn.ImageDataset.load(scene_path, "val", num_samples=16)
    model = Voxels(side=12, scale=1.0)
    caster = ffn.Raycaster(model)
    params, _ = caster.fit(model.init(jax.random.PRNGKey(0)), train,
                           val, batch_size=256, learning_rate=0.05,
                           num_steps=60, crop_steps=0,
                           report_interval=100, decay_rate=0.9,
                           decay_steps=25000)
    return caster, params, train, val


class TestVisualizers:
    def test_evaluation_visualizer(self, trained, tmp_path):
        caster, params, train, _ = trained
        vis = ffn.EvaluationVisualizer(str(tmp_path), train, interval=1)

        def render(samples, include_depth):
            return caster.batched_render(params, samples, 256,
                                         include_depth)

        vis.visualize(0, render, None)
        files = os.listdir(tmp_path / train.label)
        assert len(files) == 1
        import cv2
        image = cv2.imread(str(tmp_path / train.label / files[0]))
        assert image.shape == (48, 48, 3)  # 2x2 grid of 24px views

    def test_orbit_video_visualizer(self, trained, tmp_path):
        caster, params, train, _ = trained
        vis = ffn.OrbitVideoVisualizer(str(tmp_path), num_steps=10,
                                       resolution=(24, 24),
                                       num_frames=5, num_samples=16,
                                       color_space="RGB")

        def render(samples, include_depth):
            return caster.batched_render(params, samples, 256,
                                         include_depth)

        vis.visualize(0, render, None)
        vis.visualize(1, render, None)  # off-interval: skipped
        vis.visualize(2, render, None)
        files = os.listdir(tmp_path / "video")
        assert len(files) == 2

    def test_comparison_visualizer(self, trained, tmp_path):
        caster, params, train, val = trained
        sub_train = train.sample_cameras(2, 16, False)
        sub_val = val.sample_cameras(2, 16, False)
        vis = ffn.ComparisonVisualizer(str(tmp_path), num_steps=10,
                                       num_frames=5, train=sub_train,
                                       val=sub_val)

        def render(samples, include_depth):
            return caster.batched_render(params, samples, 256,
                                         include_depth)

        vis.visualize(0, render, None)
        files = os.listdir(tmp_path / "compare")
        assert len(files) == 1


class TestCLIs:
    def test_train_voxels_cli(self, scene_path, tmp_path):
        from fourier_feature_nets_tpu.cli.train_voxels import main
        out = str(tmp_path / "voxels")
        code = main([scene_path, "12", out, "--num-steps", "20",
                     "--num-samples", "16", "--batch-size", "128",
                     "--report-interval", "20", "--image-interval",
                     "1000"])
        assert code == 0
        assert os.path.exists(os.path.join(out, "voxels.npz"))
        assert os.path.exists(os.path.join(out, "log.txt"))
        model, params = load_model(os.path.join(out, "voxels.npz"))
        assert model.side == 12
        # best-val snapshot persisted alongside the final weights
        best_model, _ = load_model(os.path.join(out, "voxels_best.npz"))
        assert best_model.side == 12

    def test_train_voxels_cli_no_images(self, scene_path, tmp_path):
        """--image-interval 0 disables visualizers (benchmark runs)
        instead of dividing by zero in the cadence check."""
        from fourier_feature_nets_tpu.cli.train_voxels import main
        out = str(tmp_path / "voxels_noimg")
        code = main([scene_path, "8", out, "--num-steps", "10",
                     "--num-samples", "8", "--batch-size", "64",
                     "--report-interval", "10", "--image-interval", "0"])
        assert code == 0
        assert not [name for name in os.listdir(out)
                    if name.endswith(".png")]

    def test_train_tiny_nerf_cli(self, scene_path, tmp_path):
        from fourier_feature_nets_tpu.cli.train_tiny_nerf import main
        out = str(tmp_path / "tiny")
        code = main([scene_path, "positional", out, "--num-steps", "10",
                     "--num-samples", "8", "--batch-size", "128",
                     "--num-channels", "32", "--embedding-size", "24",
                     "--crop-steps", "0", "--report-interval", "10",
                     "--image-interval", "1000"])
        assert code == 0
        assert os.path.exists(os.path.join(out, "tiny_nerf.npz"))

    def test_train_nerf_cli_fused(self, scene_path, tmp_path):
        from fourier_feature_nets_tpu.cli.train_nerf import main
        out = str(tmp_path / "nerf")
        code = main([scene_path, out, "--num-steps", "6",
                     "--num-samples", "8", "--batch-size", "128",
                     "--num-layers", "2", "--num-channels", "32",
                     "--crop-steps", "0", "--report-interval", "10",
                     "--image-interval", "1000", "--fused"])
        assert code == 0
        assert os.path.exists(os.path.join(out, "nerf.npz"))

    def test_orbit_video_cli(self, trained, tmp_path):
        from fourier_feature_nets_tpu.cli.orbit_video import main
        from fourier_feature_nets_tpu.models import save_model
        caster, params, _, _ = trained
        model_path = str(tmp_path / "model.npz")
        save_model(caster.model, params, model_path)
        out = str(tmp_path / "orbit")
        code = main([model_path, "16", out, "--num-frames", "3",
                     "--num-samples", "8", "--batch-size", "128",
                     "--no-focus"])
        assert code == 0
        assert len(os.listdir(out)) == 3

    def test_voxelize_model_cli(self, trained, scene_path, tmp_path):
        from fourier_feature_nets_tpu.cli.voxelize_model import main
        from fourier_feature_nets_tpu.models import save_model
        from fourier_feature_nets_tpu.octree import OcTree
        caster, params, _, _ = trained
        model_path = str(tmp_path / "model.npz")
        save_model(caster.model, params, model_path)
        out = str(tmp_path / "tree.npz")
        code = main([model_path, scene_path, out, "--num-samples", "16",
                     "--batch-size", "256", "--depth", "5",
                     "--min-leaf-size", "2"])
        assert code == 0
        tree = OcTree.load(out)
        assert tree.num_leaves > 0

    def test_extract_surface_matches_host_loop(self, trained,
                                               scene_path):
        """The single-dispatch device sweep (extract_surface) returns
        the same surface points, in the same (pool) order, as the
        per-batch host loop it replaced."""
        import jax.numpy as jnp
        import numpy as np

        import fourier_feature_nets_tpu as ffn
        caster, params, _, _ = trained
        dataset = ffn.ImageDataset.load(scene_path, "train",
                                        num_samples=16)
        threshold = 0.3

        pos, col = caster.extract_surface(params, dataset,
                                          batch_size=256,
                                          alpha_threshold=threshold)

        # host-side reference sweep (the old CLI loop)
        sampler = dataset.sampler
        ref_pos, ref_col = [], []
        pool = dataset.index_pool()
        for start in range(0, len(pool), 256):
            idx = pool[start:start + 256]
            rays = sampler.sample(jnp.asarray(np.asarray(idx)), None)
            pred = caster.batched_render(params, rays, 256,
                                         include_depth=True)
            keep = pred.alpha > threshold
            if not keep.any():
                continue
            starts = np.asarray(sampler.starts)[idx][keep]
            dirs = np.asarray(sampler.directions)[idx][keep]
            ref_pos.append(starts + pred.depth[keep][:, None] * dirs)
            ref_col.append(np.clip(pred.color[keep], 0, 1))
        ref_pos = np.concatenate(ref_pos)
        ref_col = np.concatenate(ref_col)

        assert pos.shape == ref_pos.shape, (pos.shape, ref_pos.shape)
        np.testing.assert_allclose(pos, ref_pos, atol=1e-4)
        np.testing.assert_allclose(col, ref_col, atol=1e-4)

    def test_render_presets_fill_defaults_only(self):
        """--preset fills flags left at their defaults; explicit
        flags always win (cli/common.py RENDER_PRESETS)."""
        from fourier_feature_nets_tpu.cli.orbit_video import _parse_args

        args = _parse_args(["m.npz", "64", "/tmp/o",
                            "--preset", "quality"])
        assert args.density_grid
        assert args.num_samples == 96
        assert args.early_term == pytest.approx(1e-2)
        assert args.early_split == 48
        assert args.compute_dtype == "bfloat16"

        args = _parse_args(["m.npz", "64", "/tmp/o", "--preset",
                            "fast", "--num-samples", "32",
                            "--compute-dtype", "float32"])
        assert args.density_grid
        assert args.num_samples == 32       # explicit beats preset
        assert args.compute_dtype == "float32"
        assert args.early_term == 0.0       # fast keeps early-term off

    def test_render_preset_respects_abbreviated_flags(self):
        """argparse accepts unambiguous prefixes (--num-sam ==
        --num-samples); the preset must canonicalize them the same
        way, or it silently overwrites an explicitly-passed flag."""
        from fourier_feature_nets_tpu.cli.orbit_video import _parse_args

        args = _parse_args(["m.npz", "64", "/tmp/o", "--preset",
                            "fast", "--num-sam", "32"])
        assert args.num_samples == 32       # abbreviation beats preset

        args = _parse_args(["m.npz", "64", "/tmp/o", "--preset",
                            "quality", "--early-t=5e-2",
                            "--compute-d", "float32"])
        assert args.early_term == pytest.approx(5e-2)
        assert args.compute_dtype == "float32"
        assert args.num_samples == 96       # unset -> preset fills

    def test_render_preset_ignores_tokens_after_separator(self):
        """A positional after a bare ``--`` that happens to spell an
        option string is NOT an explicit flag — argparse treats
        everything after ``--`` as positional, and the preset scan
        must do the same (ADVICE r4)."""
        from fourier_feature_nets_tpu.cli.orbit_video import _parse_args

        args = _parse_args(["--preset", "quality", "--",
                            "--num-samples", "64", "/tmp/o"])
        assert args.model_path == "--num-samples"  # a (weird) filename
        assert args.num_samples == 96       # preset still fills

    def test_sweep_log_parsing(self, tmp_path):
        from fourier_feature_nets_tpu.cli.sweep import (
            best_metric_from_log,
        )
        log = tmp_path / "log.txt"
        log.write_text('{"args": 1}\n\n'
                       "step\ttimestamp\tpsnr_train\tpsnr_val\n"
                       "0\t1.0\t10.0\t9.5\n"
                       "100\t2.0\t20.0\t18.5\n")
        assert best_metric_from_log(str(log)) == 18.5
        assert best_metric_from_log(str(log), "psnr_train") == 20.0


class TestVisualizerDue:
    def test_interval_crossing_semantics(self):
        """_due fires once per covered interval window — including
        chunked-fit step sequences (99, 199, ...) that never land on
        exact multiples — and reduces to the reference's modulo gate
        for step-by-step sequences."""
        from fourier_feature_nets_tpu.visualizers import Visualizer

        class Probe(Visualizer):
            _interval = 100

            def visualize(self, step, render, act_render):
                pass

        # chunked: last-executed steps of 100-step chunks
        probe = Probe()
        fired = [s for s in range(99, 1000, 100) if probe._due(s)]
        assert fired == [199, 299, 399, 499, 599, 699, 799, 899, 999]

        # step-by-step: exact multiples only (reference parity)
        probe = Probe()
        fired = [s for s in range(0, 301) if probe._due(s)]
        assert fired == [0, 100, 200, 300]

    def test_fit_fires_visualizers_under_chunking(self, trained):
        """End-to-end: a visualizer with interval 10 fires during a
        chunked fit whose report steps never hit exact multiples."""
        import jax

        import fourier_feature_nets_tpu as ffn
        from fourier_feature_nets_tpu.models import Voxels
        from fourier_feature_nets_tpu.visualizers import Visualizer

        _, _, train, val = trained
        steps = []

        class Recorder(Visualizer):
            _interval = 10

            def visualize(self, step, render, act_render):
                if self._due(step):
                    steps.append(step)

        model = Voxels(side=8, scale=1.0)
        caster = ffn.Raycaster(model)
        caster.fit(model.init(jax.random.PRNGKey(0)), train, val,
                   batch_size=256, learning_rate=0.02, num_steps=21,
                   crop_steps=0, report_interval=50, decay_rate=0.9,
                   decay_steps=25000, steps_per_call=7,
                   visualizers=[Recorder()])
        # chunks end at 6, 13, 20, 27: windows crossing a multiple of
        # 10 are [7,13] and [14,20]
        assert steps == [13, 20], steps
