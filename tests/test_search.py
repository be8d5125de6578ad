"""Bayesian hyperparameter search (utils/search.py) and the sweep
CLI's concurrent runner — the HyperDrive-equivalent surface
(submit_param_sweep.py:49-64 parity)."""

import os

import numpy as np
import pytest

from fourier_feature_nets_tpu.utils.search import (
    BayesianSearch,
    parse_space,
)


class TestSearchSpace:
    def test_parse_and_roundtrip(self):
        space = parse_space(
            "learning-rate=loguniform(1e-5,1e-2);"
            "num-channels=choice(64,128,256);"
            "crop-steps=quniform(0,1000);"
            "anneal-start=uniform(0.0,1.0)")
        assert space.names == ["learning-rate", "num-channels",
                               "crop-steps", "anneal-start"]
        params = {"learning-rate": 1e-3, "num-channels": 128,
                  "crop-steps": 500, "anneal-start": 0.25}
        decoded = space.decode(space.encode(params))
        assert decoded["num-channels"] == 128
        assert decoded["crop-steps"] == 500
        assert decoded["learning-rate"] == pytest.approx(1e-3, rel=1e-6)
        assert decoded["anneal-start"] == pytest.approx(0.25, abs=1e-9)

    def test_sampling_respects_bounds(self):
        space = parse_space("lr=loguniform(1e-4,1e-1);c=choice(a,b)")
        rng = np.random.default_rng(0)
        for _ in range(64):
            params = space.sample(rng)
            assert 1e-4 <= params["lr"] <= 1e-1
            assert params["c"] in ("a", "b")

    def test_bad_specs_raise(self):
        with pytest.raises(ValueError):
            parse_space("lr=normal(0,1)")
        with pytest.raises(ValueError):
            parse_space("")
        with pytest.raises(ValueError):
            parse_space("lr=loguniform(0,1)")


class TestBayesianSearch:
    def test_beats_random_on_smooth_objective(self):
        """GP+EI finds a better optimum than pure random sampling at
        equal budget on a smooth 2-D objective (the HyperDrive value
        proposition)."""
        spec = "x=uniform(0,1);y=uniform(0,1)"

        def objective(p):
            return -((p["x"] - 0.31) ** 2 + (p["y"] - 0.77) ** 2)

        budget = 24
        bayes = BayesianSearch(parse_space(spec), seed=0)
        for _ in range(budget):
            params = bayes.suggest()
            bayes.observe(params, objective(params))
        _, bayes_best = bayes.best()

        rng = np.random.default_rng(0)
        space = parse_space(spec)
        random_best = max(objective(space.sample(rng))
                          for _ in range(budget))

        assert bayes_best > random_best
        assert bayes_best > -0.01  # within 0.1 of the optimum

    def test_constant_liar_separates_concurrent_suggestions(self):
        space = parse_space("x=uniform(0,1)")
        search = BayesianSearch(space, seed=1, num_initial=2)
        for _ in range(4):
            params = search.suggest()
            search.observe(params, -(params["x"] - 0.5) ** 2)
        batch = [search.suggest() for _ in range(3)]
        assert len(search.pending) == 3
        xs = sorted(p["x"] for p in batch)
        assert xs[1] - xs[0] > 1e-4 or xs[2] - xs[1] > 1e-4

    def test_quniform_pending_points_are_released(self):
        """Regression: GP-phase suggestions for quniform dimensions
        pended the RAW candidate embedding; observe() re-encodes the
        ROUNDED value, so the constant-liar entry never matched and
        ghost observations accumulated for the rest of the sweep."""
        from fourier_feature_nets_tpu.utils.search import (
            BayesianSearch,
            parse_space,
        )
        space = parse_space("channels=quniform(64,256);"
                            "lr=loguniform(1e-5,1e-2)")
        search = BayesianSearch(space, num_initial=3, seed=0)
        for _ in range(12):  # random phase + well into the GP phase
            params = search.suggest()
            assert len(search.pending) == 1
            search.observe(params, -float(params["channels"]))
            assert search.pending == []

    def test_observe_releases_one_of_identical_pending(self):
        from fourier_feature_nets_tpu.utils.search import (
            BayesianSearch,
            parse_space,
        )
        space = parse_space("lr=uniform(0,1)")
        search = BayesianSearch(space, num_initial=8, seed=1)
        params = search.suggest()
        search.pending.append(search.pending[0].copy())  # twin worker
        search.observe(params, 1.0)
        assert len(search.pending) == 1

    def test_failed_runs_are_dropped(self):
        space = parse_space("x=uniform(0,1)")
        search = BayesianSearch(space, seed=2, num_initial=1)
        params = search.suggest()
        search.observe(params, float("-inf"))
        assert search.best() is None
        params = search.suggest()
        search.observe(params, 1.0)
        assert search.best()[1] == 1.0


class TestSweepRunner:
    def test_concurrent_grid_sweep(self, tmp_path):
        """Two sweep runs execute CONCURRENTLY (overlapping lifetimes
        proven via file timestamps) and the best value is selected."""
        from fourier_feature_nets_tpu.cli import sweep as sweep_mod

        trainer_dir = tmp_path / "fake_pkg"
        results = {}

        def fake_launch(trainer, run_dir, trainer_args, overrides,
                        extra_env=None):
            import time
            os.makedirs(run_dir, exist_ok=True)
            value = float(overrides["learning-rate"])
            start = time.perf_counter()
            time.sleep(0.4)
            end = time.perf_counter()
            results[value] = (start, end)
            with open(os.path.join(run_dir, "log.txt"), "w") as file:
                file.write("step\ttimestamp\tpsnr_train\tpsnr_val\n")
                file.write(f"100\t1.0\t20.0\t{20 + value * 1000}\n")
            return 0

        original = sweep_mod._launch
        sweep_mod._launch = fake_launch
        try:
            best, scores = sweep_mod.run_sweep(
                "train_voxels", "learning-rate", ["0.001", "0.01"],
                str(trainer_dir), [], max_concurrent=2)
        finally:
            sweep_mod._launch = original

        assert best == "0.01"
        assert scores["0.01"] == pytest.approx(30.0)
        # overlapping lifetimes: each run started before the other done
        (s1, e1), (s2, e2) = results[0.001], results[0.01]
        assert s1 < e2 and s2 < e1

    def test_bayesian_search_loop_with_stub_trainer(self, tmp_path):
        """run_search drives suggest->launch->observe end-to-end and
        writes per-trial run dirs."""
        from fourier_feature_nets_tpu.cli import sweep as sweep_mod

        def fake_launch(trainer, run_dir, trainer_args, overrides,
                        extra_env=None):
            os.makedirs(run_dir, exist_ok=True)
            lr = float(overrides["learning-rate"])
            score = 30.0 - (np.log10(lr) + 3.0) ** 2  # peak at 1e-3
            with open(os.path.join(run_dir, "log.txt"), "w") as file:
                file.write("step\ttimestamp\tpsnr_train\tpsnr_val\n")
                file.write(f"100\t1.0\t20.0\t{score}\n")
            return 0

        original = sweep_mod._launch
        sweep_mod._launch = fake_launch
        try:
            best_params, best_score, trials = sweep_mod.run_search(
                "train_voxels",
                "learning-rate=loguniform(1e-5,1e-1)",
                str(tmp_path / "sweep"), [], max_runs=10,
                max_concurrent=2, seed=3)
        finally:
            sweep_mod._launch = original

        assert len(trials) == 10
        assert best_score > 28.0  # near the 30.0 peak at lr=1e-3
        assert 1e-5 <= best_params["learning-rate"] <= 1e-1
        assert len([d for d in os.listdir(tmp_path / "sweep")
                    if d.startswith("trial_")]) == 10

    @pytest.mark.slow
    def test_sweep_cli_end_to_end_subprocess(self, tmp_path):
        """Real subprocess grid sweep through the smallest trainer
        (1-D signal regression) — the actual user surface."""
        from fourier_feature_nets_tpu.cli.sweep import main

        sweep_dir = tmp_path / "sweep"
        code = main([
            "train_signal_regression",
            "--param", "num-channels", "--values", "16,32",
            "--max-concurrent", "2",
            "--sweep-dir", str(sweep_dir), "--metric", "val_loss",
            "--", "multifreq", "--num-steps", "60",
            "--report-interval", "30", "--no-plot",
        ])
        assert code == 0
        runs = sorted(os.listdir(sweep_dir))
        assert len(runs) == 2
        for run in runs:
            assert os.path.exists(sweep_dir / run / "log.txt")


def test_gp_predict_interpolates():
    from fourier_feature_nets_tpu.utils.search import _GaussianProcess
    x = np.linspace(0, 1, 9)[:, None]
    y = np.sin(2 * np.pi * x[:, 0])
    gp = _GaussianProcess(length_scale=0.3).fit(x, y)
    mu, sigma = gp.predict(x)
    np.testing.assert_allclose(mu, y, atol=0.05)
    assert (sigma < 0.2).all()
    mu_mid, sigma_mid = gp.predict(np.asarray([[0.5]]))
    assert abs(mu_mid[0]) < 0.3
