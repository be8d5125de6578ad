"""Teacher->student distillation (render/distill.py).

The distillation loss is a pure function of two radiance fields over
the supervision ray distribution, so the checks are: the loss
decreases from a fresh student, is ~zero when the student IS the
teacher, and every teacher/sampler combination traces and runs
jit-clean (uniform RaySampler, teacher-density OccupancyGridSampler,
view-free voxel teachers)."""

import jax
import numpy as np
import pytest

from fourier_feature_nets_tpu.cameras import Resolution
from fourier_feature_nets_tpu.models import NeRF, Voxels
from fourier_feature_nets_tpu.render import (
    OccupancyGridSampler,
    RaySampler,
    distill,
)
from fourier_feature_nets_tpu.utils import orbit

BOUNDS = np.diag([1.0, 1.0, 1.0, 1.0]).astype(np.float32)


def tiny_nerf(channels=24):
    return NeRF(num_layers=2, num_channels=channels,
                max_log_scale_pos=3.0, num_freq_pos=4,
                max_log_scale_view=1.0, num_freq_view=2,
                skips=[1], include_inputs=True)


def rig(num_cameras=4, res=16):
    return orbit(np.array([0.0, 1.0, 0.0]), np.array([0.0, 0.0, 1.0]),
                 num_cameras, 40.0, Resolution(res, res), 3.0)


def test_distill_loss_decreases():
    teacher = tiny_nerf(32)
    teacher_params = teacher.init(jax.random.PRNGKey(0))
    student = tiny_nerf(16)
    sampler = RaySampler(BOUNDS, rig(), 8, stratified=True)

    _, losses = distill(teacher, teacher_params, student, sampler,
                        num_steps=80, batch_rays=64,
                        steps_per_call=40)
    assert losses.shape == (80,)
    assert losses[-1] < 0.5 * losses[0]


def test_distill_rejects_decay_rate_without_steps():
    """decay_rate is silently inert with decay_steps=0 (the schedule
    is lr * rate ** (step / steps)) — must be a loud error, not a
    constant-LR run the user attributes to the schedule."""
    teacher = tiny_nerf(16)
    teacher_params = teacher.init(jax.random.PRNGKey(0))
    sampler = RaySampler(BOUNDS, rig(), 8, stratified=True)
    with pytest.raises(ValueError, match="decay_steps"):
        distill(teacher, teacher_params, tiny_nerf(16), sampler,
                num_steps=10, batch_rays=64, decay_rate=0.1)


def test_distill_self_is_fixed_point():
    """A student initialized AT the teacher has ~zero loss and stays
    there (the optimum of the distillation objective)."""
    teacher = tiny_nerf(24)
    teacher_params = teacher.init(jax.random.PRNGKey(1))
    sampler = RaySampler(BOUNDS, rig(), 8, stratified=True)

    _, losses = distill(teacher, teacher_params, tiny_nerf(24), sampler,
                        num_steps=10, batch_rays=64,
                        student_params=teacher_params,
                        steps_per_call=10)
    assert float(np.max(losses)) < 1e-8


def test_distill_checkpoint_resume_exact(tmp_path):
    """Interrupted-and-resumed distillation reproduces the
    uninterrupted run (absolute-step RNG keys + restored Adam state
    make the resume exact — the fit() elastic-recovery contract)."""
    teacher = tiny_nerf(24)
    teacher_params = teacher.init(jax.random.PRNGKey(4))
    sampler = RaySampler(BOUNDS, rig(), 8, stratified=True)
    common = dict(batch_rays=32, steps_per_call=10, seed=5)

    full_params, full_losses = distill(
        teacher, teacher_params, tiny_nerf(16), sampler,
        num_steps=40, **common)

    ckpt_dir = str(tmp_path / "ck")
    distill(teacher, teacher_params, tiny_nerf(16), sampler,
            num_steps=20, checkpoint_dir=ckpt_dir,
            checkpoint_interval=10, **common)
    resumed_params, resumed_losses = distill(
        teacher, teacher_params, tiny_nerf(16), sampler,
        num_steps=40, checkpoint_dir=ckpt_dir,
        checkpoint_interval=10, resume=True, **common)

    assert resumed_losses.shape == (20,)
    np.testing.assert_allclose(resumed_losses, full_losses[20:],
                               rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree.leaves(full_params),
                    jax.tree.leaves(resumed_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_distill_occupancy_sampler():
    """Teacher-density-guided supervision placement runs jit-clean."""
    teacher = tiny_nerf(24)
    teacher_params = teacher.init(jax.random.PRNGKey(2))
    sampler = OccupancyGridSampler.from_model(
        teacher, teacher_params, rig(), 8, stratified=True,
        grid_resolution=16, scale=1.0, bounds=BOUNDS)

    _, losses = distill(teacher, teacher_params, tiny_nerf(16), sampler,
                        num_steps=40, batch_rays=64,
                        steps_per_call=20)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_distill_voxels_teacher():
    """View-free teachers supervise view-dependent students."""
    teacher = Voxels(8, 1.0)
    teacher_params = {
        "voxels": jax.numpy.asarray(
            np.random.default_rng(3).normal(0, 0.5, (8, 8, 8, 4))
            .astype(np.float32)),
        "bias": jax.numpy.zeros((4,), jax.numpy.float32),
    }
    sampler = RaySampler(BOUNDS, rig(), 8, stratified=True)

    _, losses = distill(teacher, teacher_params, tiny_nerf(16), sampler,
                        num_steps=60, batch_rays=64,
                        steps_per_call=30)
    assert losses[-1] < losses[0]


def test_distill_cli(tmp_path):
    """CLI end to end: voxel teacher checkpoint -> NeRF student NPZ."""
    from fourier_feature_nets_tpu.cli import distill_model
    from fourier_feature_nets_tpu.models import load_model, save_model

    teacher = Voxels(8, 1.0)
    teacher_params = teacher.init(jax.random.PRNGKey(4))
    teacher_path = str(tmp_path / "teacher.npz")
    save_model(teacher, teacher_params, teacher_path)

    out = str(tmp_path / "out")
    distill_model.main([
        teacher_path, out, "--num-steps", "20", "--batch-rays", "32",
        "--num-samples", "8", "--steps-per-call", "10",
        "--report-interval", "10", "--student-layers", "2",
        "--student-channels", "16", "--student-freq-pos", "3",
        "--student-freq-view", "2", "--num-cameras", "3",
        "--resolution", "12", "--scale", "1.0"])

    student, student_params = load_model(f"{out}/student.npz")
    assert student.model_type == "nerf"
    assert student.num_channels == 16
    out_logits = student.apply(
        student_params,
        jax.numpy.zeros((4, 3)), jax.numpy.ones((4, 3)))
    assert out_logits.shape == (4, 4)
    log = open(f"{out}/distill_log.txt").read()
    assert "step\tloss" in log
