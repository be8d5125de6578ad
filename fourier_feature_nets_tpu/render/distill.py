"""Teacher -> student radiance-field distillation (model baking).

Serving wants the cheapest model that matches the trained field; the
flagship 8x256 NeRF is the quality reference but its fused render
kernel sits at a matmul-sequence floor (docs/RESULTS.md). Distillation
trains a smaller student DIRECTLY against the teacher's field in
point space — no dataset required, "infinite" supervision along
exactly the rays a renderer will ask for — so a rig of cameras plus a
trained checkpoint is enough to bake a faster serving model
(tools/student_kernel_bench.py sizes the payoff: 4x128 renders a
16k-ray chunk 1.64x faster than 8x256).

No reference counterpart (the reference has one model per training
script); this composes the framework's own pieces: the gather-free
camera-ray geometry (ray_sampler.camera_ray_geometry), occupancy- or
uniform-guided sample placement, the fused inference kernel for the
teacher and the fused custom-VJP kernel for an MLP student.

Loss: activated-space matching per sample point —

    rgb:    || sigmoid(c_s) - sigmoid(c_t) ||^2, weighted by the
            teacher's per-sample alpha (color is unobservable where
            the field is empty; a small floor keeps gradients alive
            so the student doesn't hallucinate color in empty space)
    alpha:  (1 - exp(-softplus(o) * delta)) matched with the actual
            inter-sample deltas — bounded, render-relevant, and
            insensitive to the unbounded density logits' scale.

Everything runs device-resident: ``steps_per_call`` optimization
steps per compiled call (lax.scan), camera/pixel draws on device,
sampler tables as jit ARGUMENTS (the `_train_data` pattern — no
compile-payload constants, zero recompiles across refreshes).
"""

import copy
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.optim import adam_init, adam_update, exponential_lr

__all__ = ["distill"]


def _logits_fn(model, fused: bool, compute_dtype, trainable: bool):
    """(model_arg, positions, views) -> (N, 4) logits."""
    if fused and model.model_type == "nerf":
        if trainable:
            # feature-major train kernel (same DMA-floor win as the
            # teacher's FM inference kernel; ops/fused_nerf_train_fm)
            from ..ops.fused_nerf_train_fm import (
                fused_nerf_train_apply_fm as fused_nerf_train_apply,
                model_statics_fm as model_statics,
                pack_fused_nerf_fm as pack_fused_nerf,
            )
            from ..ops.fused_nerf import _round_up
            from .raycaster import _on_tpu

            statics = model_statics(model, jnp.bfloat16)
            tile = 512
            interpret = not _on_tpu()

            def fn(params, positions, views):
                # pad to the kernel tile (same as
                # Raycaster._train_forward): _fused_call asserts
                # num % tile == 0, and batch_rays * samples/ray need
                # not be a multiple of 512
                packed = pack_fused_nerf(model, params, jnp.bfloat16)
                num = positions.shape[0]
                padded = _round_up(num, tile)
                if padded != num:
                    positions = jnp.pad(
                        positions, ((0, padded - num), (0, 0)))
                    views = jnp.pad(views, ((0, padded - num), (0, 0)))
                logits = fused_nerf_train_apply(statics, packed,
                                                positions, views, tile,
                                                interpret)
                return logits[:num]
        else:
            from ..ops.fused_nerf import fused_nerf_apply

            def fn(weights, positions, views):
                return fused_nerf_apply(model, weights, positions,
                                        views)
    elif model.use_view:
        def fn(params, positions, views):
            return model.apply(params, positions, views,
                               compute_dtype=compute_dtype)
    else:
        def fn(params, positions, views):
            del views
            return model.apply(params, positions,
                               compute_dtype=compute_dtype)
    return fn


def distill(teacher, teacher_params, student, sampler,
            num_steps: int,
            student_params=None,
            batch_rays: int = 1024,
            learning_rate: float = 5e-4,
            decay_rate: float = 1.0,
            decay_steps: int = 0,
            weight_decay: float = 0.0,
            seed: int = 20080524,
            steps_per_call: int = 100,
            rgb_floor: float = 0.01,
            fused_teacher: Optional[bool] = None,
            fused_student: Optional[bool] = None,
            compute_dtype=None,
            report_interval: int = 1000,
            reporter=None,
            checkpoint_dir: Optional[str] = None,
            checkpoint_interval: Optional[int] = None,
            resume: bool = False):
    """Trains ``student`` to match ``teacher``'s radiance field.

    Args:
        teacher / teacher_params: the trained field to bake.
        student: a fresh model (its ``init`` is used unless
            ``student_params`` is given — pass them to continue).
        sampler: ray source — any sampler exposing
            ``sample_camera_rays`` (RaySampler for uniform placement,
            ``OccupancyGridSampler.from_model(teacher, ...)`` to
            concentrate supervision where the teacher has density).
        num_steps: total optimization steps.
        batch_rays: rays per step (samples/ray comes from the
            sampler).
        decay_rate / decay_steps: per-step exponential LR schedule
            ``lr * decay_rate ** (step / decay_steps)`` (utils.optim
            .exponential_lr, the fit() schedule); the (1.0, 0)
            default keeps the constant-LR behavior.
        rgb_floor: alpha-weight floor for the color term.
        fused_teacher / fused_student: force the Pallas kernels
            (default: auto — NeRF models on TPU).
        reporter: optional ``f(step, loss)`` called every
            ``report_interval`` steps.
        checkpoint_dir / checkpoint_interval: when both set, a
            resumable TrainState checkpoint is written (asynchronously,
            utils.checkpoint.AsyncCheckpointer) every
            ``checkpoint_interval`` steps — the same elastic-recovery
            contract as :meth:`Raycaster.fit`.
        resume: restore the newest checkpoint in ``checkpoint_dir``
            before distilling. The per-step RNG is keyed by ABSOLUTE
            step (``fold_in(root_key, step)``) and Adam state is
            restored exactly, so an interrupted-and-resumed run
            reproduces the uninterrupted one.

    Returns:
        (student_params, losses): trained parameters and the per-step
        loss history (host numpy; covers only the steps THIS call
        executed — ``num_steps`` from scratch, fewer after a resume).
    """
    from .raycaster import _on_tpu

    if decay_rate != 1.0 and decay_steps <= 0:
        raise ValueError(
            f"decay_rate={decay_rate} has no effect with "
            "decay_steps=0 — the schedule is "
            "lr * decay_rate ** (step / decay_steps); pass "
            "decay_steps > 0 (e.g. num_steps) to enable decay")
    if fused_teacher is None:
        fused_teacher = teacher.model_type == "nerf" and _on_tpu()
    if fused_student is None:
        fused_student = student.model_type == "nerf" and _on_tpu()

    teacher_fn = _logits_fn(teacher, fused_teacher, compute_dtype,
                            trainable=False)
    student_fn = _logits_fn(student, fused_student, compute_dtype,
                            trainable=True)
    if fused_teacher and teacher.model_type == "nerf":
        # feature-major layout: the teacher is queried at every
        # distillation step, so the serving kernel's DMA-floor win
        # applies here too (ops/fused_nerf_fm.py)
        from ..ops.fused_nerf_fm import prepare_fused_nerf_fm
        teacher_arg = prepare_fused_nerf_fm(teacher, teacher_params,
                                            dtype=jnp.bfloat16)
    else:
        teacher_arg = teacher_params

    if student_params is None:
        student_params = student.init(jax.random.PRNGKey(seed))

    rays_per_cam = sampler.rays_per_camera
    num_cameras = sampler.num_cameras
    # sampler tables ride as jit arguments (not closure constants):
    # big rigs would otherwise embed 100s of MB in the compile payload
    data = {name: value for name, value in vars(sampler).items()
            if isinstance(value, jnp.ndarray)}

    def traced_sampler(arrays):
        traced = copy.copy(sampler)
        for name, value in arrays.items():
            object.__setattr__(traced, name, value)
        return traced

    def loss_fn(params, arrays, teacher_arg, key):
        cam_key, pix_key, strat_key = jax.random.split(key, 3)
        camera = jax.random.randint(cam_key, (), 0, num_cameras)
        offsets = jax.random.randint(pix_key, (batch_rays,), 0,
                                     rays_per_cam)
        rays, valid = traced_sampler(arrays).sample_camera_rays(
            camera, offsets, rng=strat_key)
        positions = rays.positions.reshape(-1, 3)
        views = rays.view_directions.reshape(-1, 3)

        t_logits = jax.lax.stop_gradient(
            teacher_fn(teacher_arg, positions, views))
        s_logits = student_fn(params, positions, views)

        t_vals = rays.t_values
        deltas = jnp.diff(t_vals, axis=-1)
        deltas = jnp.concatenate([deltas, deltas[..., -1:]], -1)
        deltas = deltas.reshape(-1)

        rgb_t = jax.nn.sigmoid(t_logits[:, :3])
        rgb_s = jax.nn.sigmoid(s_logits[:, :3])
        alpha_t = 1.0 - jnp.exp(-jax.nn.softplus(t_logits[:, 3])
                                * deltas)
        alpha_s = 1.0 - jnp.exp(-jax.nn.softplus(s_logits[:, 3])
                                * deltas)

        num_samples = t_vals.shape[-1]
        mask = jnp.repeat(valid.astype(jnp.float32), num_samples)
        w_rgb = mask * (jax.lax.stop_gradient(alpha_t) + rgb_floor)
        l_rgb = (jnp.sum(w_rgb * jnp.sum(
            jnp.square(rgb_s - rgb_t), -1))
            / (3.0 * jnp.sum(w_rgb) + 1e-9))
        l_alpha = (jnp.sum(mask * jnp.square(alpha_s - alpha_t))
                   / (jnp.sum(mask) + 1e-9))
        return l_rgb + l_alpha

    root_key = jax.random.PRNGKey(seed)
    steps_per_call = max(1, min(steps_per_call, num_steps))

    @jax.jit
    def multi_step(params, opt_state, arrays, teacher_arg, step0):
        def body(carry, k):
            params, opt_state = carry
            step = step0 + k
            key = jax.random.fold_in(root_key, step)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, arrays, teacher_arg, key)
            lr = (exponential_lr(learning_rate, step, decay_rate,
                                 decay_steps)
                  if decay_steps else learning_rate)
            params, opt_state = adam_update(
                grads, opt_state, params, lr,
                weight_decay=weight_decay)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            jnp.arange(steps_per_call, dtype=jnp.int32))
        return params, opt_state, losses

    opt_state = adam_init(student_params)
    start_step = 0
    if resume and checkpoint_dir:
        from ..utils.checkpoint import latest_checkpoint, load_train_state
        ckpt = latest_checkpoint(checkpoint_dir)
        if ckpt:
            state = load_train_state(ckpt)
            student_params, opt_state = state.params, state.opt_state
            start_step = state.step  # stored as completed-step COUNT
            print(f"Resumed distillation from {ckpt} "
                  f"at step {start_step}")

    checkpointer = None
    if checkpoint_dir and checkpoint_interval:
        from ..utils.checkpoint import AsyncCheckpointer
        checkpointer = AsyncCheckpointer(checkpoint_dir)

    losses = []
    step = start_step
    try:
        while step < num_steps:
            student_params, opt_state, chunk = multi_step(
                student_params, opt_state, data, teacher_arg,
                jnp.asarray(step, jnp.int32))
            chunk = np.asarray(chunk)
            losses.append(chunk)
            prev = step
            step += steps_per_call
            if checkpointer is not None and (
                    step // checkpoint_interval
                    > prev // checkpoint_interval
                    or step >= num_steps):
                checkpointer.save(student, student_params, opt_state,
                                  step, seed)
            if reporter is not None and (step % report_interval == 0
                                         or step >= num_steps):
                reporter(step, float(chunk[-1]))
    finally:
        if checkpointer is not None:
            checkpointer.close()
    if not losses:  # resumed at/past num_steps: nothing left to run
        return student_params, np.zeros(0, np.float32)
    return (student_params,
            np.concatenate(losses)[:num_steps - start_step])
