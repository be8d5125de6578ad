"""Benchmark: flagship NeRF render + train throughput on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: end-to-end 800x800 orbit-frame rendering on one chip
— occupancy-guided sampling (32 samples/ray), the Pallas fused
8x256 view-dependent NeRF, compositing and the uint8 image fetch,
i.e. exactly the orbit_video.py production path. Baseline anchor: the
BASELINE.json north star of 800x800 @ 20 FPS on a v5e-8 = 2.5
frames/s/chip; vs_baseline = measured FPS-per-chip / 2.5. Raw kernel
throughputs (rays/s, train steps/s) go to stderr as diagnostics.

Timing methodology (important on remote/tunneled TPU runtimes where
``block_until_ready`` can return before execution): every iteration is
CHAINED through a scalar carry so no call can be elided or reordered,
inputs are generated on device (no host transfers), and one tiny
scalar fetch at the end forces the full chain.
"""

import json
import sys
import time

import numpy as np


def _bench_chain(fn, *args, iters=10):
    """Mean seconds/call via a dependency-chained loop."""
    import jax.numpy as jnp
    carry = fn(*args, jnp.float32(0.0))
    float(carry)  # warmup + compile
    start = time.perf_counter()
    for _ in range(iters):
        carry = fn(*args, carry)
    float(carry)  # force the chain
    return (time.perf_counter() - start) / iters


def main():
    import jax
    import jax.numpy as jnp

    from fourier_feature_nets_tpu.models import flagship_nerf
    from fourier_feature_nets_tpu.ops.fused_nerf import (
        fused_nerf_apply,
        prepare_fused_nerf,
    )
    from fourier_feature_nets_tpu.render.ray_sampler import RaySamples
    from fourier_feature_nets_tpu.render.raycaster import (
        Raycaster,
        _composite,
    )
    from fourier_feature_nets_tpu.utils import adam_init, adam_update

    device = jax.devices()[0]
    print(f"device: {device}", file=sys.stderr)

    model = flagship_nerf()
    params = model.init(jax.random.PRNGKey(0))

    num_samples = 128
    render_rays = 16384
    train_rays = 1024

    from functools import partial

    @partial(jax.jit, static_argnames="num_rays")
    def make_rays(key, num_rays):
        k1, k2, k3 = jax.random.split(key, 3)
        t = jnp.sort(jax.random.uniform(k1, (num_rays, num_samples),
                                        jnp.float32, 1.0, 4.0), -1)
        d = jax.random.normal(k2, (num_rays, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        s = jax.random.uniform(k3, (num_rays, 3), jnp.float32, -1, 1)
        pos = s[:, None] + t[..., None] * d[:, None]
        views = jnp.broadcast_to(d[:, None], pos.shape)
        return pos, views, t

    results = {}
    key = jax.random.PRNGKey(0)

    # --- render: fused Pallas kernel (bf16), scan-amortized ---
    # production layout is feature-major (ops/fused_nerf_fm.py); the
    # row-major kernel rides along as a regression diagnostic
    from fourier_feature_nets_tpu.ops.fused_nerf_fm import (
        prepare_fused_nerf_fm,
    )
    pos, views, t = make_rays(key, render_rays)
    render_scan = 10

    def make_render_fused(weights):
        @jax.jit
        def render_fused(pos, views, t, carry):
            def body(c, _):
                flat = fused_nerf_apply(model, weights,
                                        pos.reshape(-1, 3) + c * 0.0,
                                        views.reshape(-1, 3))
                out = _composite(
                    flat.reshape(render_rays, num_samples, 4),
                    t, False)
                return jnp.sum(out.color) * 1e-9, None
            carry, _ = jax.lax.scan(
                body, carry, jnp.arange(render_scan, dtype=jnp.int32))
            return carry
        return render_fused

    for label, prep in (("fm", prepare_fused_nerf_fm),
                        ("rm", prepare_fused_nerf)):
        try:
            weights = prep(model, params, dtype=jnp.bfloat16)
            render_fused = make_render_fused(weights)
            carry = render_fused(pos, views, t, jnp.float32(0.0))
            float(carry)
            start = time.perf_counter()
            carry = render_fused(pos, views, t, carry)
            float(carry)
            dt = (time.perf_counter() - start) / render_scan
            results[f"render_fused_bf16_{label}"] = render_rays / dt
            print(f"render fused bf16 [{label}]: {dt * 1e3:.2f} ms, "
                  f"{render_rays / dt / 1e6:.3f} Mrays/s",
                  file=sys.stderr)
        except Exception as error:
            print(f"render fused [{label}]: failed "
                  f"({str(error)[:200]})", file=sys.stderr)

    # --- render: plain XLA path (bf16 body) ---
    caster_bf16 = Raycaster(model, compute_dtype=jnp.bfloat16)

    @jax.jit
    def render_xla(pos, views, t, carry):
        samples = RaySamples(pos + carry * 0.0, views, t, None)
        out = caster_bf16.render(params, samples, include_depth=False)
        return jnp.sum(out.color) * 1e-9

    try:
        dt = _bench_chain(render_xla, pos, views, t)
        results["render_xla_bf16"] = render_rays / dt
        print(f"render xla bf16:   {dt * 1e3:.2f} ms, "
              f"{render_rays / dt / 1e6:.3f} Mrays/s", file=sys.stderr)
    except Exception as error:
        print(f"render xla: failed ({str(error)[:200]})",
              file=sys.stderr)

    # --- training step (bf16 body, full clipped-Adam update) ---
    # timed as a 50-step lax.scan inside ONE compiled call: true
    # device time, immune to per-dispatch tunnel noise
    from fourier_feature_nets_tpu.ops.fused_nerf_train import (
        fused_nerf_train_apply,
        model_statics,
        pack_fused_nerf,
    )
    from fourier_feature_nets_tpu.ops.fused_nerf_train_fm import (
        fused_nerf_train_apply_fm,
        model_statics_fm,
        pack_fused_nerf_fm,
    )
    from fourier_feature_nets_tpu.render.raycaster import _composite

    tpos, tviews, tt = make_rays(jax.random.fold_in(key, 1), train_rays)
    target = jnp.ones((train_rays, 3)) * 0.5
    train_kernels = {
        "fm": (model_statics_fm(model, jnp.bfloat16),
               pack_fused_nerf_fm, fused_nerf_train_apply_fm),
        "rm": (model_statics(model, jnp.bfloat16),
               pack_fused_nerf, fused_nerf_train_apply),
    }
    scan_steps = 50

    def make_train(mode):
        @jax.jit
        def multi_step(params, opt_state, carry):
            def body(c, _):
                params, opt_state, carry = c

                def loss_fn(p):
                    if mode in train_kernels:
                        statics, pack, apply_fn = train_kernels[mode]
                        packed = pack(model, p, jnp.bfloat16)
                        logits = apply_fn(
                            statics, packed,
                            tpos.reshape(-1, 3) + carry * 0.0,
                            tviews.reshape(-1, 3), 512, False)
                        out = _composite(
                            logits.reshape(train_rays, num_samples, 4),
                            tt, False)
                    else:
                        samples = RaySamples(tpos + carry * 0.0, tviews,
                                             tt, None)
                        out = caster_bf16.render(p, samples, False)
                    return jnp.mean(jnp.square(out.color - target))

                loss, grads = jax.value_and_grad(loss_fn)(params)
                params, opt_state = adam_update(
                    grads, opt_state, params, 5e-4, weight_decay=1e-6,
                    clip_value=0.1, clip_norm=0.1)
                return (params, opt_state, loss), loss

            (params, opt_state, carry), _ = jax.lax.scan(
                body, (params, opt_state, carry),
                jnp.arange(scan_steps, dtype=jnp.int32))
            return params, opt_state, carry
        return multi_step

    for label in ("xla", "fm", "rm"):
        try:
            step_fn = make_train(label)
            p, o, c = step_fn(params, adam_init(params),
                              jnp.float32(0.0))
            float(c)
            start = time.perf_counter()
            p, o, c = step_fn(p, o, c)
            float(c)
            dt_train = (time.perf_counter() - start) / scan_steps
            results[f"train_steps_per_sec_{label}"] = 1.0 / dt_train
            print(f"train {label} bf16: {1.0 / dt_train:.1f} steps/s "
                  f"({dt_train * 1e3:.2f} ms/step, batch {train_rays}x"
                  f"{num_samples}) -> 50k steps in "
                  f"{50000 * dt_train / 60:.1f} min", file=sys.stderr)
        except Exception as error:
            print(f"train {label}: failed ({str(error)[:200]})",
                  file=sys.stderr)

    # --- headline: end-to-end 800x800 orbit frame (production path) ---
    try:
        from fourier_feature_nets_tpu.cameras import Resolution
        from fourier_feature_nets_tpu.octree import OcTree
        from fourier_feature_nets_tpu.render.occupancy_sampler import (
            OccupancyGridSampler,
        )
        from fourier_feature_nets_tpu.utils.camera_paths import orbit

        rng = np.random.default_rng(1)
        cloud = np.concatenate([
            rng.normal([0.2, 0.0, 0.0], 0.2, (20000, 3)),
            [[-1, -1, -1], [1, 1, 1]],
        ]).astype(np.float32)
        tree = OcTree.build_from_samples(cloud, depth=6, min_leaf_size=2)
        cameras = orbit(np.array([0.0, 1.0, 0.0]),
                        np.array([0.0, 0.0, 1.0]), 12, 40.0,
                        Resolution(800, 800), 4.0)
        bounds = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
        sampler = OccupancyGridSampler(tree, cameras, 32,
                                       grid_resolution=64,
                                       num_probes=32, bounds=bounds)
        caster = Raycaster(model, compute_dtype=jnp.bfloat16, fused=True)
        np.asarray(caster.render_frame_async(params, sampler, 0))
        num_frames = 6
        # best of 3 rounds: the remote tunnel has transient multi-
        # hundred-ms congestion episodes (measured 229 ms/frame and
        # 437 ms/frame minutes apart on identical code); the MIN
        # measures the hardware, the outliers measure the tunnel
        best_dt = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            pending = None
            for frame in range(num_frames):
                buffer = caster.render_frame_async(params, sampler,
                                                   frame + 1)
                if pending is not None:
                    np.asarray(pending)
                pending = buffer
            np.asarray(pending)
            dt = (time.perf_counter() - start) / num_frames
            print(f"  orbit round: {dt * 1e3:.1f} ms/frame",
                  file=sys.stderr)
            best_dt = min(best_dt, dt)
        dt = best_dt
        results["orbit_frame_fps"] = 1.0 / dt
        print(f"orbit 800px frame: {dt * 1e3:.1f} ms "
              f"({1.0 / dt:.2f} FPS/chip, "
              f"{8.0 / dt:.1f} FPS v5e-8 proj)", file=sys.stderr)
    except Exception as error:
        print(f"orbit frame: failed ({str(error)[:200]})",
              file=sys.stderr)

    # --- second tracked metric: the SERVING operating point ---
    # `--preset fast` on a distilled student (the README serving
    # headline path): student-sized FM kernel, 48 samples/ray,
    # occupancy culling. Weights are random-init (frame TIME is
    # weight-independent given the same occupancy geometry), so this
    # regress-detects the serving frame path; quality numbers live in
    # docs/RESULTS.md. Keep the config in sync with the shipped
    # recommendation (cli/common.py RENDER_PRESETS + RESULTS
    # § Stacked serving preset).
    try:
        from fourier_feature_nets_tpu.cli.common import RENDER_PRESETS
        from fourier_feature_nets_tpu.models import NeRF

        from fourier_feature_nets_tpu.cli.common import (
            RECOMMENDED_STUDENT)

        preset = RENDER_PRESETS["fast"]
        student = NeRF(num_layers=RECOMMENDED_STUDENT[0],
                       num_channels=RECOMMENDED_STUDENT[1],
                       max_log_scale_pos=9.0, num_freq_pos=10,
                       max_log_scale_view=3.0, num_freq_view=4,
                       skips=[RECOMMENDED_STUDENT[0] // 2],
                       include_inputs=True)
        student_params = student.init(jax.random.PRNGKey(0))
        s_sampler = OccupancyGridSampler(
            tree, cameras, preset["num_samples"], grid_resolution=64,
            num_probes=32, bounds=bounds)
        s_caster = Raycaster(student, compute_dtype=jnp.bfloat16,
                             fused=True)
        kwargs = dict(early_term=preset.get("early_term", 0.0),
                      early_split=preset.get("early_split", 0))
        np.asarray(s_caster.render_frame_async(student_params,
                                               s_sampler, 0, **kwargs))
        best_dt = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            pending = None
            for frame in range(num_frames):
                buffer = s_caster.render_frame_async(
                    student_params, s_sampler, frame + 1, **kwargs)
                if pending is not None:
                    np.asarray(pending)
                pending = buffer
            np.asarray(pending)
            best_dt = min(best_dt,
                          (time.perf_counter() - start) / num_frames)
        results["student_frame_fps"] = 1.0 / best_dt
        print(f"student preset-fast 800px frame: {best_dt * 1e3:.1f} ms"
              f" ({1.0 / best_dt:.2f} FPS/chip)", file=sys.stderr)
    except Exception as error:
        print(f"student frame: failed ({str(error)[:200]})",
              file=sys.stderr)

    if "orbit_frame_fps" in results:
        headline = results["orbit_frame_fps"]
        record = {
            "metric": "orbit_frame_800px_fps_per_chip",
            "value": round(headline, 3),
            "unit": "frames/s",
            "vs_baseline": round(headline / 2.5, 4),
        }
        if "student_frame_fps" in results:
            record["student_preset_fast_fps_per_chip"] = round(
                results["student_frame_fps"], 3)
        print(json.dumps(record))
    else:
        headline = results.get(
            "render_fused_bf16_fm",
            results.get("render_fused_bf16_rm",
                        results.get("render_xla_bf16", 0.0)))
        per_chip_target = 12.8e6 / 8
        print(json.dumps({
            "metric": "nerf_render_rays_per_sec_per_chip",
            "value": round(headline, 1),
            "unit": "rays/s",
            "vs_baseline": round(headline / per_chip_target, 4),
        }))


if __name__ == "__main__":
    main()
