"""On-TPU parity validation of the fused Pallas kernels vs XLA.

Runs the production fused inference kernel (ops/fused_nerf.py), the
fused custom-VJP training kernel (ops/fused_nerf_train.py) and the
alternative fully-fused ray renderer (ops/fused_ray_render.py) on the
REAL TPU and checks their outputs/gradients against the XLA forward
at several model configurations and sample counts — the fast way to
certify a kernel refactor compiles under Mosaic and stays numerically
correct on hardware (interpret-mode tests can't catch Mosaic-only
lowering differences like the reciprocal-division gate hazard,
CLAUDE.md).

Usage: python -m tools.validate_kernels_tpu  (from the repo root)
"""

import sys
import time

import numpy as np


def _check(name, actual, expected, atol):
    err = float(np.max(np.abs(np.asarray(actual, np.float32)
                              - np.asarray(expected, np.float32))))
    status = "OK " if err <= atol else "FAIL"
    print(f"{status} {name}: max err {err:.2e} (atol {atol:g})")
    return err <= atol


def main() -> int:
    import jax
    import jax.numpy as jnp

    from fourier_feature_nets_tpu.models import NeRF, flagship_nerf
    from fourier_feature_nets_tpu.ops.fused_nerf import (
        fused_nerf_apply,
        on_tpu_default,
        prepare_fused_nerf,
    )
    from fourier_feature_nets_tpu.ops.fused_nerf_train import (
        fused_nerf_train_apply,
        model_statics,
        pack_fused_nerf,
    )
    from fourier_feature_nets_tpu.ops.fused_ray_render import (
        fused_ray_render,
    )
    from fourier_feature_nets_tpu.render.raycaster import Raycaster
    from fourier_feature_nets_tpu.render.ray_sampler import RaySamples

    device = jax.devices()[0]
    print(f"device: {device}", file=sys.stderr)
    ok = True
    rng = np.random.default_rng(0)

    configs = [
        ("flagship 8x256", flagship_nerf()),
        ("2x32 no-skip no-raw",
         NeRF(num_layers=2, num_channels=32, max_log_scale_pos=3.0,
              num_freq_pos=4, max_log_scale_view=1.0, num_freq_view=2,
              skips=[], include_inputs=False)),
    ]

    for label, model in configs:
        params = model.init(jax.random.PRNGKey(0))
        n = 4096
        pos = jnp.asarray(rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32))
        views = rng.normal(size=(n, 3)).astype(np.float32)
        views /= np.linalg.norm(views, axis=-1, keepdims=True)
        views = jnp.asarray(views)
        ref = np.asarray(model.apply(params, pos, views))

        # inference kernel, f32 (tight) and bf16 (production dtype)
        t0 = time.time()
        w32 = prepare_fused_nerf(model, params, dtype=jnp.float32)
        out = fused_nerf_apply(model, w32, pos, views, tile=2048)
        ok &= _check(f"fused_nerf f32 [{label}]", out, ref, 5e-3)
        wbf = prepare_fused_nerf(model, params, dtype=jnp.bfloat16)
        out = fused_nerf_apply(model, wbf, pos, views, tile=2048)
        ok &= _check(f"fused_nerf bf16 [{label}]", out, ref, 0.2)

        # feature-major (serving default) layout, same tolerances
        from fourier_feature_nets_tpu.ops.fused_nerf_fm import (
            prepare_fused_nerf_fm,
        )
        w32fm = prepare_fused_nerf_fm(model, params, dtype=jnp.float32)
        out = fused_nerf_apply(model, w32fm, pos, views, tile=2048)
        ok &= _check(f"fused_nerf_fm f32 [{label}]", out, ref, 5e-3)
        wbffm = prepare_fused_nerf_fm(model, params,
                                      dtype=jnp.bfloat16)
        out = fused_nerf_apply(model, wbffm, pos, views, tile=2048)
        ok &= _check(f"fused_nerf_fm bf16 [{label}]", out, ref, 0.2)
        print(f"  (compile+run {time.time() - t0:.1f}s)",
              file=sys.stderr)

        # training kernel: forward + gradient parity vs autodiff
        statics = model_statics(model, dtype=jnp.float32)
        target = jnp.asarray(rng.uniform(0, 1, (n, 4)).astype(np.float32))

        def loss_fused(p, model=model, statics=statics, pos=pos,
                       views=views, target=target):
            packed = pack_fused_nerf(model, p, jnp.float32)
            out = fused_nerf_train_apply(statics, packed, pos, views,
                                         512, not on_tpu_default())
            return jnp.mean(jnp.square(jax.nn.sigmoid(out) - target))

        def loss_ref(p, model=model, pos=pos, views=views,
                     target=target):
            out = model.apply(p, pos, views)
            return jnp.mean(jnp.square(jax.nn.sigmoid(out) - target))

        from fourier_feature_nets_tpu.ops.fused_nerf_train_fm import (
            fused_nerf_train_apply_fm,
            model_statics_fm,
            pack_fused_nerf_fm,
        )
        statics_fm = model_statics_fm(model, dtype=jnp.float32)

        def loss_fused_fm(p, model=model, statics=statics_fm, pos=pos,
                          views=views, target=target):
            packed = pack_fused_nerf_fm(model, p, jnp.float32)
            out = fused_nerf_train_apply_fm(statics, packed, pos,
                                            views, 512,
                                            not on_tpu_default())
            return jnp.mean(jnp.square(jax.nn.sigmoid(out) - target))

        t0 = time.time()
        l2, g2 = jax.jit(jax.value_and_grad(loss_ref))(params)
        for train_label, loss_fn in (("fused_train", loss_fused),
                                     ("fused_train_fm", loss_fused_fm)):
            l1, g1 = jax.jit(jax.value_and_grad(loss_fn))(params)
            ok &= _check(f"{train_label} loss [{label}]", l1, l2, 1e-4)
            grad_err = max(
                float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - b.astype(jnp.float32))))
                for a, b in zip(jax.tree.leaves(g1),
                                jax.tree.leaves(g2)))
            status = "OK " if grad_err < 5e-3 else "FAIL"
            ok &= grad_err < 5e-3
            print(f"{status} {train_label} grads [{label}]: "
                  f"max err {grad_err:.2e}")
        print(f"  (compile+run {time.time() - t0:.1f}s)",
              file=sys.stderr)

    # fully-fused ray renderer at the S values the gate bug hit
    model = NeRF(num_layers=4, num_channels=64, max_log_scale_pos=9.0,
                 num_freq_pos=10, max_log_scale_view=3.0,
                 num_freq_view=4, skips=[2], include_inputs=True)
    params = model.init(jax.random.PRNGKey(1))
    caster = Raycaster(model, fused=False)
    weights = prepare_fused_nerf(model, params, dtype=jnp.float32)
    for num_samples in (42, 48, 128):
        R = 64
        t = np.sort(rng.uniform(1, 4, (R, num_samples))
                    .astype(np.float32), -1)
        d = rng.normal(size=(R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        start = rng.uniform(-0.5, 0.5, (R, 3)).astype(np.float32)
        p3 = (start[:, None] + t[..., None] * d[:, None]).astype(
            np.float32)
        v3 = np.ascontiguousarray(np.broadcast_to(d[:, None], p3.shape))
        samples = RaySamples(jnp.asarray(p3), jnp.asarray(v3),
                             jnp.asarray(t), None)
        ref = caster.render(params, samples)
        out = fused_ray_render(model, weights, jnp.asarray(p3),
                               jnp.asarray(d), jnp.asarray(t))
        ok &= _check(f"fused_ray_render S={num_samples} color",
                     out[:, :3], ref.color, 5e-3)
        ok &= _check(f"fused_ray_render S={num_samples} alpha",
                     out[:, 3], ref.alpha, 5e-3)

    # --- fused kernels UNDER A DEVICE MESH on hardware (VERDICT r4
    # item 6: the dryrun pins fused=False and test_parallel covers the
    # composition in interpret mode only — this certifies the
    # shard_map + Pallas composition on the real chip) ---
    t0 = time.time()
    from fourier_feature_nets_tpu.datasets import ImageDataset
    from fourier_feature_nets_tpu.datasets.synthetic import (
        load_or_generate,
    )
    from fourier_feature_nets_tpu.parallel import (
        make_mesh,
        make_shard_map_train_step,
        replicate,
    )
    from fourier_feature_nets_tpu.utils import adam_init

    path = load_or_generate("/tmp/ffn_validate_scene.npz",
                            resolution=24)
    scene = ImageDataset.load(path, "train", num_samples=16)
    mesh = make_mesh()  # every local device (1 on a single real chip)
    print(f"mesh: {mesh.devices.shape} over {mesh.axis_names}",
          file=sys.stderr)
    model = NeRF(num_layers=2, num_channels=32, max_log_scale_pos=3.0,
                 num_freq_pos=4, max_log_scale_view=1.0,
                 num_freq_view=2, skips=[1], include_inputs=True)
    params = model.init(jax.random.PRNGKey(0))
    idx = jnp.asarray(scene.index_pool()[:128].astype(np.int32))
    mesh_losses = {}
    for fused_flag in (True, False):
        caster = Raycaster(model, fused_train=fused_flag)
        dp_step = make_shard_map_train_step(
            caster, scene, 128, 5e-4, 0.1, 250000, 0.0, mesh,
            fused=fused_flag, steps_per_call=3)
        p = replicate(jax.tree.map(jnp.copy, params), mesh)
        o = replicate(adam_init(params), mesh)
        p, o, loss = dp_step(p, o, idx, jnp.asarray(0, jnp.int32),
                             jnp.asarray(0, jnp.int32),
                             jax.random.PRNGKey(0))
        mesh_losses[fused_flag] = float(loss)
    ok &= _check("shard_map fused train step (mesh) loss",
                 mesh_losses[True], mesh_losses[False], 1e-3)

    # FM fused render_frame under shard_map vs single-device
    caster = Raycaster(model, fused=True)
    frame_mesh = caster.render_frame(params, scene.sampler, 0,
                                     chunk_size=2048, mesh=mesh)
    frame_one = caster.render_frame(params, scene.sampler, 0,
                                    chunk_size=2048)
    ok &= _check("render_frame fused under mesh (uint8)",
                 frame_mesh.astype(np.float32),
                 frame_one.astype(np.float32), 1.0)
    print(f"  (fused-under-mesh compile+run {time.time() - t0:.1f}s)",
          file=sys.stderr)

    print("ALL OK" if ok else "FAILURES — see above")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
