"""Benchmark: flagship NeRF render + train throughput on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: NeRF render throughput in rays/second on one chip
(the orbit_video.py path: 128 samples/ray through the full 8x256
view-dependent NeRF). Baseline anchor: the BASELINE.json north star of
800x800 @ 20 FPS on a v5e-8 = 12.8M rays/s, i.e. 1.6M rays/s/chip;
vs_baseline = measured_per_chip / 1.6e6. Diagnostics (train step
throughput, f32 vs bf16) go to stderr.
"""

import json
import sys
import time

import numpy as np


def _time_fn(fn, *args, warmup=2, iters=10):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters


def main():
    import jax
    import jax.numpy as jnp

    from fourier_feature_nets_tpu.models import NeRF
    from fourier_feature_nets_tpu.render.ray_sampler import RaySamples
    from fourier_feature_nets_tpu.render.raycaster import Raycaster
    from fourier_feature_nets_tpu.utils import adam_init, adam_update

    device = jax.devices()[0]
    print(f"device: {device}", file=sys.stderr)

    model = NeRF(num_layers=8, num_channels=256, max_log_scale_pos=9.0,
                 num_freq_pos=10, max_log_scale_view=3.0, num_freq_view=4,
                 skips=[4], include_inputs=True)
    params = model.init(jax.random.PRNGKey(0))

    num_samples = 128
    render_rays = 16384
    train_rays = 1024

    rng = np.random.default_rng(0)

    def make_ray_batch(num_rays):
        t = np.sort(rng.uniform(1.0, 4.0, (num_rays, num_samples))
                    .astype(np.float32), -1)
        d = rng.normal(size=(num_rays, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        s = rng.uniform(-1, 1, (num_rays, 3)).astype(np.float32)
        pos = (s[:, None] + t[..., None] * d[:, None]).astype(np.float32)
        views = np.ascontiguousarray(np.broadcast_to(d[:, None], pos.shape))
        return (jnp.asarray(pos), jnp.asarray(views), jnp.asarray(t))

    results = {}
    for name, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        caster = Raycaster(model, compute_dtype=dtype)

        @jax.jit
        def render_fn(params, pos, views, t):
            samples = RaySamples(pos, views, t, None)
            out = caster.render(params, samples, include_depth=False)
            return out.color, out.alpha

        batch = make_ray_batch(render_rays)
        dt = _time_fn(render_fn, params, *batch)
        results[f"render_rays_per_sec_{name}"] = render_rays / dt
        print(f"render {name}: {render_rays / dt / 1e6:.3f} Mrays/s "
              f"({dt * 1e3:.2f} ms / {render_rays} rays)", file=sys.stderr)

        # training step (render + loss + grads + clipped Adam)
        opt_state = adam_init(params)
        target_color = jnp.asarray(
            rng.uniform(0, 1, (train_rays, 3)).astype(np.float32))
        target_alpha = jnp.asarray(
            (rng.uniform(0, 1, train_rays) > 0.5).astype(np.float32))

        @jax.jit
        def train_step(params, opt_state, pos, views, t):
            samples = RaySamples(pos, views, t, None)

            def loss_fn(p):
                out = caster.render(p, samples, include_depth=False)
                return (jnp.mean(jnp.square(out.color - target_color))
                        + 0.1 * jnp.mean(jnp.square(out.alpha
                                                    - target_alpha)))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            params, opt_state = adam_update(grads, opt_state, params,
                                            5e-4, weight_decay=1e-6,
                                            clip_value=0.1, clip_norm=0.1)
            return params, opt_state, loss

        tbatch = make_ray_batch(train_rays)
        p = jax.tree.map(jnp.copy, params)

        def step_once(p, o, *b):
            return train_step(p, o, *b)

        # time without donation side effects: rebuild state each iter
        for _ in range(2):
            out = train_step(p, opt_state, *tbatch)
        jax.block_until_ready(out)
        iters = 20
        start = time.perf_counter()
        pp, oo = p, opt_state
        for _ in range(iters):
            pp, oo, loss = train_step(pp, oo, *tbatch)
        jax.block_until_ready((pp, loss))
        dt_train = (time.perf_counter() - start) / iters
        results[f"train_steps_per_sec_{name}"] = 1.0 / dt_train
        print(f"train {name}: {1.0 / dt_train:.2f} steps/s "
              f"({dt_train * 1e3:.2f} ms/step, batch {train_rays}x"
              f"{num_samples})", file=sys.stderr)

    headline = results["render_rays_per_sec_bf16"]
    per_chip_target = 12.8e6 / 8  # north-star: 800^2 @ 20FPS on v5e-8
    print(json.dumps({
        "metric": "nerf_render_rays_per_sec_per_chip",
        "value": round(headline, 1),
        "unit": "rays/s",
        "vs_baseline": round(headline / per_chip_target, 4),
    }))


if __name__ == "__main__":
    main()
