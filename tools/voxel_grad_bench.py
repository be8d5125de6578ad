"""Dense-voxel training-step A/B: XLA autodiff scatter backward vs
the cell-binned custom-VJP backward (ops/grid_sample.py
grid_sample_3d_fast) at the flagship dense-voxel shape
(128^3 x 4 grid, 1024 rays x 256 samples / step).

Timing: 20 full train steps (forward + volume integral + MSE + grads
+ clipped Adam) inside one lax.scan — bench.py chained-carry
methodology.

Usage: python -m tools.voxel_grad_bench [side] [num_points]
"""

import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from fourier_feature_nets_tpu.ops.grid_sample import (
        grid_sample_3d,
        grid_sample_3d_fast,
    )
    from fourier_feature_nets_tpu.utils import adam_init, adam_update

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    num_rays = 1024
    num_samples = 256
    num_points = (int(sys.argv[2]) if len(sys.argv) > 2
                  else num_rays * num_samples)
    scan_steps = 20

    key = jax.random.PRNGKey(0)
    grid = jax.random.normal(key, (side, side, side, 4),
                             jnp.float32) * 0.01
    coords = jax.random.uniform(jax.random.fold_in(key, 1),
                                (num_points, 3), jnp.float32, -1, 1)
    target = jax.random.uniform(jax.random.fold_in(key, 2),
                                (num_points, 4), jnp.float32)

    def make_step(sample_fn):
        @jax.jit
        def steps(grid, opt_state, carry):
            def body(c, _):
                grid, opt_state, carry = c

                def loss_fn(g):
                    out = sample_fn(g, coords + carry * 0.0)
                    return jnp.mean(jnp.square(out - target))

                loss, grads = jax.value_and_grad(loss_fn)(grid)
                grid, opt_state = adam_update(
                    {"g": grads}, opt_state, {"g": grid}, 0.01,
                    clip_value=0.1, clip_norm=0.1)
                return (grid["g"], opt_state, loss), loss

            (grid, opt_state, carry), _ = jax.lax.scan(
                body, (grid, opt_state, carry),
                jnp.arange(scan_steps, dtype=jnp.int32))
            return grid, opt_state, carry
        return steps

    for label, fn in (("autodiff-scatter", grid_sample_3d),
                      ("cell-binned", grid_sample_3d_fast)):
        step = make_step(fn)
        g, o, c = step(grid, adam_init({"g": grid}), jnp.float32(0.0))
        float(c)
        start = time.perf_counter()
        g, o, c = step(g, o, c)
        float(c)
        dt = (time.perf_counter() - start) / scan_steps
        print(f"{label}: {dt * 1e3:.2f} ms/step "
              f"({1.0 / dt:.1f} steps/s at {side}^3, "
              f"{num_points} points)")


if __name__ == "__main__":
    main()
