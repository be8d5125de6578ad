"""Fused-kernel tile-size + composite-cost experiments on real TPU.

Usage: python -m tools.kernel_tile_bench
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fourier_feature_nets_tpu.models import flagship_nerf
    from fourier_feature_nets_tpu.ops.fused_nerf import (
        fused_nerf_apply,
        prepare_fused_nerf,
    )
    from fourier_feature_nets_tpu.render.raycaster import _composite

    model = flagship_nerf()
    params = model.init(jax.random.PRNGKey(0))
    weights = prepare_fused_nerf(model, params, dtype=jnp.bfloat16)

    rays, samples = 16384, 32
    t_vals = jnp.linspace(1.0, 4.0, samples)[None].repeat(rays, 0)
    d = jax.random.normal(jax.random.PRNGKey(0), (rays, 3))
    d = d / jnp.linalg.norm(d, -1, keepdims=True)
    pos = (jnp.zeros((rays, 1, 3))
           + t_vals[..., None] * d[:, None]).reshape(-1, 3)
    views = jnp.broadcast_to(d[:, None], (rays, samples, 3)).reshape(-1, 3)
    n = pos.shape[0]
    scan_iters = 20

    def bench(label, fn):
        @jax.jit
        def run(c):
            def body(carry, _):
                return fn(carry), None
            c, _ = jax.lax.scan(body, c,
                                jnp.arange(scan_iters, dtype=jnp.int32))
            return c
        try:
            c = run(jnp.float32(0.0))
            float(c)
            start = time.perf_counter()
            c = run(c)
            float(c)
            dt = (time.perf_counter() - start) / scan_iters
            print(f"{label:40s}: {dt * 1e3:8.2f} ms "
                  f"({n / dt / 1e6:6.1f} Mpts/s)")
        except Exception as e:
            print(f"{label:40s}: FAILED {str(e)[:140]}")

    for tile in (1024, 2048, 4096, 8192):
        def kern(c, tile=tile):
            out = fused_nerf_apply(model, weights, pos + c * 0.0, views,
                                   tile=tile)
            return c + jnp.sum(out) * 1e-9
        bench(f"kernel only, tile {tile}", kern)

    def kern_composite(c):
        out = fused_nerf_apply(model, weights, pos + c * 0.0, views,
                               tile=2048)
        res = _composite(out.reshape(rays, samples, 4), t_vals, False)
        return c + jnp.sum(res.color) * 1e-9
    bench("kernel + composite, tile 2048", kern_composite)

    # XLA reference for the same batch
    def xla_fwd(c):
        out = model.apply(params, pos.reshape(-1, 3) + c * 0.0, views,
                          compute_dtype=jnp.bfloat16)
        return c + jnp.sum(out) * 1e-9
    bench("XLA forward (bf16)", xla_fwd)


if __name__ == "__main__":
    main()
