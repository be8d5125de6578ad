"""Fused-kernel sub-chain interleave (ILP) experiment on real TPU.

The fused NeRF forward is one dependent matmul chain per tile; the
round-2 floor analysis measured it at ~42% MXU with the elementwise
work hidden, i.e. the residual cost is the chain itself (the MXU idles
during each inter-layer relu/cast hand-off). ``split=S`` processes a
tile as S independent sub-chains emitted stage-major, giving the
Mosaic scheduler off-chain matmuls to overlap those hand-offs with.

Usage: python -m tools.kernel_split_bench
"""

import time


def main():
    import jax
    import jax.numpy as jnp

    from fourier_feature_nets_tpu.models import flagship_nerf
    from fourier_feature_nets_tpu.ops.fused_nerf import (
        fused_nerf_apply,
        prepare_fused_nerf,
    )

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
            best = float("inf")
            for _ in range(3):
                start = time.perf_counter()
                c = run(c)
                float(c)
                best = min(best,
                           (time.perf_counter() - start) / scan_iters)
            print(f"{label:40s}: {best * 1e3:8.2f} ms "
                  f"({n / best / 1e6:6.1f} Mpts/s)")
        except Exception as e:
            print(f"{label:40s}: FAILED {str(e)[:140]}")

    for tile, split in ((2048, 1), (2048, 2), (2048, 4), (2048, 8),
                        (1024, 1), (1024, 2), (1024, 4),
                        (4096, 2), (4096, 4), (8192, 4)):
        def kern(c, tile=tile, split=split):
            out = fused_nerf_apply(model, weights, pos + c * 0.0, views,
                                   tile=tile, split=split)
            return c + jnp.sum(out) * 1e-9
        bench(f"tile {tile}, split {split}", kern)


if __name__ == "__main__":
    main()
