"""Fused-kernel chunk cost across student NeRF sizes — sizing the
payoff of distilling the flagship 8x256 model into a smaller student
for serving. One 16384-ray chunk per timing (the render_frame
hit-chunk shape), chained inside a lax.scan.

Includes the MXU-alignment candidates: a 192-wide layer splits into
128+64 MXU tiles (56% utilization on the ragged passes), so 5x256 /
7x128 (fully 128-aligned) may beat 6x192 at similar parameter count.

Usage: python -m tools.student_kernel_bench [samples] [rm] [shape...]
  samples: samples/ray (default 32; serving preset is 48)
  rm: use the row-major kernel (default: feature-major, the
      production layout)
  shape: e.g. 7x128 — restrict to the named configs (default: all)
"""

import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from fourier_feature_nets_tpu.models import NeRF
    from fourier_feature_nets_tpu.ops.fused_nerf import (
        fused_nerf_apply,
        prepare_fused_nerf,
    )
    from fourier_feature_nets_tpu.ops.fused_nerf_fm import (
        prepare_fused_nerf_fm,
    )
    from fourier_feature_nets_tpu.render.raycaster import _composite

    argv = sys.argv[1:]
    samples = int(argv[0]) if argv and argv[0].isdigit() else 32
    layout_rm = "rm" in argv
    only = [a for a in argv if "x" in a and not a.isdigit()]
    prepare = prepare_fused_nerf if layout_rm else prepare_fused_nerf_fm
    print(f"layout: {'row-major' if layout_rm else 'feature-major'}, "
          f"{samples} samples/ray")
    rays = 16384
    t_vals = jnp.linspace(1.0, 4.0, samples)[None].repeat(rays, 0)
    d = jax.random.normal(jax.random.PRNGKey(0), (rays, 3))
    d = d / jnp.linalg.norm(d, -1, keepdims=True)
    pos = (jnp.zeros((rays, 1, 3))
           + t_vals[..., None] * d[:, None]).reshape(-1, 3)
    views = jnp.broadcast_to(d[:, None],
                             (rays, samples, 3)).reshape(-1, 3)
    scan_iters = 20

    configs = [
        ("8x256 (flagship)", dict(num_layers=8, num_channels=256,
                                  skips=[4])),
        ("8x128", dict(num_layers=8, num_channels=128, skips=[4])),
        ("6x256", dict(num_layers=6, num_channels=256, skips=[3])),
        ("6x192", dict(num_layers=6, num_channels=192, skips=[3])),
        ("5x256", dict(num_layers=5, num_channels=256, skips=[2])),
        ("7x128", dict(num_layers=7, num_channels=128, skips=[3])),
        ("4x256", dict(num_layers=4, num_channels=256, skips=[2])),
        ("4x128", dict(num_layers=4, num_channels=128, skips=[2])),
        ("4x64", dict(num_layers=4, num_channels=64, skips=[2])),
        ("2x128", dict(num_layers=2, num_channels=128, skips=[1])),
    ]

    if only:
        configs = [(label, cfg) for label, cfg in configs
                   if any(sel in label for sel in only)]

    for label, cfg in configs:
        model = NeRF(max_log_scale_pos=9.0, num_freq_pos=10,
                     max_log_scale_view=3.0, num_freq_view=4,
                     include_inputs=True, **cfg)
        params = model.init(jax.random.PRNGKey(0))
        weights = prepare(model, params, dtype=jnp.bfloat16)

        @jax.jit
        def run(c, weights=weights, model=model):
            def body(carry, _):
                flat = fused_nerf_apply(model, weights,
                                        pos + carry * 0.0, views)
                out = _composite(flat.reshape(rays, samples, 4),
                                 t_vals, False)
                return jnp.sum(out.color) * 1e-9, None
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
            print(f"{label:>20}: {dt * 1e3:7.2f} ms/chunk "
                  f"({rays * samples / dt / 1e6:6.1f} Mpts/s)")
        except Exception as error:
            print(f"{label:>20}: FAILED {str(error)[:120]}")


if __name__ == "__main__":
    main()
