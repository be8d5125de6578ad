"""Benchmarks early ray termination on the production frame path.

Renders pipelined orbit frames on a trained model (density-grid
occupancy sampler, fused NeRF) with early termination off and on, and
reports ms/frame plus the pixel delta of the terminated frames vs the
full render — the decision measurement for the roadmap's
"early ray termination needs measurement before believing" item.

Usage:
  python -m tools.early_term_bench <model.npz> [res] [samples]
"""

import sys

import numpy as np

from tools._eval_common import pipelined_frame_seconds


def main():
    import jax

    from fourier_feature_nets_tpu.cameras import Resolution
    from fourier_feature_nets_tpu.models import load_model
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )
    from fourier_feature_nets_tpu.render.raycaster import Raycaster
    from fourier_feature_nets_tpu.utils.camera_paths import orbit

    model, params = load_model(sys.argv[1])
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    num_samples = int(sys.argv[3]) if len(sys.argv) > 3 else 48

    bounds = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    cameras = orbit(np.array([0.0, 1.0, 0.0]),
                    np.array([0.0, 0.0, -1.0]), 12, 40.0,
                    Resolution(res, res), 4.0)
    sampler = OccupancyGridSampler.from_model(
        model, params, cameras, num_samples, bounds=bounds,
        grid_resolution=64, num_probes=32)
    import jax.numpy as jnp
    caster = Raycaster(model, compute_dtype=jnp.bfloat16, fused=True)

    def loop(early_term, early_split):
        return pipelined_frame_seconds(
            lambda frame: caster.render_frame_async(
                params, sampler, frame, early_term=early_term,
                early_split=early_split))

    base_ms = loop(0.0, 0) * 1e3
    print(f"baseline (no early term): {base_ms:.1f} ms/frame")

    base_img = caster.render_frame(params, sampler, 1)
    for eps, split in ((1e-3, num_samples // 2),
                       (1e-2, num_samples // 2),
                       (1e-3, num_samples // 3),
                       (1e-2, num_samples // 3)):
        dt = loop(eps, split) * 1e3
        img = caster.render_frame(params, sampler, 1,
                                  early_term=eps, early_split=split)
        delta = np.abs(img.astype(int) - base_img.astype(int))
        mse = np.mean((img / 255.0 - base_img / 255.0) ** 2)
        psnr = -10 * np.log10(max(mse, 1e-12))
        print(f"early eps={eps:g} split={split}: {dt:.1f} ms/frame "
              f"({base_ms / dt:.2f}x), max|delta|={delta.max()} LSB, "
              f"frac>1LSB={np.mean(delta > 1):.2%}, "
              f"PSNR vs full={psnr:.1f} dB")


if __name__ == "__main__":
    main()
