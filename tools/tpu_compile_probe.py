"""Probe whether the TPU compile service accepts flagship-sized kernels.

The axon tunnel intermittently hangs on larger Mosaic kernel compiles
(observed 2026-08-19 ~19:15: 8x256 FM/RM fused kernels wedge while
6x192 compiles in seconds). Run this bounded probe before launching
long TPU work: it compiles the flagship 8x256 FM inference kernel on a
tiny tile and prints OK/elapsed, or gets killed by the caller's
timeout.

Usage: timeout 300 python -u tools/tpu_compile_probe.py [layers chans]
"""
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    layers = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    chans = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax
    import jax.numpy as jnp

    from fourier_feature_nets_tpu.models.nerf import NeRF
    from fourier_feature_nets_tpu.ops import fused_nerf as fn
    from fourier_feature_nets_tpu.ops.fused_nerf_fm import (
        prepare_fused_nerf_fm)

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    model = NeRF(num_layers=layers, num_channels=chans,
                 max_log_scale_pos=9.0, num_freq_pos=10,
                 max_log_scale_view=3.0, num_freq_view=4,
                 skips=[4] if layers > 5 else [],
                 include_inputs=True)
    params = model.init(jax.random.PRNGKey(0))
    weights = prepare_fused_nerf_fm(model, params)

    pos = jnp.zeros((2048, 3), jnp.float32)
    views = jnp.zeros((2048, 3), jnp.float32)

    t0 = time.time()
    out = fn.fused_nerf_apply(model, weights, pos, views)
    val = float(jnp.sum(out).item())
    print(f"OK {layers}x{chans} compile+run {time.time() - t0:.1f}s "
          f"sum={val:.3f}", flush=True)


if __name__ == "__main__":
    main()
