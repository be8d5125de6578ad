"""Fused-kernel IO-floor diagnosis on real TPU (round 4).

Motivation: distilled students (4x128, 2x64) render barely faster
than their FLOP ratio suggests — the fused kernel's time is nearly
model-size-invariant below 4x128. This bench isolates where that
floor lives:

  model sweep  — the production kernel at 8x256 / 4x128 / 2x64
                 (and 4x128 with encode frequencies cut to 6/2):
                 if encode transcendentals mattered, the freq cut
                 would show; it does not.
  io-narrow    — a pass-through kernel: read (tile,3) positions +
                 (tile,3) views, write (tile,4). No math. This is
                 ~82% of the student kernel's time.
  io-wide      — read+write (tile,128): 43x the bytes, LESS time
                 (bandwidth-bound) — so the narrow variant is not
                 paying for bytes.
  packed8      — positions+views packed in ONE (tile,8) input:
                 only ~12% under io-narrow — not per-buffer latency
                 either.
  tile sweep   — io-narrow at tile 4096 is identical to 2048: not
                 per-grid-step overhead.

Conclusion (recorded in docs/RESULTS.md § Distillation): the floor
is the narrow-row strided DMA — 12-16 B logical rows land in 512 B
lane-padded VMEM rows at a per-row descriptor cost (~6 ns/row
aggregate). It is invariant to tile size and barely reducible by
packing; tiles >= 8192 (narrow) / >= 4096 (full kernel) fail to
compile (Mosaic/VMEM).

Usage: python -m tools.kernel_io_floor_bench
"""

import time

import numpy as np


def _timed(label, run, n, scan_iters):
    try:
        import jax.numpy as jnp
        c = run(jnp.float32(0.0))
        float(c)
        t0 = time.perf_counter()
        float(run(jnp.float32(0.0)))
        dt = (time.perf_counter() - t0) / scan_iters
        print(f"{label:18s}: {dt * 1e3:7.2f} ms "
              f"({n / dt / 1e6:6.1f} Mrows/s)")
    except Exception as exc:  # Mosaic/VMEM compile limits
        print(f"{label:18s}: FAILED {type(exc).__name__}: "
              f"{str(exc)[:100]}")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fourier_feature_nets_tpu.models import NeRF
    from fourier_feature_nets_tpu.ops.fused_nerf import (
        fused_nerf_apply,
        prepare_fused_nerf,
    )

    rays, samples = 16384, 48
    n = rays * samples
    scan_iters = 20
    pos = jax.random.normal(jax.random.PRNGKey(0), (n, 3))
    views = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    views = views / jnp.linalg.norm(views, -1, keepdims=True)
    packed = jnp.concatenate([pos, views, jnp.zeros((n, 2))], -1)
    wide = jnp.zeros((n, 128), jnp.float32)

    # --- production kernel across model sizes ---
    def model_run(layers, channels, fpos=10, fview=4):
        model = NeRF(num_layers=layers, num_channels=channels,
                     max_log_scale_pos=9.0, num_freq_pos=fpos,
                     max_log_scale_view=3.0, num_freq_view=fview,
                     skips=[max(1, layers // 2)], include_inputs=True)
        params = model.init(jax.random.PRNGKey(0))
        weights = prepare_fused_nerf(model, params,
                                     dtype=jnp.bfloat16)

        @jax.jit
        def run(c):
            def body(carry, _):
                out = fused_nerf_apply(model, weights,
                                       pos + carry * 0.0, views,
                                       tile=2048)
                return carry + jnp.sum(out) * 1e-9, None
            c, _ = jax.lax.scan(body, c, None, length=scan_iters)
            return c

        return run

    for layers, channels, fpos, fview in ((8, 256, 10, 4),
                                          (4, 128, 10, 4),
                                          (4, 128, 6, 2),
                                          (2, 64, 10, 4)):
        _timed(f"kernel {layers}x{channels} f{fpos}/{fview}",
               model_run(layers, channels, fpos, fview),
               n, scan_iters)

    # --- feature-major kernel (the fix this diagnosis produced):
    # samples ride the lane axis, so the narrow-row descriptor cost
    # disappears (3 DMA rows per tile instead of 2048) ---
    def model_run_fm(layers, channels):
        from fourier_feature_nets_tpu.ops.fused_nerf_fm import (
            prepare_fused_nerf_fm,
        )
        model = NeRF(num_layers=layers, num_channels=channels,
                     max_log_scale_pos=9.0, num_freq_pos=10,
                     max_log_scale_view=3.0, num_freq_view=4,
                     skips=[max(1, layers // 2)], include_inputs=True)
        params = model.init(jax.random.PRNGKey(0))
        weights = prepare_fused_nerf_fm(model, params,
                                        dtype=jnp.bfloat16)

        @jax.jit
        def run(c):
            def body(carry, _):
                out = fused_nerf_apply(model, weights,
                                       pos + carry * 0.0, views,
                                       tile=2048)
                return carry + jnp.sum(out) * 1e-9, None
            c, _ = jax.lax.scan(body, c, None, length=scan_iters)
            return c

        return run

    for layers, channels in ((8, 256), (4, 128), (2, 64)):
        _timed(f"kernel-fm {layers}x{channels}",
               model_run_fm(layers, channels), n, scan_iters)

    def spec(rows, w):
        return pl.BlockSpec((rows, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    # --- io-narrow at two tiles ---
    for tile in (2048, 4096):
        def io_kernel(p_ref, v_ref, out_ref):
            out_ref[:] = jnp.concatenate(
                [p_ref[:], v_ref[:, :1]], -1)

        call = pl.pallas_call(
            io_kernel, grid=(n // tile,),
            in_specs=[spec(tile, 3), spec(tile, 3)],
            out_specs=spec(tile, 4),
            out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32))

        @jax.jit
        def run(c, call=call):
            def body(carry, _):
                out = call(pos + carry * 0.0, views)
                return carry + jnp.sum(out) * 1e-9, None
            c, _ = jax.lax.scan(body, c, None, length=scan_iters)
            return c

        _timed(f"io-narrow t{tile}", run, n, scan_iters)

    # --- io-wide ---
    tile = 2048

    def io_wide_kernel(x_ref, out_ref):
        out_ref[:] = x_ref[:] * 2.0

    iow_call = pl.pallas_call(
        io_wide_kernel, grid=(n // tile,),
        in_specs=[spec(tile, 128)],
        out_specs=spec(tile, 128),
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32))

    @jax.jit
    def run_iow(c):
        def body(carry, _):
            out = iow_call(wide + carry)
            return carry + jnp.sum(out) * 1e-12, None
        c, _ = jax.lax.scan(body, c, None, length=scan_iters)
        return c

    _timed("io-wide", run_iow, n, scan_iters)

    # --- packed8 ---
    def p8_kernel(x_ref, out_ref):
        x = x_ref[:]
        out_ref[:] = jnp.concatenate(
            [x[:, :3], x[:, 3:4], x[:, :4] * 0.0], -1)

    p8_call = pl.pallas_call(
        p8_kernel, grid=(n // tile,),
        in_specs=[spec(tile, 8)],
        out_specs=spec(tile, 8),
        out_shape=jax.ShapeDtypeStruct((n, 8), jnp.float32))

    @jax.jit
    def run_p8(c):
        def body(carry, _):
            out = p8_call(packed + carry * 0.0)
            return carry + jnp.sum(out) * 1e-9, None
        c, _ = jax.lax.scan(body, c, None, length=scan_iters)
        return c

    _timed("packed8", run_p8, n, scan_iters)


if __name__ == "__main__":
    main()
