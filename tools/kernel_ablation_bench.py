"""Fused-kernel ablations on real TPU: where do the non-MXU cycles go?

Variants (standalone copy of ops/fused_nerf._kernel, flagship config):
  base        — faithful copy of the production kernel
  bf16-accum  — body matmuls accumulate in bf16 (no per-layer cast)
  no-sincos   — encode phases only (bounds the Taylor sin/cos cost)
  no-view     — skip the view encode + hidden branch entirely

Usage: python -m tools.kernel_ablation_bench
"""

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fourier_feature_nets_tpu.models import flagship_nerf
    from fourier_feature_nets_tpu.ops.fused_nerf import (
        _fast_sincos,
        _phases,
        prepare_fused_nerf,
    )

    model = flagship_nerf()
    params = model.init(jax.random.PRNGKey(0))
    weights = prepare_fused_nerf(model, params, dtype=jnp.bfloat16)

    rays, samples, tile = 16384, 32, 2048
    t_vals = jnp.linspace(1.0, 4.0, samples)[None].repeat(rays, 0)
    d = jax.random.normal(jax.random.PRNGKey(0), (rays, 3))
    d = d / jnp.linalg.norm(d, -1, keepdims=True)
    pos = (jnp.zeros((rays, 1, 3))
           + t_vals[..., None] * d[:, None]).reshape(-1, 3)
    views = jnp.broadcast_to(d[:, None],
                             (rays, samples, 3)).reshape(-1, 3)
    n = pos.shape[0]

    # flagship: non-doubled encode => first_parts = (cos, sin, raw)
    assert len(weights.first_parts) == 3
    assert len(weights.hidden_parts) == 4
    skip_parts = weights.skip_parts[0]

    def make_kernel(mode):
        body_accum = (jnp.bfloat16 if mode == "bf16-accum"
                      else jnp.float32)

        def dot(a, w_ref, accum=jnp.float32):
            return jax.lax.dot_general(
                a, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=accum)

        def kernel(positions_ref, views_ref, pos_enc_ref, view_enc_ref,
                   fp0, fp1, fp2, first_b, m0, m1, m2, m3, m4, m5,
                   mb0, mb1, mb2, mb3, mb4, mb5,
                   sp0, sp1, sp2, sp3, sb0,
                   opacity_w, opacity_b, bottleneck_w, bottleneck_b,
                   hp0, hp1, hp2, hp3, hidden_b, color_w, color_b,
                   out_ref):
            cd = jnp.bfloat16
            pos = positions_ref[:]
            if mode == "no-sincos":
                ph = _phases(pos, pos_enc_ref)
                enc = [ph.astype(cd), (ph * 0.5).astype(cd),
                       pos.astype(cd)]
            else:
                sin, cos = _fast_sincos(_phases(pos, pos_enc_ref))
                enc = [cos.astype(cd), sin.astype(cd), pos.astype(cd)]

            first = [fp0, fp1, fp2]

            def enc_dot(parts, accum):
                acc = dot(enc[0], parts[0], accum)
                for feat, w in zip(enc[1:], parts[1:]):
                    acc += dot(feat, w, accum)
                return acc

            use_bias = mode not in ("no-bias", "matmul-only")
            use_relu = mode not in ("no-relu", "matmul-only")

            def post(acc, b):
                if use_bias:
                    acc = acc + b[:].astype(acc.dtype)
                acc = acc.astype(cd)
                if use_relu:
                    acc = jnp.maximum(acc, 0.0)
                return acc

            h = post(enc_dot(first, body_accum), first_b)
            mids = [m0, m1, m2, m3, m4, m5]
            mbs = [mb0, mb1, mb2, mb3, mb4, mb5]
            mid_iter = 0
            for i in range(1, 8):
                if i == 4:
                    acc = (dot(h, sp0, body_accum)
                           + enc_dot([sp1, sp2, sp3], body_accum))
                    h = post(acc, sb0)
                else:
                    acc = dot(h, mids[mid_iter], body_accum)
                    h = post(acc, mbs[mid_iter])
                    mid_iter += 1

            opacity = dot(h, opacity_w) + opacity_b[:]
            bottleneck = (dot(h, bottleneck_w)
                          + bottleneck_b[:]).astype(cd)

            if mode == "no-view":
                color = opacity * 0.0 + color_b[:]
            else:
                v = views_ref[:]
                v_sin, v_cos = _fast_sincos(_phases(v, view_enc_ref))
                venc = [v_cos.astype(cd), v_sin.astype(cd),
                        v.astype(cd)]
                acc = dot(bottleneck, hp0)
                for feat, w in zip(venc, [hp1, hp2, hp3]):
                    acc += dot(feat, w)
                hidden = jnp.maximum(acc + hidden_b[:], 0.0).astype(cd)
                color = dot(hidden, color_w) + color_b[:]

            out_ref[:] = jnp.concatenate(
                [color[:, :3], opacity[:, :1]], -1)

        return kernel

    weight_inputs = (list(weights.first_parts) + [weights.first_b]
                     + list(weights.mid_w) + list(weights.mid_b)
                     + list(skip_parts) + list(weights.skip_b)
                     + [weights.opacity_w, weights.opacity_b,
                        weights.bottleneck_w, weights.bottleneck_b]
                     + list(weights.hidden_parts)
                     + [weights.hidden_b, weights.color_w,
                        weights.color_b])

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((tile, 3), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 3), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        const_spec(weights.pos_enc.shape),
        const_spec(weights.view_enc.shape),
    ] + [const_spec(w.shape) for w in weight_inputs]

    def make_call(mode):
        call = pl.pallas_call(
            make_kernel(mode),
            grid=(n // tile,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        )

        @jax.jit
        def run(c):
            def body(carry, _):
                out = call(pos + carry * 0.0, views, weights.pos_enc,
                           weights.view_enc, *weight_inputs)
                return carry + jnp.sum(out) * 1e-9, None
            c, _ = jax.lax.scan(body, c,
                                jnp.arange(20, dtype=jnp.int32))
            return c
        return run

    for mode in ("base", "no-view", "no-bias", "no-relu", "matmul-only"):
        try:
            run = make_call(mode)
            c = run(jnp.float32(0.0))
            float(c)
            start = time.perf_counter()
            c = run(c)
            float(c)
            dt = (time.perf_counter() - start) / 20
            print(f"{mode:12s}: {dt * 1e3:8.2f} ms "
                  f"({n / dt / 1e6:6.1f} Mpts/s)")
        except Exception as e:
            print(f"{mode:12s}: FAILED {str(e)[:140]}")


if __name__ == "__main__":
    main()
