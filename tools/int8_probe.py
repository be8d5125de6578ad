"""Probe: does this TPU's Mosaic support int8 MXU matmuls in Pallas?

Three stages, each printed as it passes:
  1. compile+run a minimal int8 x int8 -> int32 dot_general kernel;
  2. numerics vs a NumPy int32 reference (must be exact);
  3. timing: chained int8 vs bf16 matmul stacks at student-kernel
     shapes (Co=Ci=192, tile=2048) to see whether the MXU actually
     doubles throughput or silently upcasts.

Run on real TPU:  python -m tools.int8_probe
(from the repo root so the axon plugin registers; CLAUDE.md).
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("device:", jax.devices()[0], file=sys.stderr)

    # --- stage 1+2: minimal int8 dot kernel, exact numerics ---
    Co, Ci, T = 128, 128, 256

    def k_int8(w_ref, h_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            w_ref[:], h_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    rng = np.random.default_rng(0)
    w = rng.integers(-127, 128, (Co, Ci), dtype=np.int8)
    h = rng.integers(-127, 128, (Ci, T), dtype=np.int8)

    try:
        out = pl.pallas_call(
            k_int8,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Co, T), jnp.int32),
        )(jnp.asarray(w), jnp.asarray(h))
        out = np.asarray(out)
    except Exception as error:
        print(f"stage1 FAIL: int8 dot kernel did not compile/run: "
              f"{str(error)[:500]}")
        return
    print("stage1 OK: int8 dot kernel compiled and ran")

    ref = w.astype(np.int32) @ h.astype(np.int32)
    if not np.array_equal(out, ref):
        bad = np.abs(out - ref).max()
        print(f"stage2 FAIL: numerics off, max abs err {bad}")
        return
    print("stage2 OK: exact int32 numerics")

    # --- stage 2b: the ops a quantized kernel needs alongside the dot
    # (f32->int8 rounding cast, int32->f32 dequant scale) ---
    def k_quant(x_ref, w_ref, o_ref):
        x = x_ref[:]
        scale = jnp.max(jnp.abs(x)) / 127.0 + 1e-30
        q = jnp.round(x / scale).astype(jnp.int8)
        acc = jax.lax.dot_general(
            w_ref[:], q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[:] = acc.astype(jnp.float32) * scale

    try:
        xf = rng.normal(size=(Ci, T)).astype(np.float32)
        outq = pl.pallas_call(
            k_quant,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Co, T), jnp.float32),
        )(jnp.asarray(xf), jnp.asarray(w))
        scale = np.abs(xf).max() / 127.0 + 1e-30
        qref = np.round(xf / scale).astype(np.int8)
        reff = (w.astype(np.int32) @ qref.astype(np.int32)
                ).astype(np.float32) * scale
        err = np.abs(np.asarray(outq) - reff).max()
        rel = err / (np.abs(reff).max() + 1e-30)
        print(f"stage2b OK: quantize+dot+dequant kernel runs, "
              f"max rel err vs numpy {rel:.2e}")
    except Exception as error:
        print(f"stage2b FAIL: quantize ops inside kernel: "
              f"{str(error)[:500]}")
        return

    # --- stage 3: throughput, int8 vs bf16, student shapes ---
    Co = Ci = 192
    T = 2048
    LAYERS = 8          # long chain so the dot dominates
    STEPS = 200

    def stack_kernel(dtype, acc_t):
        def kern(h_ref, *w_refs):
            out_ref = w_refs[-1]
            h = h_ref[:]
            for w_ref in w_refs[:-1]:
                acc = jax.lax.dot_general(
                    w_ref[:], h, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_t)
                # cheap nonlinearity to stop fusion tricks, then
                # re-cast to the input dtype for the next dot
                h = jnp.maximum(acc, 0).astype(dtype)
            out_ref[:] = h.astype(jnp.float32)
        return kern

    def bench(dtype, acc_t, name):
        ws = [jnp.asarray(
            rng.integers(-5, 6, (Co, Ci)).astype(dtype))
            for _ in range(LAYERS)]
        h0 = jnp.asarray(rng.integers(0, 6, (Ci, T)).astype(dtype))

        call = pl.pallas_call(
            stack_kernel(dtype, acc_t),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            * (1 + LAYERS),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Co, T), jnp.float32),
        )

        @jax.jit
        def loop(h0, carry):
            def body(c, _):
                out = call(h0 + c.astype(h0.dtype) * 0, *ws)
                return jnp.float32(out[0, 0] * 1e-9), None
            c, _ = jax.lax.scan(body, carry,
                                jnp.arange(STEPS, dtype=jnp.int32))
            return c

        c = loop(h0, jnp.float32(0))
        float(c)
        t0 = time.perf_counter()
        c = loop(h0, c)
        float(c)
        dt = (time.perf_counter() - t0) / STEPS
        flops = 2 * Co * Ci * T * LAYERS
        print(f"stage3 {name}: {dt * 1e6:.1f} us/call, "
              f"{flops / dt / 1e12:.2f} T(op)/s")
        return dt

    try:
        dt_bf16 = bench(jnp.bfloat16, jnp.float32, "bf16")
        dt_int8 = bench(jnp.int8, jnp.int32, "int8")
        print(f"stage3 ratio: int8 is {dt_bf16 / dt_int8:.2f}x bf16")
    except Exception as error:
        print(f"stage3 FAIL: {str(error)[:500]}")


if __name__ == "__main__":
    main()
