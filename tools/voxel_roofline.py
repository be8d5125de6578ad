"""Roofline for the dense-Voxels backward (grid_sample_3d_fast VJP).

Round 3 took the 128^3 dense-voxel train step 99.4 -> 60.4 ms with
the cell-binned scatter VJP and asserted "the remaining cost is the
irreducible N-row scatter" without bounding it. This tool produces
the bound: it measures the chip's streaming HBM bandwidth, times each
backward component in isolation (the N-row scatter-add, the eight
rolled corner adds + border folds, the forward gather), computes the
bytes each component must move, and prints measured-vs-bandwidth-floor
so the gap is a number rather than a claim. It also measures the two
cheap layout attempts at the scatter gap (split-accumulator parallel
scatters; bf16 contribution rows) so the conclusion carries its own
negative/positive evidence. Reference anchor: the PyTorch kernel this
path must dominate is F.grid_sample's backward
(/root/reference/fourier_feature_nets/voxels_model.py:35-43).

All timings use the chained-carry lax.scan methodology (bench.py):
inputs generated on device, iterations dependency-chained through a
carry of the COMPONENT'S OUTPUT TYPE (so the output must actually
materialize), one scalar fetched at the end.

Usage: python -m tools.voxel_roofline [side] [num_points]
"""

import sys
import time


def _time_scan(fn, init_carry, *args, scan_steps=20):
    """Seconds per iteration of ``fn(carry, *args) -> carry`` (same
    pytree type) inside one compiled lax.scan. Large operands must
    ride in ``args`` — closure constants above ~100 MB blow the
    remote-compile payload limit (CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(carry, *args):
        def body(c, _):
            return fn(c, *args), None
        carry, _ = jax.lax.scan(body, carry,
                                jnp.arange(scan_steps, dtype=jnp.int32))
        return carry

    carry = run(init_carry, *args)
    float(jnp.sum(jax.tree.leaves(carry)[0][:1]))
    start = time.perf_counter()
    carry = run(carry, *args)
    float(jnp.sum(jax.tree.leaves(carry)[0][:1]))
    return (time.perf_counter() - start) / scan_steps


def main():
    import jax
    import jax.numpy as jnp

    from fourier_feature_nets_tpu.ops.grid_sample import (
        _corner_offsets,
        _unnormalize,
        grid_sample_3d,
        grid_sample_3d_fast,
    )

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    num_points = int(sys.argv[2]) if len(sys.argv) > 2 else 1024 * 256
    channels = 4
    pd = ph = pw = side + 2

    key = jax.random.PRNGKey(0)
    grid = jax.random.normal(key, (side, side, side, channels),
                             jnp.float32) * 0.01
    coords = jax.random.uniform(jax.random.fold_in(key, 1),
                                (num_points, 3), jnp.float32, -1, 1)
    g_out = jax.random.normal(jax.random.fold_in(key, 2),
                              (num_points, channels), jnp.float32)

    # ---- 1. streaming HBM bandwidth (read + write a large array) ----
    big = jnp.zeros((64 * 1024 * 1024,), jnp.float32)  # 256 MB

    dt = _time_scan(lambda c: c + 1.0, big)
    hbm_bw = 2 * big.nbytes / dt
    print(f"HBM streaming bandwidth: {hbm_bw / 1e9:.0f} GB/s "
          f"({dt * 1e3:.3f} ms for 512 MB moved)")

    def floor_ms(nbytes):
        return nbytes / hbm_bw * 1e3

    # ---- shared index/contribution prep (device, computed once) ----
    clamped = jnp.clip(coords, -1.0, 1.0)
    xc = _unnormalize(clamped[:, 0], side)
    yc = _unnormalize(clamped[:, 1], side)
    zc = _unnormalize(clamped[:, 2], side)
    x0f, y0f, z0f = jnp.floor(xc), jnp.floor(yc), jnp.floor(zc)
    wx = jnp.stack([1 - (xc - x0f), xc - x0f], -1)
    wy = jnp.stack([1 - (yc - y0f), yc - y0f], -1)
    wz = jnp.stack([1 - (zc - z0f), zc - z0f], -1)
    cw = (wz[:, :, None, None] * wy[:, None, :, None]
          * wx[:, None, None, :]).reshape(-1, 8)
    base = (((z0f.astype(jnp.int32) + 1) * ph
             + (y0f.astype(jnp.int32) + 1)) * pw
            + (x0f.astype(jnp.int32) + 1))
    rows = (g_out[:, None, :] * cw[..., None]).reshape(
        -1, 8 * channels)
    rows = jax.block_until_ready(rows)
    row_bytes = 8 * channels * 4
    acc_bytes = pd * ph * pw * 8 * channels * 4

    # ---- 2. the N-row scatter-add in isolation ----
    # carry = the binned accumulator itself, so the scatter result is
    # the loop state and cannot be elided
    binned_shape = (pd * ph * pw, 8 * channels)

    def scatter_only(carry):
        binned = jnp.zeros(binned_shape, jnp.float32) + carry[:1, :1] * 0
        return binned.at[base].add(rows)

    dt_scatter = _time_scan(scatter_only, jnp.zeros(binned_shape),
                            scan_steps=10)
    # traffic: zero-init accumulator (write) + N rows read + N-row
    # read-modify-write on the accumulator (a generous locality
    # assumption — the true floor)
    scatter_bytes = acc_bytes + 3 * num_points * row_bytes
    print(f"\nscatter-add ({num_points} rows x {row_bytes} B): "
          f"{dt_scatter * 1e3:7.2f} ms   "
          f"BW floor {floor_ms(scatter_bytes):5.2f} ms   "
          f"gap {dt_scatter * 1e3 / floor_ms(scatter_bytes):6.1f}x   "
          f"({dt_scatter / num_points * 1e9:.0f} ns/row)")

    # ---- 3. rolls + folds in isolation ----
    binned_static = jax.block_until_ready(
        scatter_only(jnp.zeros(binned_shape)))

    def rolls_only(carry, binned_static):
        binned = (binned_static + carry[:1, :1, :1, :1]
                  * 0).reshape(pd, ph, pw, 8, channels)
        zbit, ybit, xbit = _corner_offsets()
        acc = jnp.zeros((pd, ph, pw, channels), jnp.float32)
        for corner in range(8):
            acc = acc + jnp.roll(
                binned[..., corner, :],
                (zbit[corner], ybit[corner], xbit[corner]),
                axis=(0, 1, 2))
        acc = acc.at[1].add(acc[0]).at[pd - 2].add(acc[pd - 1])
        acc = acc[1:pd - 1]
        acc = (acc.at[:, 1].add(acc[:, 0])
               .at[:, ph - 2].add(acc[:, ph - 1]))[:, 1:ph - 1]
        acc = (acc.at[:, :, 1].add(acc[:, :, 0])
               .at[:, :, pw - 2].add(acc[:, :, pw - 1]))[:, :, 1:pw - 1]
        return acc

    dt_rolls = _time_scan(
        rolls_only, jnp.zeros((side, side, side, channels)),
        binned_static)
    rolls_bytes = acc_bytes + 2 * pd * ph * pw * channels * 4
    print(f"rolls + border folds:                "
          f"{dt_rolls * 1e3:7.2f} ms   "
          f"BW floor {floor_ms(rolls_bytes):5.2f} ms   "
          f"gap {dt_rolls * 1e3 / floor_ms(rolls_bytes):6.1f}x")

    # ---- 4. forward gather + lerp in isolation ----
    def fwd_only(carry):
        return grid_sample_3d(grid, coords + carry[:, :3] * 0.0)

    dt_fwd = _time_scan(fwd_only, jnp.zeros((num_points, channels)))
    fwd_bytes = (8 * num_points * channels * 4
                 + num_points * (3 + channels) * 4)
    print(f"forward gather+lerp:                 "
          f"{dt_fwd * 1e3:7.2f} ms   "
          f"BW floor {floor_ms(fwd_bytes):5.2f} ms   "
          f"gap {dt_fwd * 1e3 / floor_ms(fwd_bytes):6.1f}x")

    # ---- 5. full VJP for reference ----
    def full_vjp(carry):
        def f(g):
            return jnp.sum(grid_sample_3d_fast(g, coords) * g_out)
        return jax.grad(f)(grid + carry * 1e-20)

    dt_full = _time_scan(full_vjp, jnp.zeros_like(grid), scan_steps=10)
    print(f"full custom-VJP backward:            {dt_full * 1e3:7.2f} ms")

    # ---- layout attempts at the scatter gap ----
    print("\nlayout attempts (scatter-add only):")

    # (a) split accumulators: S independent scatters + tree add.
    for shards in (2, 4, 8):
        per = num_points // shards

        def split_scatter(carry, shards=shards, per=per):
            parts = []
            for s in range(shards):
                binned = (jnp.zeros(binned_shape, jnp.float32)
                          + carry[:1, :1] * 0)
                parts.append(binned.at[
                    jax.lax.dynamic_slice_in_dim(base, s * per, per)
                ].add(jax.lax.dynamic_slice_in_dim(rows, s * per, per)))
            total = parts[0]
            for part in parts[1:]:
                total = total + part
            return total

        dt_split = _time_scan(split_scatter, jnp.zeros(binned_shape),
                              scan_steps=5)
        print(f"  {shards}-way split accumulators: "
              f"{dt_split * 1e3:7.2f} ms  "
              f"({dt_scatter / dt_split:.2f}x vs single scatter)")

    # (b) bf16 contribution rows (halves row/accumulator bytes; NOT
    # exact — a mixed-precision option, measured for the record)
    rows16 = rows.astype(jnp.bfloat16)

    def scatter_bf16(carry):
        binned = (jnp.zeros(binned_shape, jnp.bfloat16)
                  + carry[:1, :1] * 0)
        return binned.at[base].add(rows16)

    dt16 = _time_scan(scatter_bf16,
                      jnp.zeros(binned_shape, jnp.bfloat16),
                      scan_steps=10)
    print(f"  bf16 rows:                 {dt16 * 1e3:7.2f} ms  "
          f"({dt_scatter / dt16:.2f}x vs f32 scatter)")

    print(f"\nsummary: components fwd {dt_fwd * 1e3:.1f} + scatter "
          f"{dt_scatter * 1e3:.1f} + rolls {dt_rolls * 1e3:.1f} ms; "
          f"full bwd {dt_full * 1e3:.1f} ms; pure-bandwidth floor "
          f"{floor_ms(scatter_bytes + rolls_bytes + fwd_bytes):.1f} ms")


if __name__ == "__main__":
    main()
