"""Measures _occupancy_matmul block-size sensitivity and the
3-plane conservative hit test on the real TPU.

Usage: python -m tools.probe_block_bench
"""

import time

import numpy as np


def chain(fn, *args, iters=5):
    import jax.numpy as jnp
    carry = fn(*args, jnp.float32(0.0))
    float(carry)
    start = time.perf_counter()
    for _ in range(iters):
        carry = fn(*args, carry)
    float(carry)
    return (time.perf_counter() - start) / iters


def main():
    import jax
    import jax.numpy as jnp

    from fourier_feature_nets_tpu.cameras import Resolution
    from fourier_feature_nets_tpu.octree import OcTree
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )
    from fourier_feature_nets_tpu.utils.camera_paths import orbit

    rng = np.random.default_rng(1)
    cloud = np.concatenate([
        rng.normal([0.2, 0.0, 0.0], 0.2, (20000, 3)),
        [[-1, -1, -1], [1, 1, 1]],
    ]).astype(np.float32)
    tree = OcTree.build_from_samples(cloud, depth=6, min_leaf_size=2)
    cameras = orbit(np.array([0.0, 1.0, 0.0]),
                    np.array([0.0, 0.0, 1.0]), 12, 40.0,
                    Resolution(800, 800), 4.0)
    bounds = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    sampler = OccupancyGridSampler(tree, cameras, 32,
                                   grid_resolution=64, num_probes=32,
                                   bounds=bounds)

    total = 655360
    idx_all = jnp.arange(total, dtype=jnp.int32) % sampler.rays_per_camera
    starts = sampler.starts[idx_all]
    dirs = sampler.directions[idx_all]
    near = sampler.near[idx_all]
    far = sampler.far[idx_all]

    from fourier_feature_nets_tpu.ops.sampling import batch_linspace
    edges = batch_linspace(near, far, sampler.num_probes + 1)
    mids = 0.5 * (edges[..., :-1] + edges[..., 1:])
    probe_pos = (starts[:, None, :] + mids[..., None] * dirs[:, None, :])
    flat_pts = probe_pos.reshape(-1, 3)
    print(f"probes: {flat_pts.shape[0]}")

    side = sampler._probe_resolution
    lanes = sampler._probe_lanes
    table = sampler.probe_table.astype(jnp.bfloat16)
    num_rows = table.shape[0]
    scale = sampler._grid_scale

    def probe_with_block(block):
        @jax.jit
        def run(flat_pts, c):
            pts = flat_pts + c * 0.0
            cell = jnp.clip(((pts / scale + 1.0) * 0.5 * side)
                            .astype(jnp.int32), 0, side - 1)
            flat = (cell[:, 2] * side + cell[:, 1]) * side + cell[:, 0]
            row = flat // lanes
            lane = flat % lanes
            n = flat.shape[0]
            pad = (-n) % block
            if pad:
                row = jnp.pad(row, (0, pad))
                lane = jnp.pad(lane, (0, pad))
            iota_row = jnp.arange(num_rows, dtype=jnp.int32)
            iota_lane = jnp.arange(lanes, dtype=jnp.int32)

            def probe_block(args):
                row_b, lane_b = args
                onehot = (row_b[:, None] == iota_row).astype(jnp.bfloat16)
                rows = jax.lax.dot(onehot, table,
                                   preferred_element_type=jnp.float32)
                sel = (lane_b[:, None] == iota_lane).astype(rows.dtype)
                return jnp.sum(rows * sel, -1)

            occ = jax.lax.map(probe_block, (row.reshape(-1, block),
                                            lane.reshape(-1, block)))
            return c + jnp.sum(occ) * 1e-9
        return run

    for block in (16384, 32768, 65536, 131072, 262144):
        try:
            t = chain(probe_with_block(block), flat_pts)
            print(f"3d probe block {block:7d}: {t * 1e3:8.1f} ms")
        except Exception as e:
            print(f"3d probe block {block:7d}: FAILED {str(e)[:120]}")

    # --- conservative 3-plane hit test ---
    grid = np.asarray(sampler.occupancy[..., 0])  # (res, res, res) z,y,x
    res = grid.shape[0]
    # project to side=64 planes, pad each 2d plane to 128 lanes rows
    xy = grid.max(0)   # (y, x)
    zx = grid.max(1)   # (z, x)
    zy = grid.max(2)   # (z, y)

    def plane_table(p):
        flat = p.reshape(-1).astype(np.float32)
        rows = -(-flat.size // 128)
        flat = np.pad(flat, (0, rows * 128 - flat.size))
        return jnp.asarray(flat.reshape(rows, 128), jnp.bfloat16)

    txy, tzx, tzy = plane_table(xy), plane_table(zx), plane_table(zy)
    prows = txy.shape[0]

    def plane_hit(block):
        @jax.jit
        def run(flat_pts, c):
            pts = flat_pts + c * 0.0
            cell = jnp.clip(((pts / scale + 1.0) * 0.5 * res)
                            .astype(jnp.int32), 0, res - 1)
            x, y, z = cell[:, 0], cell[:, 1], cell[:, 2]
            ids = jnp.stack([y * res + x, z * res + x, z * res + y])
            n = pts.shape[0]
            pad = (-n) % block
            if pad:
                ids = jnp.pad(ids, ((0, 0), (0, pad)))
            iota_row = jnp.arange(prows, dtype=jnp.int32)
            iota_lane = jnp.arange(128, dtype=jnp.int32)
            tables = [txy, tzx, tzy]

            def probe_block(args):
                occ = None
                for k in range(3):
                    fid = args[k]
                    row_b, lane_b = fid // 128, fid % 128
                    onehot = (row_b[:, None] == iota_row).astype(
                        jnp.bfloat16)
                    rows = jax.lax.dot(
                        onehot, tables[k],
                        preferred_element_type=jnp.float32)
                    sel = (lane_b[:, None] == iota_lane).astype(
                        rows.dtype)
                    val = jnp.sum(rows * sel, -1)
                    occ = val if occ is None else jnp.minimum(occ, val)
                return occ

            occ = jax.lax.map(probe_block,
                              tuple(i.reshape(-1, block) for i in ids))
            return c + jnp.sum(occ) * 1e-9
        return run

    for block in (16384, 65536, 131072):
        try:
            t = chain(plane_hit(block), flat_pts)
            print(f"3-plane hit block {block:7d}: {t * 1e3:8.1f} ms")
        except Exception as e:
            print(f"3-plane hit block {block:7d}: FAILED {str(e)[:120]}")

    # hit-fraction comparison: exact vs plane-conservative
    @jax.jit
    def exact_hit():
        _, _, hit = sampler._probe_cdf_geometry(starts, dirs, near, far)
        return jnp.sum(hit.astype(jnp.int32))

    @jax.jit
    def plane_hit_count():
        pts = flat_pts
        cell = jnp.clip(((pts / scale + 1.0) * 0.5 * res)
                        .astype(jnp.int32), 0, res - 1)
        x, y, z = cell[:, 0], cell[:, 1], cell[:, 2]
        occ = jnp.minimum(
            jnp.minimum(jnp.asarray(xy.reshape(-1))[y * res + x],
                        jnp.asarray(zx.reshape(-1))[z * res + x]),
            jnp.asarray(zy.reshape(-1))[z * res + y])
        hit = occ.reshape(total, -1).max(-1) > 0
        return jnp.sum(hit.astype(jnp.int32))

    print(f"exact hits: {int(exact_hit())}, "
          f"plane-conservative hits: {int(plane_hit_count())} "
          f"of {total}")


if __name__ == "__main__":
    main()
