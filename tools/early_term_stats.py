"""Measures the early-ray-termination potential of the frame path.

Early termination skips a ray's remaining samples once its
transmittance saturates (T -> 0: everything behind the accumulated
opacity is invisible). Before building any machinery (a phase-split
frame with survivor repartitioning) this tool measures the ceiling:
for a real frame's HIT rays, what fraction of model evaluations occur
at sample positions where the ray's incoming transmittance is already
below a threshold — i.e. evaluations whose contribution to the image
is bounded by T < eps.

Reports, per threshold eps:
  - wasted_frac: fraction of (hit-ray, sample) model evals with
    incoming T < eps (the un-exploitable ideal ceiling);
  - phase-split exploitable savings for K1 in {1/3, 1/2, 2/3} of the
    sample budget: fraction of hit rays saturated by sample K1 —
    those rays could skip the remaining S-K1 samples entirely.

Usage:
  python -m tools.early_term_stats                 # bench scene,
                                                   # random-init NeRF
  python -m tools.early_term_stats <model.npz> [res] [samples]
                                                   # trained model +
                                                   # density grid
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fourier_feature_nets_tpu.cameras import Resolution
    from fourier_feature_nets_tpu.ops.fused_nerf import (
        fused_nerf_apply,
        prepare_fused_nerf,
    )
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )
    from fourier_feature_nets_tpu.utils.camera_paths import orbit

    bounds = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)

    if len(sys.argv) > 1:
        from fourier_feature_nets_tpu.models import load_model
        model, params = load_model(sys.argv[1])
        res = int(sys.argv[2]) if len(sys.argv) > 2 else 800
        num_samples = int(sys.argv[3]) if len(sys.argv) > 3 else 48
        cameras = orbit(np.array([0.0, 1.0, 0.0]),
                        np.array([0.0, 0.0, -1.0]), 4, 40.0,
                        Resolution(res, res), 4.0)
        sampler = OccupancyGridSampler.from_model(
            model, params, cameras, num_samples, bounds=bounds,
            grid_resolution=64, num_probes=32)
    else:
        from fourier_feature_nets_tpu.models import flagship_nerf
        from fourier_feature_nets_tpu.octree import OcTree
        model = flagship_nerf()
        params = model.init(jax.random.PRNGKey(0))
        res, num_samples = 800, 32
        rng = np.random.default_rng(1)
        cloud = np.concatenate([
            rng.normal([0.2, 0.0, 0.0], 0.2, (20000, 3)),
            [[-1, -1, -1], [1, 1, 1]],
        ]).astype(np.float32)
        tree = OcTree.build_from_samples(cloud, depth=6,
                                         min_leaf_size=2)
        cameras = orbit(np.array([0.0, 1.0, 0.0]),
                        np.array([0.0, 0.0, 1.0]), 12, 40.0,
                        Resolution(res, res), 4.0)
        sampler = OccupancyGridSampler(tree, cameras, num_samples,
                                       grid_resolution=64,
                                       num_probes=32, bounds=bounds)

    weights = prepare_fused_nerf(model, params)
    chunk = 16384
    total = res * res
    eps_list = (1e-2, 1e-3, 1e-4)
    k1_list = sorted({num_samples // 3, num_samples // 2,
                      2 * num_samples // 3})

    @jax.jit
    def chunk_stats(weights, offsets, real):
        starts, dirs, near, far, valid = sampler.camera_ray_geometry(
            0, offsets)
        _, _, hit = sampler._probe_cdf_geometry(starts, dirs, near, far)
        # mask padded rows of the final partial chunk (they duplicate
        # ray 0 and would inflate every fraction by up to pad/chunk)
        hit = hit & valid & (jnp.arange(offsets.shape[0]) < real)
        rays, _ = sampler.sample_camera_rays(0, offsets)
        flat_pos = rays.positions.reshape(-1, 3)
        flat_views = rays.view_directions.reshape(-1, 3)
        logits = fused_nerf_apply(model, weights, flat_pos, flat_views)
        opacity = jax.nn.softplus(logits[:, 3]).reshape(
            offsets.shape[0], -1)
        t = rays.t_values
        # reference blend-weight semantics (ops/blend.py): last delta
        # 1e10, T = shifted cumprod(min(1, 1 - alpha + 1e-10))
        deltas = jnp.concatenate(
            [t[:, 1:] - t[:, :-1],
             jnp.full_like(t[:, :1], 1e10)], axis=-1)
        alpha = 1.0 - jnp.exp(-opacity * deltas)
        trans = jnp.cumprod(
            jnp.minimum(1.0, 1.0 - alpha + 1e-10), axis=-1)
        # incoming transmittance of sample i = trans[i-1] (trans
        # shifted right, first = 1)
        t_in = jnp.concatenate(
            [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
        hit_f = hit.astype(jnp.float32)
        out = [jnp.sum(hit_f)]
        for eps in eps_list:
            sat = (t_in < eps) & hit[:, None]
            out.append(jnp.sum(sat.astype(jnp.float32)))
        for k1 in k1_list:
            for eps in eps_list:
                sat_ray = (t_in[:, k1] < eps) & hit
                out.append(jnp.sum(sat_ray.astype(jnp.float32)))
        return jnp.stack(out)

    acc = np.zeros(1 + len(eps_list) + len(k1_list) * len(eps_list))
    for start in range(0, total, chunk):
        real = min(start + chunk, total) - start
        offsets = jnp.arange(start, start + real, dtype=jnp.int32)
        if real < chunk:
            offsets = jnp.pad(offsets, (0, chunk - real))
        acc += np.asarray(chunk_stats(weights, offsets,
                                      jnp.int32(real)))

    num_hit = acc[0]
    print(f"scene: {res}x{res}, {num_samples} samples, "
          f"{int(num_hit)} hit rays "
          f"({num_hit / total:.1%} of {total})")
    evals = num_hit * num_samples
    for j, eps in enumerate(eps_list):
        print(f"eps={eps:g}: wasted evals (T_in < eps): "
              f"{acc[1 + j] / max(evals, 1):.1%}")
    base = 1 + len(eps_list)
    for i, k1 in enumerate(k1_list):
        for j, eps in enumerate(eps_list):
            frac = acc[base + i * len(eps_list) + j] / max(num_hit, 1)
            save = frac * (num_samples - k1) / num_samples
            print(f"  split K1={k1}: rays saturated (eps={eps:g}): "
                  f"{frac:.1%} -> exploitable MLP saving "
                  f"{save:.1%}")


if __name__ == "__main__":
    main()
