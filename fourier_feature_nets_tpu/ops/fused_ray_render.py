"""Fully-fused NeRF ray rendering: ONE Pallas kernel from ray
geometry to composited color.

STATUS: measured SLOWER than the per-point kernel + XLA compositing
on v5e (37.3 ms vs 27.3 ms per 16k rays x 128 samples) — the
(points, 1) <-> (rays, S) relayouts inside the kernel cost more than
the logits HBM round-trip they save at these sizes. Kept as a correct,
tested alternative (exact vs Raycaster.render to 3e-7) for shapes or
hardware where the trade flips; the production render path is
ops/fused_nerf.py.

The inference kernel in ops/fused_nerf.py writes per-sample logits
(N, 4) to HBM and composites in a separate XLA kernel. This kernel
goes all the way per ray tile:

  encode -> skip-MLP -> heads -> sigmoid/softplus -> blend weights
  (exclusive cumprod over the sample axis) -> color/alpha

so HBM sees only ray geometry in (6 floats + S depths per ray) and
(R, 4) results out. Extra structural wins over the per-point kernel:

  * view-direction features are computed ONCE PER RAY (the per-point
    kernel recomputes them for each of the S samples);
  * the ray-membership aggregation (sum over samples) and the per-ray
    broadcast both run as tiny constant matmuls — no lane-unaligned
    relayouts;
  * the exclusive cumprod runs as a log-step lane scan built from
    ``pltpu.roll`` (Mosaic on this toolchain rejects vector compares,
    so all masks are arithmetic).

Semantics match Raycaster.render / ops.calculate_blend_weights
(reference ray_caster.py:48-93, utils.py:72-97).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_nerf import (
    FusedNeRFWeights,
    _fast_sincos,
    _phases,
    flatten_fused_weights,
    on_tpu_default,
)

__all__ = ["fused_ray_render"]


def _lane_iota(shape):
    # TPU iota must be integer-typed; cast for arithmetic gating
    return jax.lax.broadcasted_iota(jnp.int32, shape,
                                    len(shape) - 1).astype(jnp.float32)


def _exclusive_cumprod_lanes(x):
    """Exclusive cumulative product along the lane (last) axis via a
    log-step shift-multiply scan. No vector compares: masks are
    min/abs arithmetic."""
    lanes = x.shape[-1]
    lane = _lane_iota(x.shape)
    prod = x
    shift = 1
    while shift < lanes:
        rolled = pltpu.roll(prod, shift, axis=len(x.shape) - 1)
        # lanes < shift multiply by 1 (identity), not the wrap-around;
        # exact 0/1 gate without a vector compare:
        # floor(min(lane, shift) / shift) = 1 iff lane >= shift
        gate = jnp.floor(jnp.minimum(lane, float(shift)) / float(shift))
        prod = prod * (rolled * gate + (1.0 - gate))
        shift *= 2
    # exclusive: shift the inclusive product right by one lane
    rolled = pltpu.roll(prod, 1, axis=len(x.shape) - 1)
    gate = jnp.floor(jnp.minimum(lane, 1.0))
    return rolled * gate + (1.0 - gate)


def _kernel(config, t_ref, positions_ref, views_ref, pos_enc_ref,
            view_enc_ref, agg_ref, expand_ref, *refs):
    (num_layers, skip_positions, include_inputs, num_mid, num_enc_parts,
     num_view_parts, compute_dtype, num_samples) = config

    it = iter(refs)

    def take(n):
        return [next(it) for _ in range(n)]

    first_parts = take(num_enc_parts)
    (first_b,) = take(1)
    mid_w = take(num_mid)
    mid_b = take(num_mid)
    num_skips = len(skip_positions)
    skip_parts = [take(1 + num_enc_parts) for _ in range(num_skips)]
    skip_b = take(num_skips)
    (opacity_w, opacity_b, bottleneck_w, bottleneck_b) = take(4)
    # the view head's part count is independent of the positional one
    # (they only coincide for non-doubled encodes)
    hidden_parts = take(1 + num_view_parts)
    (hidden_b, color_w, color_b, out_ref) = take(4)

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    pos = positions_ref[:]          # (TILE_R * S, 3)
    views = views_ref[:]            # (TILE_R, 3) — one per ray

    # ---- positional encode + body (per point) ----
    sin, cos = _fast_sincos(_phases(pos, pos_enc_ref))
    enc = [cos.astype(compute_dtype), sin.astype(compute_dtype)]
    if include_inputs:
        enc.append(pos.astype(compute_dtype))

    def enc_dot(parts):
        acc = dot(enc[0], parts[0][:])
        for feat, w_ref in zip(enc[1:], parts[1:]):
            acc += dot(feat, w_ref[:])
        return acc

    h = jnp.maximum(enc_dot(first_parts) + first_b[:], 0.0)
    h = h.astype(compute_dtype)
    skip_iter = 0
    mid_iter = 0
    for i in range(1, num_layers):
        if i in skip_positions:
            parts = skip_parts[skip_iter]
            acc = dot(h, parts[0][:]) + enc_dot(parts[1:])
            acc += skip_b[skip_iter][:]
            skip_iter += 1
        else:
            acc = dot(h, mid_w[mid_iter][:]) + mid_b[mid_iter][:]
            mid_iter += 1
        h = jnp.maximum(acc, 0.0).astype(compute_dtype)

    opacity8 = dot(h, opacity_w[:]) + opacity_b[:]     # col 0 live
    bottleneck = (dot(h, bottleneck_w[:])
                  + bottleneck_b[:]).astype(compute_dtype)

    # ---- view features: PER RAY, expanded by constant matmul ----
    v_sin, v_cos = _fast_sincos(_phases(views, view_enc_ref))
    venc = [v_cos.astype(compute_dtype), v_sin.astype(compute_dtype)]
    if include_inputs:
        venc.append(views.astype(compute_dtype))
    vdot = dot(venc[0], hidden_parts[1][:])            # (TILE_R, H)
    for feat, w_ref in zip(venc[1:], hidden_parts[2:]):
        vdot += dot(feat, w_ref[:])
    # expand (TILE_R, H) -> (TILE_R*S, H): ray-membership matmul
    vdot_expanded = dot(expand_ref[:], vdot.astype(compute_dtype))

    hidden = jnp.maximum(
        dot(bottleneck, hidden_parts[0][:]) + vdot_expanded
        + hidden_b[:], 0.0).astype(compute_dtype)
    color8 = dot(hidden, color_w[:]) + color_b[:]      # cols 0..2 live

    # ---- compositing (per ray) ----
    t = t_ref[:]                                       # (TILE_R, S)
    lane = _lane_iota(t.shape)
    # shift -1 == circular shift by S-1 (pltpu.roll wants shift >= 0)
    rolled_t = pltpu.roll(t, num_samples - 1, axis=1)
    # delta: t[s+1] - t[s]; final lane = 1e10 (arithmetic gate).
    # XLA lowers division by a compile-time constant to multiplication
    # by its reciprocal, which is EXACT only for power-of-2 divisors —
    # the earlier floor(lane / (S-1)) form made the gate 0 at the last
    # lane for ~13% of sample counts (e.g. S=42, 48: (S-1)*fl(1/(S-1))
    # rounds below 1.0 -> negative deltas corrupt every composite).
    # Bias the lane so the divisor is a power of two: with p =
    # next_pow2(S-1), floor((lane + p - (S-1)) / p) = 1 iff lane==S-1.
    last_lane = num_samples - 1
    pow2 = 1 << max(0, (last_lane - 1).bit_length())
    last_gate = jnp.floor((lane + float(pow2 - last_lane)) / float(pow2))
    deltas = (rolled_t - t) * (1.0 - last_gate) + 1e10 * last_gate

    # sigma (TILE_R*S, 1) -> (TILE_R, S): small relayout, then alpha
    sigma_flat = jax.nn.softplus(opacity8[:, 0:1])
    sigma = sigma_flat.reshape(t.shape)
    alpha = 1.0 - jnp.exp(-sigma * deltas)
    trans = _exclusive_cumprod_lanes(
        jnp.minimum(1.0, 1.0 - alpha + 1e-10))
    weights = alpha * trans                            # (TILE_R, S)

    # color per ray: aggregate sigmoid(color) * w over samples with
    # the constant ray-membership matrix agg (TILE_R, TILE_R*S)
    w_flat = weights.reshape(-1, 1)                    # (TILE_R*S, 1)
    weighted = (jax.nn.sigmoid(color8[:, :4]) * w_flat).astype(
        jnp.float32)
    ray_color = dot(agg_ref[:], weighted)              # (TILE_R, 4)

    # alpha excludes the absorbing tail sample (ray_caster.py:82-83)
    ray_alpha = jnp.sum(weights * (1.0 - last_gate), axis=-1,
                        keepdims=True)

    out_ref[:, :3] = ray_color[:, :3]
    out_ref[:, 3:4] = ray_alpha


@functools.partial(jax.jit,
                   static_argnames=("model_static", "interpret",
                                    "tile_r"))
def _fused_ray_call(model_static, weights: FusedNeRFWeights,
                    positions, views, t_values,
                    interpret: bool = False, tile_r: int = 16):
    TILE_R = tile_r
    (num_layers, skip_positions, include_inputs, dtype_name,
     num_samples) = model_static
    compute_dtype = jnp.dtype(dtype_name)
    num_rays = t_values.shape[0]
    assert num_rays % TILE_R == 0
    points_per_tile = TILE_R * num_samples

    config = (num_layers, skip_positions, include_inputs,
              len(weights.mid_w), len(weights.first_parts),
              len(weights.hidden_parts) - 1,
              compute_dtype, num_samples)

    # constant aggregation/expansion matrices (ray-membership)
    rows = np.repeat(np.arange(TILE_R), num_samples)
    agg = np.zeros((TILE_R, points_per_tile), np.float32)
    agg[rows, np.arange(points_per_tile)] = 1.0
    expand = jnp.asarray(agg.T, compute_dtype)
    agg = jnp.asarray(agg, jnp.float32)

    weight_inputs = flatten_fused_weights(weights)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((TILE_R, num_samples), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((points_per_tile, 3), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_R, 3), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        const_spec(weights.pos_enc.shape),
        const_spec(weights.view_enc.shape),
        const_spec(agg.shape),
        const_spec(expand.shape),
    ] + [const_spec(w.shape) for w in weight_inputs]

    return pl.pallas_call(
        functools.partial(_kernel, config),
        grid=(num_rays // TILE_R,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE_R, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_rays, 4), jnp.float32),
        interpret=interpret,
    )(t_values, positions, views, weights.pos_enc, weights.view_enc,
      agg, expand, *weight_inputs)


def fused_ray_render(model, weights: FusedNeRFWeights,
                     positions, view_directions, t_values,
                     interpret: bool = None, tile_r: int = 16):
    """Renders rays in one fused kernel.

    Args:
        model: a NeRF model (for static structure).
        weights: packed weights (prepare_fused_nerf / pack variants;
            the double-angle layout is rejected — see ValueError).
        positions: (R, S, 3) sample positions (ray-major).
        view_directions: (R, 3) or (R, S, 3) ray directions (the
            per-ray value is taken).
        t_values: (R, S) sample depths.
        interpret: force the Pallas interpreter (auto off-TPU).

    Returns:
        (R, 4): composited color (3) + alpha (1). Inference only.
    """
    num_rays, num_samples = t_values.shape
    if view_directions.ndim == 3:
        view_directions = view_directions[:, 0, :]

    # this kernel's encode emits (cos, sin[, raw]) parts only — the
    # double-angle packed layout (single permuted part) would silently
    # zip-truncate against it, so reject it up front
    expected = 3 if model.include_inputs else 2
    if (len(weights.first_parts) != expected
            or len(weights.hidden_parts) != 1 + expected):
        raise ValueError(
            "fused_ray_render requires non-doubled packed weights "
            "(prepare_fused_nerf(use_doubling=False)); got "
            f"{len(weights.first_parts)} positional / "
            f"{len(weights.hidden_parts) - 1} view encode parts, "
            f"expected {expected}.")

    dtype = weights.mid_w[0].dtype if weights.mid_w else (
        weights.bottleneck_w.dtype)
    skips = tuple(s for s in sorted(model.skips)
                  if 0 < s < model.num_layers)
    model_static = (model.num_layers, skips, model.include_inputs,
                    str(dtype), num_samples)

    if interpret is None:
        interpret = not on_tpu_default()

    pad = (-num_rays) % tile_r
    if pad:
        positions = jnp.pad(positions, ((0, pad), (0, 0), (0, 0)))
        view_directions = jnp.pad(view_directions, ((0, pad), (0, 0)))
        t_values = jnp.pad(t_values, ((0, pad), (0, 0)),
                           constant_values=1.0)

    out = _fused_ray_call(model_static, weights,
                          positions.reshape(-1, 3).astype(jnp.float32),
                          view_directions.astype(jnp.float32),
                          t_values.astype(jnp.float32),
                          interpret=interpret, tile_r=tile_r)
    return out[:num_rays]
