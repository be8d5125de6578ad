"""Feature-major fused NeRF forward kernel (serving fast path).

Same math as :mod:`.fused_nerf` with every tensor TRANSPOSED: inputs
``(3, N)``, activations ``(C, tile)``, output ``(4, N)``.

Why: the row-major kernel's measured floor is the narrow-row strided
DMA — a ``(tile, 3)`` f32 block lands as ``tile`` separate 12-16 B
logical rows inside 512 B lane-padded VMEM rows, at a per-row
descriptor cost of ~6 ns (82% of the 4x128 student kernel's time;
tools/kernel_io_floor_bench.py, docs/RESULTS.md § Distillation).
Feature-major blocks put the SAMPLE axis in lanes, so a ``(3, tile)``
block is three contiguous 8 KB rows — 3 DMA descriptors instead of
2048. The matmuls become ``W^T (C_out, C_in) @ h (C_in, tile)`` — the
classic weight-stationary orientation; the MXU sees the same shapes
as the row-major kernel, only transposed, and the boundary transposes
((N, 3) -> (3, N) in, (4, N) -> (N, 4) out) are plain XLA copies that
fuse with the surrounding sampler/composite code.

Weight layout is the exact pytree TRANSPOSE of
:func:`.fused_nerf.prepare_fused_nerf`'s output (weights ``(in, out)``
-> ``(out, in)``, biases ``(1, C)`` -> ``(C, 1)``, encodings
``(3, E)`` -> ``(E, 3)``), so the packing order and the flatten /
unflatten helpers are shared with the row-major kernels.

Parity: the fused pipeline implements nerf_model.py:61-92 (encode,
skip-MLP, opacity head, bottleneck + view color path) exactly like
:mod:`.fused_nerf`; see that module for the reference citations.

Inference-only (no VJP) — training uses ops/fused_nerf_train.py.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_nerf import (
    _fast_sincos,
    _round_up,
    flatten_fused_weights,
    on_tpu_default,
    prepare_fused_nerf,
)

__all__ = ["FusedNeRFWeightsFM", "prepare_fused_nerf_fm",
           "fused_nerf_apply_fm"]


class FusedNeRFWeightsFM(NamedTuple):
    """Transposed (feature-major) fused weights.

    Field-for-field the transpose of :class:`.fused_nerf
    .FusedNeRFWeights`; kept as a distinct type so
    ``fused_nerf_apply`` can dispatch on the layout.
    """

    pos_enc: jnp.ndarray       # (E_pos, 3) f32
    view_enc: jnp.ndarray      # (E_view, 3) f32
    first_parts: tuple         # (C, E) blocks: cos, sin[, raw]
    first_b: jnp.ndarray       # (C, 1) f32
    mid_w: tuple               # (C, C) transposed body layers
    mid_b: tuple
    skip_parts: tuple          # per skip layer: (h, cos, sin[, raw])
    skip_b: tuple
    opacity_w: jnp.ndarray     # (8, C), row 0 live
    opacity_b: jnp.ndarray     # (8, 1)
    bottleneck_w: jnp.ndarray
    bottleneck_b: jnp.ndarray
    hidden_parts: tuple        # (H, *) blocks: bottleneck, cos, sin[, raw]
    hidden_b: jnp.ndarray
    color_w: jnp.ndarray       # (8, H), rows 0..2 live
    color_b: jnp.ndarray       # (8, 1)


def prepare_fused_nerf_fm(model, params,
                          dtype=jnp.bfloat16) -> FusedNeRFWeightsFM:
    """Splits/casts a NeRF param pytree for the feature-major kernel.

    The double-angle encode is row-major-only (its win case never
    materialized — docs in fused_nerf.py); this layout always uses the
    split cos/sin encode parts.
    """
    row_major = prepare_fused_nerf(model, params, dtype=dtype,
                                   use_doubling=False)
    return FusedNeRFWeightsFM(
        *jax.tree_util.tree_map(lambda a: a.T, row_major))


def _phases_fm(x, enc_t):
    """(E, 3) x (3, tile) phases on the VPU in f32 (three broadcast
    FMAs) — NOT an MXU dot: f32 MXU matmuls downcast on this runtime
    and the phases reach 2**max_log_scale (ops/encoding.py)."""
    return (enc_t[:, 0:1] * x[0:1, :]
            + enc_t[:, 1:2] * x[1:2, :]
            + enc_t[:, 2:3] * x[2:3, :])


def _dot_fm(w_ref, h):
    """(C_out, C_in) @ (C_in, tile) -> (C_out, tile) f32 accumulate."""
    return jax.lax.dot_general(w_ref[:], h, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel_fm(config, positions_ref, views_ref, pos_enc_ref,
               view_enc_ref, *refs):
    (num_layers, skip_positions, include_inputs, num_mid,
     pos_enc_parts, view_enc_parts, compute_dtype) = config

    # flat refs arrive in flatten_fused_weights order
    it = iter(refs)

    def take(n):
        return [next(it) for _ in range(n)]

    first_parts = take(pos_enc_parts)
    (first_b,) = take(1)
    mid_w = take(num_mid)
    mid_b = take(num_mid)
    num_skips = len(skip_positions)
    skip_parts = [take(1 + pos_enc_parts) for _ in range(num_skips)]
    skip_b = take(num_skips)
    (opacity_w, opacity_b, bottleneck_w, bottleneck_b) = take(4)
    hidden_parts = take(1 + view_enc_parts)
    (hidden_b, color_w, color_b, out_ref) = take(4)

    def encode(x, enc_ref):
        sin, cos = _fast_sincos(_phases_fm(x, enc_ref[:]))
        out = [cos.astype(compute_dtype), sin.astype(compute_dtype)]
        if include_inputs:
            out.append(x.astype(compute_dtype))
        return out

    pos = positions_ref[:]
    enc = encode(pos, pos_enc_ref)

    def enc_dot(enc, parts):
        acc = _dot_fm(parts[0], enc[0])
        for w_ref, feat in zip(parts[1:], enc[1:]):
            acc += _dot_fm(w_ref, feat)
        return acc

    # relu AFTER the (monotone) bf16 downcast — saves one full-width
    # f32 VPU pass per layer (same trick as the row-major kernel)
    h = jnp.maximum((enc_dot(enc, first_parts)
                     + first_b[:]).astype(compute_dtype), 0.0)

    mid_iter = 0
    skip_iter = 0
    for i in range(1, num_layers):
        if i in skip_positions:
            parts = skip_parts[skip_iter]
            acc = (_dot_fm(parts[0], h) + enc_dot(enc, parts[1:])
                   + skip_b[skip_iter][:])
            skip_iter += 1
        else:
            acc = _dot_fm(mid_w[mid_iter], h) + mid_b[mid_iter][:]
            mid_iter += 1
        h = jnp.maximum(acc.astype(compute_dtype), 0.0)

    opacity = _dot_fm(opacity_w, h) + opacity_b[:]        # (8, tile)
    bottleneck = (_dot_fm(bottleneck_w, h)
                  + bottleneck_b[:]).astype(compute_dtype)

    venc = encode(views_ref[:], view_enc_ref)
    acc = _dot_fm(hidden_parts[0], bottleneck)
    for w_ref, feat in zip(hidden_parts[1:], venc):
        acc += _dot_fm(w_ref, feat)
    hidden = jnp.maximum(acc + hidden_b[:], 0.0).astype(compute_dtype)
    color = _dot_fm(color_w, hidden) + color_b[:]         # (8, tile)

    out_ref[:] = jnp.concatenate([color[:3, :], opacity[:1, :]], 0)


@functools.partial(jax.jit,
                   static_argnames=("model_static", "tile", "interpret"))
def _fused_call_fm(model_static, weights: FusedNeRFWeightsFM,
                   positions_t: jnp.ndarray, views_t: jnp.ndarray,
                   tile: int = 2048, interpret: bool = False):
    (num_layers, skip_positions, include_inputs, dtype_name) = model_static
    compute_dtype = jnp.dtype(dtype_name)
    num = positions_t.shape[1]
    assert num % tile == 0

    config = (num_layers, skip_positions, include_inputs,
              len(weights.mid_w), len(weights.first_parts),
              len(weights.hidden_parts) - 1, compute_dtype)

    weight_inputs = flatten_fused_weights(weights)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((3, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        const_spec(weights.pos_enc.shape),
        const_spec(weights.view_enc.shape),
    ] + [const_spec(w.shape) for w in weight_inputs]

    return pl.pallas_call(
        functools.partial(_kernel_fm, config),
        grid=(num // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((4, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, num), jnp.float32),
        interpret=interpret,
    )(positions_t, views_t, weights.pos_enc, weights.view_enc,
      *weight_inputs)


def fused_nerf_apply_fm(model, weights: FusedNeRFWeightsFM,
                        positions: jnp.ndarray, views: jnp.ndarray,
                        tile: int = 2048,
                        interpret: bool = False) -> jnp.ndarray:
    """Feature-major fused NeRF forward: (N, 3) -> (N, 4) logits.

    Drop-in for :func:`.fused_nerf.fused_nerf_apply` (which dispatches
    here when handed :class:`FusedNeRFWeightsFM`). The transposes at
    both boundaries are XLA copies at full HBM bandwidth — they cost
    ~2% of what the per-row descriptor floor they remove did
    (tools/kernel_io_floor_bench.py)."""
    expected = 3 if model.include_inputs else 2
    if (len(weights.first_parts) != expected
            or len(weights.hidden_parts) != 1 + expected):
        # doubled (1-part) packs exist only row-major; a hand-built FM
        # pack with the wrong split would silently drop encode terms
        raise ValueError(
            "fused_nerf_apply_fm requires non-doubled packed weights "
            f"(prepare_fused_nerf_fm); got {len(weights.first_parts)} "
            f"positional / {len(weights.hidden_parts) - 1} view encode "
            f"parts, expected {expected}.")
    skips = tuple(s for s in sorted(model.skips)
                  if 0 < s < model.num_layers)
    dtype = weights.mid_w[0].dtype if weights.mid_w else (
        weights.bottleneck_w.dtype)
    model_static = (model.num_layers, skips, model.include_inputs,
                    str(dtype))

    num = positions.shape[0]
    padded = _round_up(num, tile)
    positions_t = positions.astype(jnp.float32).T
    views_t = views.astype(jnp.float32).T
    if padded != num:
        positions_t = jnp.pad(positions_t, ((0, 0), (0, padded - num)))
        views_t = jnp.pad(views_t, ((0, 0), (0, padded - num)))
    interpret = interpret or not on_tpu_default()
    out = _fused_call_fm(model_static, weights, positions_t, views_t,
                         tile=tile, interpret=interpret)
    return out[:, :num].T
