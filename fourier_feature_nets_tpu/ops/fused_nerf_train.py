"""Pallas fused NeRF TRAINING kernels (custom VJP).

The XLA autodiff train step stores every layer's activations to HBM in
the forward pass and streams them back in the backward pass. These
kernels instead:

  forward:  the inference kernel from ops/fused_nerf.py (VMEM-resident
            weights, no activation spill), emitting only (N, 4) logits;
  backward: ONE kernel per tile that *recomputes* the forward in VMEM
            and backpropagates immediately — weight-gradient
            accumulators live in VMEM across the whole grid and are
            written to HBM exactly once.

Net arithmetic is 4/3 of the store-activations scheme but HBM
activation traffic drops to zero — the winning trade on TPU where the
train step is bandwidth-bound.

The packing function is traceable (pure jnp slicing/casting), so
parameter gradients flow back through the packing transpose
automatically and the kernel slots into any jitted train step:

    packed = pack_fused_nerf(model, params)           # inside jit
    logits = fused_nerf_train_apply(model_static, packed, pos, views)

Gradients are returned for the packed weights only (positions/views
are sampler outputs and carry no gradient in this workload).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_nerf import (
    FusedNeRFWeights,
    _fast_sincos,
    _fused_call,
    _phases,
    flatten_fused_weights,
    unflatten_fused_weights,
)

__all__ = ["pack_fused_nerf", "fused_nerf_train_apply", "model_statics"]


def pack_fused_nerf(model, params,
                    dtype=jnp.bfloat16) -> FusedNeRFWeights:
    """Traceable (jnp-only) version of prepare_fused_nerf: packs a
    NeRF param pytree into the fused kernels' split layout. Runs
    inside jit; gradients flow back through the slices/casts."""
    e_pos = model.pos_encoding.shape[1]
    e_view = model.view_encoding.shape[1]
    nc = model.num_channels
    enc_sizes = [e_pos, e_pos] + ([3] if model.include_inputs else [])

    def split_rows(w, sizes):
        out, start = [], 0
        for size in sizes:
            out.append(w[start:start + size].astype(dtype))
            start += size
        return tuple(out)

    def bias(b):
        return b[None].astype(jnp.float32)

    def pad_cols(w, cols):
        return jnp.pad(w, ((0, 0), (0, cols - w.shape[1]))).astype(dtype)

    def pad_bias(b, cols):
        return jnp.pad(b, (0, cols - b.shape[0]))[None].astype(
            jnp.float32)

    first_parts = None
    first_b = None
    mid_w, mid_b = [], []
    skip_parts, skip_b, skip_positions = [], [], []
    for i, layer in enumerate(params["layers"]):
        w = layer["weight"]
        if i == 0:
            first_parts = split_rows(w, enc_sizes)
            first_b = bias(layer["bias"])
        elif i in model.skips:
            skip_parts.append((w[:nc].astype(dtype),)
                              + split_rows(w[nc:], enc_sizes))
            skip_b.append(bias(layer["bias"]))
            skip_positions.append(i)
        else:
            mid_w.append(w.astype(dtype))
            mid_b.append(bias(layer["bias"]))

    view_sizes = [nc, e_view, e_view] + (
        [3] if model.include_inputs else [])
    hidden_parts = split_rows(params["hidden_view"]["weight"],
                              view_sizes)

    return FusedNeRFWeights(
        pos_enc=model.pos_encoding.astype(jnp.float32),
        view_enc=model.view_encoding.astype(jnp.float32),
        first_parts=first_parts, first_b=first_b,
        mid_w=tuple(mid_w), mid_b=tuple(mid_b),
        skip_parts=tuple(skip_parts), skip_b=tuple(skip_b),
        opacity_w=pad_cols(params["opacity_out"]["weight"], 8),
        opacity_b=pad_bias(params["opacity_out"]["bias"], 8),
        bottleneck_w=params["bottleneck"]["weight"].astype(dtype),
        bottleneck_b=bias(params["bottleneck"]["bias"]),
        hidden_parts=hidden_parts,
        hidden_b=bias(params["hidden_view"]["bias"]),
        color_w=pad_cols(params["color_out"]["weight"], 8),
        color_b=pad_bias(params["color_out"]["bias"], 8))


def model_statics(model, dtype=jnp.bfloat16):
    """Hashable model description for the train kernels."""
    skips = tuple(s for s in sorted(model.skips)
                  if 0 < s < model.num_layers)
    return (model.num_layers, skips,
            model.include_inputs, model.num_freq_pos,
            model.num_freq_view, False, False, str(jnp.dtype(dtype)))


def _dot(a, b, transpose_b=False):
    dims = ((1,), (1,)) if transpose_b else ((1,), (0,))
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _relu_mask(h):
    """1.0 where h > 0 else 0.0, WITHOUT a vector compare.

    This Mosaic/TPU toolchain crashes on vector comparison ops inside
    kernels; since h = relu(z) >= 0 exactly, ``ceil(min(h, 1))`` is an
    exact 0/1 mask for every NORMAL non-negative float (the previous
    ``h / (h + 1e-30)`` formulation returned fractional masks for h
    below ~3.4e-23). Subnormal h flushes to zero under XLA/TPU
    arithmetic anyway, so mask 0 there is consistent with the forward
    value actually used.
    """
    hf = h.astype(jnp.float32)
    return jnp.ceil(jnp.minimum(hf, 1.0))


def _dot_tn(a, b):
    """a^T @ b: contract the tile (row) axis of both."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _bwd_kernel(config, positions_ref, views_ref, pos_enc_ref,
                view_enc_ref, *refs):
    (num_layers, skip_positions, include_inputs, num_mid, num_enc_parts,
     num_view_parts, compute_dtype) = config

    it = iter(refs)

    def take(n):
        return [next(it) for _ in range(n)]

    # inputs (same packing order as the forward kernel) + g refs;
    # weight refs are read once into values up front
    def read(n):
        return [ref[:] for ref in take(n)]

    first_parts = read(num_enc_parts)
    (first_b,) = read(1)
    mid_w = read(num_mid)
    mid_b = read(num_mid)
    num_skips = len(skip_positions)
    skip_parts = [read(1 + num_enc_parts) for _ in range(num_skips)]
    skip_b = read(num_skips)
    (opacity_w, opacity_b, bottleneck_w, bottleneck_b) = read(4)
    # the view head's part count is independent of the positional one
    # (they only coincide for non-doubled encodes)
    hidden_parts = read(1 + num_view_parts)
    (hidden_b, color_w, color_b) = read(3)
    (g_color_ref, g_opacity_ref) = take(2)

    # outputs: gradient accumulators, same order as the weight inputs
    d_first = take(num_enc_parts)
    (d_first_b,) = take(1)
    d_mid = take(num_mid)
    d_mid_b = take(num_mid)
    d_skip = [take(1 + num_enc_parts) for _ in range(num_skips)]
    d_skip_b = take(num_skips)
    (d_opacity, d_opacity_b, d_bottleneck, d_bottleneck_b) = take(4)
    d_hidden = take(1 + num_view_parts)
    (d_hidden_b, d_color, d_color_b) = take(3)

    all_outs = (d_first + [d_first_b] + d_mid + d_mid_b
                + [r for parts in d_skip for r in parts] + d_skip_b
                + [d_opacity, d_opacity_b, d_bottleneck, d_bottleneck_b]
                + d_hidden + [d_hidden_b, d_color, d_color_b])

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in all_outs:
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    def acc_tn(ref, feat, dz):
        # accumulate feat^T @ dz; grad rows may be padded to the
        # 8-sublane minimum for output tiling
        g = _dot_tn(feat, dz)
        if g.shape[0] < ref.shape[0]:
            g = jnp.pad(g, ((0, ref.shape[0] - g.shape[0]), (0, 0)))
        ref[:] += g

    def acc_bias(ref, dz):
        # (1, C) broadcast into the (8, C) padded block: row 0 is the
        # bias gradient, the copies are sliced away by the caller
        ref[:] += jnp.sum(dz.astype(jnp.float32), axis=0,
                          keepdims=True)

    pos = positions_ref[:]
    views = views_ref[:]

    # ---- forward recompute (values stay in VMEM) ----
    sin, cos = _fast_sincos(_phases(pos, pos_enc_ref))
    enc = [cos.astype(compute_dtype), sin.astype(compute_dtype)]
    if include_inputs:
        enc.append(pos.astype(compute_dtype))

    def enc_dot(parts):
        acc = _dot(enc[0], parts[0])
        for feat, w_ref in zip(enc[1:], parts[1:]):
            acc += _dot(feat, w_ref)
        return acc

    h_list = []
    h = jnp.maximum(enc_dot(first_parts) + first_b[:], 0.0)
    h = h.astype(compute_dtype)
    h_list.append(h)

    mid_iter = 0
    skip_iter = 0
    layer_kinds = []  # ("mid", idx) | ("skip", idx)
    for i in range(1, num_layers):
        if i in skip_positions:
            parts = skip_parts[skip_iter]
            acc = _dot(h, parts[0]) + enc_dot(parts[1:])
            acc += skip_b[skip_iter][:]
            layer_kinds.append(("skip", skip_iter))
            skip_iter += 1
        else:
            acc = _dot(h, mid_w[mid_iter]) + mid_b[mid_iter][:]
            layer_kinds.append(("mid", mid_iter))
            mid_iter += 1
        h = jnp.maximum(acc, 0.0).astype(compute_dtype)
        h_list.append(h)

    bottleneck = (_dot(h, bottleneck_w)
                  + bottleneck_b[:]).astype(compute_dtype)

    v_sin, v_cos = _fast_sincos(_phases(views, view_enc_ref))
    venc = [v_cos.astype(compute_dtype), v_sin.astype(compute_dtype)]
    if include_inputs:
        venc.append(views.astype(compute_dtype))

    acc = _dot(bottleneck, hidden_parts[0])
    for feat, w_ref in zip(venc, hidden_parts[1:]):
        acc += _dot(feat, w_ref)
    hidden = jnp.maximum(acc + hidden_b[:], 0.0).astype(compute_dtype)

    # ---- backward ----
    g_color = g_color_ref[:]       # (tile, 8), cols 0..2 live
    g_opacity = g_opacity_ref[:]   # (tile, 8), col 0 live

    # color head
    acc_tn(d_color, hidden, g_color)
    acc_bias(d_color_b, g_color)
    dhidden = _dot(g_color, color_w, transpose_b=True)

    # hidden_view layer
    dz_h = (dhidden * _relu_mask(hidden)).astype(compute_dtype)
    acc_tn(d_hidden[0], bottleneck, dz_h)
    for k, feat in enumerate(venc):
        acc_tn(d_hidden[1 + k], feat, dz_h)
    acc_bias(d_hidden_b, dz_h)
    dbottleneck = _dot(dz_h, hidden_parts[0], transpose_b=True)

    # bottleneck + opacity heads (both consume h_list[-1])
    h_last = h_list[-1]
    dbottleneck = dbottleneck.astype(compute_dtype)
    acc_tn(d_bottleneck, h_last, dbottleneck)
    acc_bias(d_bottleneck_b, dbottleneck)
    acc_tn(d_opacity, h_last, g_opacity)
    acc_bias(d_opacity_b, g_opacity)

    dh = (_dot(dbottleneck, bottleneck_w, transpose_b=True)
          + _dot(g_opacity, opacity_w, transpose_b=True))

    # body, last layer to first
    for i in range(num_layers - 1, 0, -1):
        h_i = h_list[i]
        h_prev = h_list[i - 1]
        dz = (dh * _relu_mask(h_i)).astype(compute_dtype)
        kind, idx = layer_kinds[i - 1]
        if kind == "skip":
            acc_tn(d_skip[idx][0], h_prev, dz)
            for k, feat in enumerate(enc):
                acc_tn(d_skip[idx][1 + k], feat, dz)
            acc_bias(d_skip_b[idx], dz)
            dh = _dot(dz, skip_parts[idx][0], transpose_b=True)
        else:
            acc_tn(d_mid[idx], h_prev, dz)
            acc_bias(d_mid_b[idx], dz)
            dh = _dot(dz, mid_w[idx], transpose_b=True)

    # first layer
    dz0 = (dh * _relu_mask(h_list[0])).astype(compute_dtype)
    for k, feat in enumerate(enc):
        acc_tn(d_first[k], feat, dz0)
    acc_bias(d_first_b, dz0)


@functools.partial(jax.jit,
                   static_argnames=("model_static", "tile", "interpret"))
def _bwd_call(model_static, weights: FusedNeRFWeights, positions,
              views, g_color, g_opacity, tile: int = 512,
              interpret: bool = False):
    (num_layers, skip_positions, include_inputs, _, _, _, _,
     dtype_name) = model_static
    compute_dtype = jnp.dtype(dtype_name)
    num = positions.shape[0]
    assert num % tile == 0

    config = (num_layers, skip_positions, include_inputs,
              len(weights.mid_w), len(weights.first_parts),
              len(weights.hidden_parts) - 1, compute_dtype)

    weight_inputs = flatten_fused_weights(weights)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def tile_spec(cols):
        return pl.BlockSpec((tile, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = ([tile_spec(3), tile_spec(3),
                 const_spec(weights.pos_enc.shape),
                 const_spec(weights.view_enc.shape)]
                + [const_spec(w.shape) for w in weight_inputs]
                + [tile_spec(8), tile_spec(8)])

    def padded_shape(w):
        # outputs must respect the 8-sublane minimum tile
        return (max(w.shape[0], 8), w.shape[1])

    out_shapes = [jax.ShapeDtypeStruct(padded_shape(w), jnp.float32)
                  for w in weight_inputs]
    out_specs = [const_spec(padded_shape(w)) for w in weight_inputs]

    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, config),
        grid=(num // tile,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(positions, views, weights.pos_enc, weights.view_enc,
      *weight_inputs, g_color, g_opacity)

    # rebuild the FusedNeRFWeights structure from the flat f32 grads;
    # cotangents must carry the primal dtypes (bf16 weight grads are
    # upcast again by the packing function's transpose before Adam)
    grads = [g[:p.shape[0]].astype(p.dtype)
             for g, p in zip(grads, weight_inputs)]
    return unflatten_fused_weights(weights, grads)


def _validate_packed(model_static, weights: FusedNeRFWeights):
    """Rejects the double-angle packed layout: both the forward (with
    model_statics' pos_double/view_double=False) and the recompute
    backward emit (cos, sin[, raw]) encode parts and would silently
    zip-truncate against a single permuted part (same guard as
    fused_ray_render)."""
    expected = 3 if model_static[2] else 2
    if (len(weights.first_parts) != expected
            or len(weights.hidden_parts) != 1 + expected):
        raise ValueError(
            "fused_nerf_train_apply requires non-doubled packed "
            "weights (pack_fused_nerf); got "
            f"{len(weights.first_parts)} positional / "
            f"{len(weights.hidden_parts) - 1} view encode parts, "
            f"expected {expected}.")


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5))
def fused_nerf_train_apply(model_static, weights: FusedNeRFWeights,
                           positions, views, tile: int = 512,
                           interpret: bool = False):
    """Differentiable fused NeRF forward: (N, 3)+(N, 3) -> (N, 4).

    ``model_static`` comes from :func:`model_statics`; ``weights``
    from :func:`pack_fused_nerf` (inside the same jit, so parameter
    gradients flow through the packing automatically). N must be a
    multiple of ``tile``.
    """
    _validate_packed(model_static, weights)
    return _fused_call(model_static, weights, positions, views,
                       tile=tile, interpret=interpret)


def _train_fwd(model_static, weights, positions, views, tile,
               interpret):
    _validate_packed(model_static, weights)
    out = _fused_call(model_static, weights, positions, views,
                      tile=tile, interpret=interpret)
    return out, (weights, positions, views)


def _train_bwd(model_static, tile, interpret, residuals, g):
    weights, positions, views = residuals
    g_color = jnp.pad(g[:, :3], ((0, 0), (0, 5)))
    g_opacity = jnp.pad(g[:, 3:4], ((0, 0), (0, 7)))
    d_weights = _bwd_call(model_static, weights, positions, views,
                          g_color, g_opacity, tile=tile,
                          interpret=interpret)
    return (d_weights, jnp.zeros_like(positions),
            jnp.zeros_like(views))


fused_nerf_train_apply.defvjp(_train_fwd, _train_bwd)
