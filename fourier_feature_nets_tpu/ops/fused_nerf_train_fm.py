"""Feature-major fused NeRF TRAINING kernels (custom VJP).

The feature-major layout of ops/fused_nerf_fm.py applied to the
recompute-backward training scheme of ops/fused_nerf_train.py: the
row-major train kernels read the (tile, 3) positions/views twice per
step (forward + recompute) and the (tile, 8) cotangents once, paying
the narrow-row DMA descriptor floor each time (~6 ns/row,
tools/kernel_io_floor_bench.py). Here every sample tensor rides the
lane axis — (3, N) inputs, (8, N) packed cotangents, (C, tile)
activations — so a block transfer is a handful of contiguous rows.

Backward math in this orientation (all shapes FM):

    z   = W (Co, Ci) @ h (Ci, tile)
    dh  = W^T @ dz        — contract dim 0 of both
    dW  = dz @ h^T        — contract the lane (tile) axis of both,
                            landing directly in the (Co, Ci) FM
                            weight-gradient shape
    db  = sum_lanes(dz)   — a (Co, 1) column

Weight-gradient accumulators live in VMEM across the whole grid and
are written to HBM exactly once, same as the row-major version; the
packing function is the traceable row-major packing followed by a
pytree transpose, so parameter gradients flow back through it
automatically.

Parity anchor: same fused pipeline as ops/fused_nerf.py
(nerf_model.py:61-92); gradient correctness is asserted against XLA
autodiff in tests/test_fused_train_fm.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_nerf import flatten_fused_weights, unflatten_fused_weights
from .fused_nerf_fm import (
    FusedNeRFWeightsFM,
    _fast_sincos,
    _fused_call_fm,
    _phases_fm,
)
from .fused_nerf_train import pack_fused_nerf

__all__ = ["pack_fused_nerf_fm", "fused_nerf_train_apply_fm",
           "model_statics_fm"]


def pack_fused_nerf_fm(model, params,
                       dtype=jnp.bfloat16) -> FusedNeRFWeightsFM:
    """Traceable feature-major packing: the row-major ``pack`` plus a
    pytree transpose (gradients flow back through both)."""
    row_major = pack_fused_nerf(model, params, dtype=dtype)
    return FusedNeRFWeightsFM(
        *jax.tree_util.tree_map(lambda a: a.T, row_major))


def model_statics_fm(model, dtype=jnp.bfloat16):
    """Hashable model description for the FM train kernels."""
    skips = tuple(s for s in sorted(model.skips)
                  if 0 < s < model.num_layers)
    return (model.num_layers, skips, model.include_inputs,
            str(jnp.dtype(dtype)))


def _dot_fm(w, h):
    """(Co, Ci) @ (Ci, tile) -> (Co, tile) f32."""
    return jax.lax.dot_general(w, h, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tm(w, dz):
    """W^T @ dz: contract dim 0 of (Co, Ci) and (Co, tile)."""
    return jax.lax.dot_general(w, dz, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_nt(dz, h):
    """dz @ h^T: contract the lane axis -> (Co, Ci) weight grad."""
    return jax.lax.dot_general(dz, h, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _relu_mask(h):
    """Exact 0/1 mask for h = relu(z) without a vector compare (this
    Mosaic crashes on vector compares; see fused_nerf_train.py)."""
    hf = h.astype(jnp.float32)
    return jnp.ceil(jnp.minimum(hf, 1.0))


def _bwd_kernel_fm(config, positions_ref, views_ref, pos_enc_ref,
                   view_enc_ref, *refs):
    (num_layers, skip_positions, include_inputs, num_mid,
     num_enc_parts, num_view_parts, compute_dtype) = config

    it = iter(refs)

    def take(n):
        return [next(it) for _ in range(n)]

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
    hidden_parts = read(1 + num_view_parts)
    (hidden_b, color_w, color_b) = read(3)
    (g_ref,) = take(1)   # (8, tile): rows 0..2 dcolor, row 3 dopacity

    # gradient accumulators, same packing order as the weight inputs
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

    def acc_w(ref, dz, feat):
        # dz (Co, tile) @ feat (Ci, tile)^T; sublane pads (small Co)
        # land in the ref's padded rows and are sliced away after
        g = _dot_nt(dz, feat)
        if g.shape != ref.shape:
            g = jnp.pad(g, ((0, ref.shape[0] - g.shape[0]),
                            (0, ref.shape[1] - g.shape[1])))
        ref[:] += g

    def acc_bias(ref, dz):
        # (Co, 1) column accumulator, lane-padded by the out spec;
        # broadcast fills the pad lanes with copies (col 0 is the
        # gradient, the caller slices it out)
        col = jnp.sum(dz.astype(jnp.float32), axis=1, keepdims=True)
        ref[:] += jnp.broadcast_to(col, ref.shape)

    pos = positions_ref[:]
    views = views_ref[:]

    # ---- forward recompute (values stay in VMEM) ----
    sin, cos = _fast_sincos(_phases_fm(pos, pos_enc_ref[:]))
    enc = [cos.astype(compute_dtype), sin.astype(compute_dtype)]
    if include_inputs:
        enc.append(pos.astype(compute_dtype))

    def enc_dot(parts):
        acc = _dot_fm(parts[0], enc[0])
        for w, feat in zip(parts[1:], enc[1:]):
            acc += _dot_fm(w, feat)
        return acc

    h_list = []
    h = jnp.maximum(enc_dot(first_parts) + first_b, 0.0)
    h = h.astype(compute_dtype)
    h_list.append(h)

    mid_iter = 0
    skip_iter = 0
    layer_kinds = []  # ("mid", idx) | ("skip", idx)
    for i in range(1, num_layers):
        if i in skip_positions:
            parts = skip_parts[skip_iter]
            acc = _dot_fm(parts[0], h) + enc_dot(parts[1:])
            acc += skip_b[skip_iter]
            layer_kinds.append(("skip", skip_iter))
            skip_iter += 1
        else:
            acc = _dot_fm(mid_w[mid_iter], h) + mid_b[mid_iter]
            layer_kinds.append(("mid", mid_iter))
            mid_iter += 1
        h = jnp.maximum(acc, 0.0).astype(compute_dtype)
        h_list.append(h)

    bottleneck = (_dot_fm(bottleneck_w, h)
                  + bottleneck_b).astype(compute_dtype)

    v_sin, v_cos = _fast_sincos(_phases_fm(views, view_enc_ref[:]))
    venc = [v_cos.astype(compute_dtype), v_sin.astype(compute_dtype)]
    if include_inputs:
        venc.append(views.astype(compute_dtype))

    acc = _dot_fm(hidden_parts[0], bottleneck)
    for w, feat in zip(hidden_parts[1:], venc):
        acc += _dot_fm(w, feat)
    hidden = jnp.maximum(acc + hidden_b, 0.0).astype(compute_dtype)

    # ---- backward ----
    g = g_ref[:]                                      # (8, tile)
    zeros5 = jnp.zeros((5, g.shape[1]), g.dtype)
    zeros7 = jnp.zeros((7, g.shape[1]), g.dtype)
    g_color = jnp.concatenate([g[0:3], zeros5], 0)    # rows 0..2 live
    g_opacity = jnp.concatenate([g[3:4], zeros7], 0)  # row 0 live

    # color head
    acc_w(d_color, g_color, hidden)
    acc_bias(d_color_b, g_color)
    dhidden = _dot_tm(color_w, g_color)

    # hidden_view layer
    dz_h = (dhidden * _relu_mask(hidden)).astype(compute_dtype)
    acc_w(d_hidden[0], dz_h, bottleneck)
    for k, feat in enumerate(venc):
        acc_w(d_hidden[1 + k], dz_h, feat)
    acc_bias(d_hidden_b, dz_h)
    dbottleneck = _dot_tm(hidden_parts[0], dz_h)

    # bottleneck + opacity heads (both consume h_list[-1])
    h_last = h_list[-1]
    dbottleneck = dbottleneck.astype(compute_dtype)
    acc_w(d_bottleneck, dbottleneck, h_last)
    acc_bias(d_bottleneck_b, dbottleneck)
    acc_w(d_opacity, g_opacity, h_last)
    acc_bias(d_opacity_b, g_opacity)

    dh = _dot_tm(bottleneck_w, dbottleneck) + _dot_tm(opacity_w,
                                                      g_opacity)

    # body, last layer to first
    for i in range(num_layers - 1, 0, -1):
        h_i = h_list[i]
        h_prev = h_list[i - 1]
        dz = (dh * _relu_mask(h_i)).astype(compute_dtype)
        kind, idx = layer_kinds[i - 1]
        if kind == "skip":
            acc_w(d_skip[idx][0], dz, h_prev)
            for k, feat in enumerate(enc):
                acc_w(d_skip[idx][1 + k], dz, feat)
            acc_bias(d_skip_b[idx], dz)
            dh = _dot_tm(skip_parts[idx][0], dz)
        else:
            acc_w(d_mid[idx], dz, h_prev)
            acc_bias(d_mid_b[idx], dz)
            dh = _dot_tm(mid_w[idx], dz)

    # first layer
    dz0 = (dh * _relu_mask(h_list[0])).astype(compute_dtype)
    for k, feat in enumerate(enc):
        acc_w(d_first[k], dz0, feat)
    acc_bias(d_first_b, dz0)


@functools.partial(jax.jit,
                   static_argnames=("model_static", "tile", "interpret"))
def _bwd_call_fm(model_static, weights: FusedNeRFWeightsFM,
                 positions_t, views_t, g_t, tile: int = 512,
                 interpret: bool = False):
    (num_layers, skip_positions, include_inputs, dtype_name) = \
        model_static
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

    def lane_spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    in_specs = ([lane_spec(3), lane_spec(3),
                 const_spec(weights.pos_enc.shape),
                 const_spec(weights.view_enc.shape)]
                + [const_spec(w.shape) for w in weight_inputs]
                + [lane_spec(8)])

    def padded_shape(w):
        # accumulators respect the (8, 128) minimum f32 tile: small
        # heads pad sublanes, (C, 1) bias columns pad lanes
        return (max(w.shape[0], 8), max(w.shape[1], 128))

    out_shapes = [jax.ShapeDtypeStruct(padded_shape(w), jnp.float32)
                  for w in weight_inputs]
    out_specs = [const_spec(padded_shape(w)) for w in weight_inputs]

    grads = pl.pallas_call(
        functools.partial(_bwd_kernel_fm, config),
        grid=(num // tile,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(positions_t, views_t, weights.pos_enc, weights.view_enc,
      *weight_inputs, g_t)

    # slice the sublane/lane pads away and restore primal dtypes
    grads = [g[:p.shape[0], :p.shape[1]].astype(p.dtype)
             for g, p in zip(grads, weight_inputs)]
    return FusedNeRFWeightsFM(
        *unflatten_fused_weights(weights, grads))


def _validate_packed_fm(model_static, weights):
    expected = 3 if model_static[2] else 2
    if (len(weights.first_parts) != expected
            or len(weights.hidden_parts) != 1 + expected):
        raise ValueError(
            "fused_nerf_train_apply_fm requires non-doubled packed "
            "weights (pack_fused_nerf_fm); got "
            f"{len(weights.first_parts)} positional / "
            f"{len(weights.hidden_parts) - 1} view encode parts, "
            f"expected {expected}.")


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5))
def fused_nerf_train_apply_fm(model_static,
                              weights: FusedNeRFWeightsFM,
                              positions, views, tile: int = 512,
                              interpret: bool = False):
    """Differentiable feature-major fused NeRF forward:
    (N, 3)+(N, 3) -> (N, 4) logits.

    ``model_static`` comes from :func:`model_statics_fm`; ``weights``
    from :func:`pack_fused_nerf_fm` (inside the same jit, so parameter
    gradients flow through the packing + transpose automatically).
    N must be a multiple of ``tile``.
    """
    _validate_packed_fm(model_static, weights)
    out = _fused_call_fm(model_static, weights,
                         positions.astype(jnp.float32).T,
                         views.astype(jnp.float32).T,
                         tile=tile, interpret=interpret)
    return out.T


def _train_fwd_fm(model_static, weights, positions, views, tile,
                  interpret):
    out = fused_nerf_train_apply_fm(model_static, weights, positions,
                                    views, tile, interpret)
    return out, (weights, positions, views)


def _train_bwd_fm(model_static, tile, interpret, residuals, g):
    weights, positions, views = residuals
    # pack both cotangents into ONE (8, N) feature-major buffer:
    # rows 0..2 color, row 3 opacity
    g_t = jnp.pad(g.T, ((0, 4), (0, 0)))
    d_weights = _bwd_call_fm(model_static, weights,
                             positions.astype(jnp.float32).T,
                             views.astype(jnp.float32).T,
                             g_t, tile=tile, interpret=interpret)
    return (d_weights, jnp.zeros_like(positions),
            jnp.zeros_like(views))


fused_nerf_train_apply_fm.defvjp(_train_fwd_fm, _train_bwd_fm)
