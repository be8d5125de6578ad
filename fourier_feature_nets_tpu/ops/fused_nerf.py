"""Pallas fused NeRF forward kernel (TPU render fast path).

The XLA-compiled NeRF forward materializes every layer's activations
in HBM (a (N, 256) tensor per layer — ~1 GB per 2M-point render
batch). This kernel runs the ENTIRE pipeline — Fourier encode,
skip-MLP body, opacity/bottleneck/view/color heads — on a tile of
points inside VMEM: weights (~1.3 MB bf16) stay VMEM-resident across
the grid and only the (N, 6) inputs and (N, 4) outputs touch HBM.

Performance-critical layout choices:
  * NO concatenation buffers: every concat in the reference
    formulation ([h, encoded], [bottleneck, view-feats]) is rewritten
    as a SUM OF SPLIT MATMULS (x @ [A; B] == x_a @ A + x_b @ B), so
    activations flow value-to-value without relayout stores.
  * the K=3 encode matmuls run as three VPU broadcast multiply-adds
    in f32 (phase accuracy at frequencies up to 2**max_log_scale —
    see ops/encoding.py).
  * bf16 storage + f32 MXU accumulation by default.

Inference-only (no VJP) — training uses the XLA autodiff path.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FusedNeRFWeights", "prepare_fused_nerf", "fused_nerf_apply"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class FusedNeRFWeights(NamedTuple):
    """Split/cast weights for the fused kernel.

    Each logical layer whose input is a concatenation is stored as the
    per-part weight blocks; biases stay f32.
    """

    pos_enc: jnp.ndarray       # (3, E_pos) f32
    view_enc: jnp.ndarray      # (3, E_view) f32
    first_parts: tuple         # (cos, sin[, raw]) blocks of layer 0
    first_b: jnp.ndarray
    mid_w: tuple               # plain 256x256 body layers
    mid_b: tuple
    skip_parts: tuple          # per skip layer: (h, cos, sin[, raw])
    skip_b: tuple
    opacity_w: jnp.ndarray     # (256, 8), col 0 live
    opacity_b: jnp.ndarray
    bottleneck_w: jnp.ndarray
    bottleneck_b: jnp.ndarray
    hidden_parts: tuple        # (bottleneck, cos, sin[, raw])
    hidden_b: jnp.ndarray
    color_w: jnp.ndarray       # (H, 8), cols 0..2 live
    color_b: jnp.ndarray


def flatten_fused_weights(weights: "FusedNeRFWeights"):
    """Flat list of weight arrays in THE kernel packing order.

    Every fused kernel (inference, ray-render, train backward) unpacks
    its flat ref/gradient list in this exact order; keeping the single
    definition here means a new FusedNeRFWeights field only has to be
    threaded through one place instead of four hand-maintained copies
    (the silent-corruption class these kernels are most exposed to).
    ``pos_enc``/``view_enc`` are excluded — they are passed separately
    because the kernels read them before the weight refs.
    """
    flat = (list(weights.first_parts) + [weights.first_b]
            + list(weights.mid_w) + list(weights.mid_b))
    for parts in weights.skip_parts:
        flat.extend(parts)
    flat.extend(weights.skip_b)
    flat.extend([weights.opacity_w, weights.opacity_b,
                 weights.bottleneck_w, weights.bottleneck_b])
    flat.extend(weights.hidden_parts)
    flat.extend([weights.hidden_b, weights.color_w, weights.color_b])
    return flat


def unflatten_fused_weights(template: "FusedNeRFWeights", flat,
                            pos_enc=None, view_enc=None):
    """Rebuilds a FusedNeRFWeights from a flat list in the
    :func:`flatten_fused_weights` order (e.g. gradient outputs).

    ``template`` supplies the tuple arities; ``pos_enc``/``view_enc``
    default to zeros_like the template's (gradient semantics).
    """
    it = iter(flat)

    def take(n):
        return tuple(next(it) for _ in range(n))

    num_enc = len(template.first_parts)
    num_mid = len(template.mid_w)
    num_skips = len(template.skip_parts)
    d_first = take(num_enc)
    (d_first_b,) = take(1)
    d_mid = take(num_mid)
    d_mid_b = take(num_mid)
    d_skip = tuple(take(len(parts)) for parts in template.skip_parts)
    d_skip_b = take(num_skips)
    d_opacity, d_opacity_b, d_bottleneck, d_bottleneck_b = take(4)
    d_hidden = take(len(template.hidden_parts))
    d_hidden_b, d_color, d_color_b = take(3)
    rest = list(it)
    assert not rest, "flat list longer than the packing order"
    if pos_enc is None:
        pos_enc = jnp.zeros_like(template.pos_enc)
    if view_enc is None:
        view_enc = jnp.zeros_like(template.view_enc)
    return FusedNeRFWeights(
        pos_enc=pos_enc, view_enc=view_enc,
        first_parts=d_first, first_b=d_first_b,
        mid_w=d_mid, mid_b=d_mid_b,
        skip_parts=d_skip, skip_b=d_skip_b,
        opacity_w=d_opacity, opacity_b=d_opacity_b,
        bottleneck_w=d_bottleneck, bottleneck_b=d_bottleneck_b,
        hidden_parts=d_hidden, hidden_b=d_hidden_b,
        color_w=d_color, color_b=d_color_b)


def on_tpu_default() -> bool:
    """True when kernels should run natively (Mosaic available).

    Honors an explicit ``jax_default_device`` override (e.g. the CPU
    test conftest) before falling back to the default backend probe.
    """
    default_device = jax.config.jax_default_device
    if default_device is not None:
        return default_device.platform == "tpu"
    return jax.default_backend() == "tpu"


def _split_rows(w: np.ndarray, sizes):
    out = []
    start = 0
    for size in sizes:
        out.append(w[start:start + size])
        start += size
    assert start == w.shape[0]
    return out


def _doubling_permutation(num_freq: int, raw: bool) -> np.ndarray:
    """Row permutation from the reference encode layout
    [cos(f-major,a-minor) | sin(...) | raw] to the double-angle
    kernel layout [c0, s0, c1, s1, ... | raw]."""
    perm = []
    for k in range(num_freq):
        perm.extend(range(3 * k, 3 * k + 3))                   # cos_k
        perm.extend(range(3 * num_freq + 3 * k,
                          3 * num_freq + 3 * k + 3))           # sin_k
    if raw:
        base = 6 * num_freq
        perm.extend(range(base, base + 3))
    return np.asarray(perm)


def _can_double(max_log_scale: float, num_freq: int) -> bool:
    """True when frequencies are consecutive powers of two
    (2**linspace(0, mls, nf) with unit steps), enabling the
    double-angle recursion."""
    return num_freq == 1 or float(max_log_scale) == float(num_freq - 1)


def prepare_fused_nerf(model, params, dtype=jnp.bfloat16,
                       use_doubling: bool = False) -> FusedNeRFWeights:
    """Splits and casts a NeRF param pytree for the fused kernel.

    ``use_doubling`` selects the double-angle encode (fewer
    transcendentals but lane-unaligned concats, measured slower on
    v5e — kept for other hardware/configs).
    """
    e_pos = model.pos_encoding.shape[1]
    e_view = model.view_encoding.shape[1]
    enc_sizes = [e_pos, e_pos] + ([3] if model.include_inputs else [])

    def cast(w):
        return jnp.asarray(np.asarray(w), dtype)

    def bias(b):
        return jnp.asarray(np.asarray(b)[None], jnp.float32)

    def pad_cols(w, cols):
        w = np.asarray(w)
        out = np.zeros((w.shape[0], cols), np.float32)
        out[:, :w.shape[1]] = w
        return jnp.asarray(out, dtype)

    def pad_bias(b, cols):
        b = np.asarray(b)
        out = np.zeros((1, cols), np.float32)
        out[0, :b.shape[0]] = b
        return jnp.asarray(out, jnp.float32)

    # double-angle fast path: when frequencies are consecutive powers
    # of two, the kernel computes only the base sin/cos and doubles
    # up, assembling features in [c0, s0, c1, s1, ... raw] order — the
    # weight rows are permuted here to match, and the whole encode
    # collapses into ONE matmul part.
    pos_double = use_doubling and _can_double(model.max_log_scale_pos,
                                              model.num_freq_pos)
    view_double = use_doubling and _can_double(model.max_log_scale_view,
                                               model.num_freq_view)

    def enc_parts(w_enc, num_freq, doubled):
        if doubled:
            perm = _doubling_permutation(num_freq, model.include_inputs)
            return (cast(w_enc[perm]),)
        return tuple(cast(p) for p in _split_rows(w_enc, enc_sizes))

    first_parts = None
    mid_w, mid_b = [], []
    skip_parts, skip_b, skip_positions = [], [], []
    for i, layer in enumerate(params["layers"]):
        w = np.asarray(layer["weight"])
        if i == 0:
            first_parts = enc_parts(w, model.num_freq_pos, pos_double)
            first_b = bias(layer["bias"])
        elif i in model.skips:
            h_part, w_enc = w[:model.num_channels], w[model.num_channels:]
            skip_parts.append(
                (cast(h_part),)
                + enc_parts(w_enc, model.num_freq_pos, pos_double))
            skip_b.append(bias(layer["bias"]))
            skip_positions.append(i)
        else:
            mid_w.append(cast(w))
            mid_b.append(bias(layer["bias"]))

    hidden_w = np.asarray(params["hidden_view"]["weight"])
    if view_double:
        perm = _doubling_permutation(model.num_freq_view,
                                     model.include_inputs)
        hidden_parts = (cast(hidden_w[:model.num_channels]),
                        cast(hidden_w[model.num_channels:][perm]))
    else:
        view_sizes = [model.num_channels, e_view, e_view] + (
            [3] if model.include_inputs else [])
        hidden_parts = tuple(cast(p) for p in _split_rows(hidden_w,
                                                          view_sizes))

    return FusedNeRFWeights(
        pos_enc=jnp.asarray(np.asarray(model.pos_encoding), jnp.float32),
        view_enc=jnp.asarray(np.asarray(model.view_encoding),
                             jnp.float32),
        first_parts=first_parts, first_b=first_b,
        mid_w=tuple(mid_w), mid_b=tuple(mid_b),
        skip_parts=tuple(skip_parts), skip_b=tuple(skip_b),
        opacity_w=pad_cols(params["opacity_out"]["weight"], 8),
        opacity_b=pad_bias(params["opacity_out"]["bias"], 8),
        bottleneck_w=cast(params["bottleneck"]["weight"]),
        bottleneck_b=bias(params["bottleneck"]["bias"]),
        hidden_parts=hidden_parts,
        hidden_b=bias(params["hidden_view"]["bias"]),
        color_w=pad_cols(params["color_out"]["weight"], 8),
        color_b=pad_bias(params["color_out"]["bias"], 8))


def _phases(x, enc_ref):
    """(tile, 3) @ (3, E) on the VPU in f32: three broadcast FMAs."""
    enc = enc_ref[:]
    return (x[:, 0:1] * enc[0][None, :]
            + x[:, 1:2] * enc[1][None, :]
            + x[:, 2:3] * enc[2][None, :])


def _fast_sincos(x):
    """sin and cos with one shared range reduction + Taylor tails.

    Rendering-grade accuracy (~1e-5 over |x| <= ~1e4): the phases here
    are bounded by 2**max_log_scale * |coord|. Much cheaper than two
    full-precision transcendental calls: one round + ~16 shared FMAs.
    """
    two_pi = 6.283185307179586
    f = x * (1.0 / two_pi)
    f = f - jnp.round(f)          # [-0.5, 0.5]
    t = f * two_pi                # [-pi, pi]
    t2 = t * t
    # Taylor coefficients 1/(2k)! and 1/(2k+1)! as float literals
    cos = 1.0 + t2 * (-0.5 + t2 * (
        4.1666666666666664e-2 + t2 * (-1.3888888888888889e-3 + t2 * (
            2.4801587301587302e-5 + t2 * (-2.7557319223985893e-7
                                          + t2 * (2.08767569878681e-9
                                                  - t2 * 1.1470745597729725e-11))))))
    sin = t * (1.0 + t2 * (-1.6666666666666666e-1 + t2 * (
        8.3333333333333332e-3 + t2 * (-1.9841269841269841e-4 + t2 * (
            2.7557319223985893e-6 + t2 * (-2.5052108385441720e-8
                                          + t2 * 1.6059043836821613e-10))))))
    return sin, cos


def _doubled_features(x, num_freq, include_inputs, compute_dtype):
    """[cos(x), sin(x), cos(2x), sin(2x), ... raw] via double-angle
    recursion: 6 transcendentals per point instead of 2*3*num_freq.

    f32 throughout; the recursion's relative error grows only
    linearly in the number of doublings (~1e-6 at 9 levels)."""
    c = jnp.cos(x)
    s = jnp.sin(x)
    pieces = []
    for _ in range(num_freq):
        pieces.append(c)
        pieces.append(s)
        c, s = 2.0 * c * c - 1.0, 2.0 * s * c
    if include_inputs:
        pieces.append(x)
    return jnp.concatenate(pieces, axis=-1).astype(compute_dtype)


def _dot(a, w_ref):
    return jax.lax.dot_general(a, w_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(config, positions_ref, views_ref, pos_enc_ref, view_enc_ref,
            *refs):
    (num_layers, skip_positions, include_inputs, num_mid,
     pos_enc_parts, view_enc_parts, pos_double, view_double,
     num_freq_pos, num_freq_view, compute_dtype, split) = config

    # unpack flat refs in the order _fused_call packed them
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

    # ``split`` independent sub-chains, emitted STAGE-MAJOR (every
    # chunk's layer-i matmul before any chunk's layer i+1): the MLP is
    # one dependent matmul chain, so a single chain leaves the MXU
    # idle during each inter-layer relu/cast; independent chunks give
    # the scheduler work to overlap it with.
    tile = positions_ref.shape[0]
    sub = tile // split
    chunks = [slice(s * sub, (s + 1) * sub) for s in range(split)]
    pos_s = [positions_ref[c] for c in chunks]
    views_s = [views_ref[c] for c in chunks]

    def encode(x, doubled, num_freq, enc_ref):
        if doubled:
            return [_doubled_features(x, num_freq, include_inputs,
                                      compute_dtype)]
        sin, cos = _fast_sincos(_phases(x, enc_ref))
        out = [cos.astype(compute_dtype), sin.astype(compute_dtype)]
        if include_inputs:
            out.append(x.astype(compute_dtype))
        return out

    enc_s = [encode(p, pos_double, num_freq_pos, pos_enc_ref)
             for p in pos_s]

    def enc_dot(enc, parts):
        acc = _dot(enc[0], parts[0])
        for feat, w_ref in zip(enc[1:], parts[1:]):
            acc += _dot(feat, w_ref)
        return acc

    # relu commutes with the (monotone, round-to-nearest) downcast:
    # applying it AFTER the bf16 cast saves one full-width f32 VPU
    # pass per layer
    h_s = [jnp.maximum((enc_dot(enc, first_parts)
                        + first_b[:]).astype(compute_dtype), 0.0)
           for enc in enc_s]

    mid_iter = 0
    skip_iter = 0
    for i in range(1, num_layers):
        if i in skip_positions:
            parts = skip_parts[skip_iter]
            acc_s = [_dot(h, parts[0]) + enc_dot(enc, parts[1:])
                     + skip_b[skip_iter][:]
                     for h, enc in zip(h_s, enc_s)]
            skip_iter += 1
        else:
            acc_s = [_dot(h, mid_w[mid_iter]) + mid_b[mid_iter][:]
                     for h in h_s]
            mid_iter += 1
        h_s = [jnp.maximum(acc.astype(compute_dtype), 0.0)
               for acc in acc_s]

    opacity_s = [_dot(h, opacity_w) + opacity_b[:] for h in h_s]
    bottleneck_s = [(_dot(h, bottleneck_w)
                     + bottleneck_b[:]).astype(compute_dtype)
                    for h in h_s]

    venc_s = [encode(v, view_double, num_freq_view, view_enc_ref)
              for v in views_s]

    hidden_s = []
    for bottleneck, venc in zip(bottleneck_s, venc_s):
        acc = _dot(bottleneck, hidden_parts[0])
        for feat, w_ref in zip(venc, hidden_parts[1:]):
            acc += _dot(feat, w_ref)
        hidden_s.append(jnp.maximum(acc + hidden_b[:],
                                    0.0).astype(compute_dtype))
    color_s = [_dot(hidden, color_w) + color_b[:]
               for hidden in hidden_s]

    for chunk, color, opacity in zip(chunks, color_s, opacity_s):
        out_ref[chunk] = jnp.concatenate([color[:, :3], opacity[:, :1]],
                                         -1)


@functools.partial(jax.jit,
                   static_argnames=("model_static", "tile", "interpret",
                                    "split"))
def _fused_call(model_static, weights: FusedNeRFWeights,
                positions: jnp.ndarray, views: jnp.ndarray,
                tile: int = 2048, interpret: bool = False,
                split: int = 1):
    (num_layers, skip_positions, include_inputs, num_freq_pos,
     num_freq_view, pos_double, view_double, dtype_name) = model_static
    compute_dtype = jnp.dtype(dtype_name)
    num = positions.shape[0]
    assert num % tile == 0
    assert tile % split == 0

    config = (num_layers, skip_positions, include_inputs,
              len(weights.mid_w), len(weights.first_parts),
              len(weights.hidden_parts) - 1, pos_double, view_double,
              num_freq_pos, num_freq_view, compute_dtype, split)

    weight_inputs = flatten_fused_weights(weights)

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

    return pl.pallas_call(
        functools.partial(_kernel, config),
        grid=(num // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num, 4), jnp.float32),
        interpret=interpret,
    )(positions, views, weights.pos_enc, weights.view_enc,
      *weight_inputs)


def fused_nerf_apply(model, weights: FusedNeRFWeights,
                     positions: jnp.ndarray, views: jnp.ndarray,
                     tile: int = 2048,
                     interpret: bool = False,
                     split: int = 1) -> jnp.ndarray:
    """Fused NeRF forward: (N, 3) positions + views -> (N, 4) logits.

    ``N`` is padded internally to a multiple of ``tile``. Inference
    only (no VJP) — use ``model.apply`` for training. ``split`` > 1
    processes the tile as that many independent sub-chains emitted
    stage-major (ILP experiment — see tools/kernel_split_bench.py).

    Dispatches on the weight layout: feature-major weights
    (:func:`.fused_nerf_fm.prepare_fused_nerf_fm`) select the
    transposed kernel, which removes the narrow-row DMA floor
    (docs/RESULTS.md § Distillation).
    """
    from .fused_nerf_fm import FusedNeRFWeightsFM, fused_nerf_apply_fm
    if isinstance(weights, FusedNeRFWeightsFM):
        if split != 1:
            # the sub-chain ILP experiment is row-major-only; silently
            # running split=1 would corrupt an A/B measurement
            raise ValueError(
                "split > 1 is a row-major-kernel experiment knob; "
                "feature-major weights do not support it (pass "
                "prepare_fused_nerf(...) weights to A/B split).")
        return fused_nerf_apply_fm(model, weights, positions, views,
                                   tile=tile, interpret=interpret)
    dtype = weights.mid_w[0].dtype if weights.mid_w else (
        weights.bottleneck_w.dtype)
    pos_double = (len(weights.first_parts) == 1)
    view_double = (len(weights.hidden_parts) == 2)
    # only in-range skips exist as packed layers
    skips = tuple(s for s in sorted(model.skips)
                  if 0 < s < model.num_layers)
    model_static = (model.num_layers, skips,
                    model.include_inputs, model.num_freq_pos,
                    model.num_freq_view, pos_double, view_double,
                    str(dtype))

    num = positions.shape[0]
    padded = _round_up(num, tile)
    if padded != num:
        positions = jnp.pad(positions, ((0, padded - num), (0, 0)))
        views = jnp.pad(views, ((0, padded - num), (0, 0)))
    # no Mosaic backend off-TPU: fall back to the Pallas interpreter
    interpret = interpret or not on_tpu_default()
    out = _fused_call(model_static, weights,
                      positions.astype(jnp.float32),
                      views.astype(jnp.float32), tile=tile,
                      interpret=interpret, split=split)
    return out[:num]
