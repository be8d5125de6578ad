"""On-device ray sample placement.

Everything the reference's CPU-side sampler computes per batch
(/root/reference/fourier_feature_nets/ray_sampler.py:301-403) —
uniform midpoint depths, stratified jitter, near/far annealing and
inverse-CDF focus sampling — expressed as pure, jit-safe functions of
``(near, far, rng, step)``. This erases the host->device transfer the
reference performs every training step (ray_caster.py:98).
"""

import jax
import jax.numpy as jnp

from .blend import calculate_blend_weights

__all__ = [
    "batch_linspace",
    "anneal_near_far",
    "uniform_t_values",
    "determine_cdf",
    "inverse_cdf_t_values",
    "merge_sorted",
    "per_ray_uniform",
    "sample_positions",
]


def per_ray_uniform(rng: jax.Array, idx: jnp.ndarray, num_samples: int,
                    salt: int = 0) -> jnp.ndarray:
    """Uniform [0, 1) draws keyed by GLOBAL ray index, not batch slot.

    Folding the step key with each ray's global index makes the jitter
    a pure function of ``(seed, step, ray)`` — independent of how the
    batch is laid out across devices. The GSPMD path (global batch)
    and the shard_map path (per-device shards of the same batch)
    therefore draw bit-identical samples, and re-sampling the same ray
    in the same step is deterministic. A single batch-shaped
    ``jax.random.uniform`` draw would instead key on *position within
    the local array*, which diverges across sharding layouts (round-1
    dryrun: gspmd loss 0.101686 vs shard_map 0.101021).

    Args:
        rng: step-level PRNG key.
        idx: (R,) global ray indices.
        num_samples: draws per ray.
        salt: distinguishes independent streams per call site.

    Returns:
        (R, num_samples) uniforms.
    """
    base = jax.random.fold_in(rng, salt)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(base, idx)
    return jax.vmap(
        lambda k: jax.random.uniform(k, (num_samples,)))(keys)


def merge_sorted(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Row-wise merge of two sorted sequences without a sort.

    Per-ray ``jnp.sort`` lowers to a full bitonic network on TPU and
    was measured pathologically slow (CLAUDE.md); but both t-value
    sequences entering the hierarchical-sampling concat are already
    monotone (jittered linspace; inverse-CDF of sorted quantiles), so
    their union is a two-sequence MERGE: each element's output rank is
    its own index plus a broadcast comparison count against the other
    sequence, and the permutation is applied as a one-hot matmul
    (MXU-friendly; per-row scatter/gather lowers to scalar loops on
    TPU — see occupancy_sampler._occupancy_matmul for the same trick).
    Ties break a-before-b.

    Args:
        a: (R, A) row-wise non-decreasing values.
        b: (R, B) row-wise non-decreasing values.

    Returns:
        (R, A + B) sorted union.
    """
    num_a = a.shape[-1]
    num_b = b.shape[-1]
    total = num_a + num_b
    # rank = own index + #elements of the other sequence ahead of me
    less = (b[..., None, :] < a[..., :, None]).astype(jnp.int32)
    rank_a = jnp.arange(num_a, dtype=jnp.int32) + jnp.sum(less, axis=-1)
    leq = (a[..., None, :] <= b[..., :, None]).astype(jnp.int32)
    rank_b = jnp.arange(num_b, dtype=jnp.int32) + jnp.sum(leq, axis=-1)

    values = jnp.concatenate([a, b], axis=-1)
    ranks = jnp.concatenate([rank_a, rank_b], axis=-1)
    onehot = jax.nn.one_hot(ranks, total, dtype=values.dtype)
    # HIGHEST precision: the default TPU matmul would round the
    # t-values to bf16 on the way through the one-hot permutation
    return jnp.einsum("...s,...sk->...k", values, onehot,
                      precision=jax.lax.Precision.HIGHEST)


def batch_linspace(start: jnp.ndarray, stop: jnp.ndarray,
                   num_samples: int) -> jnp.ndarray:
    """Vectorized linspace: (...,) bounds -> (..., num_samples) ramps.

    Parity: utils.py:179-194 (tensor generalization of linspace).
    """
    steps = jnp.linspace(0.0, 1.0, num_samples, dtype=start.dtype)
    return start[..., None] + steps * (stop - start)[..., None]


def anneal_near_far(near: jnp.ndarray, far: jnp.ndarray, step,
                    anneal_start: float, num_anneal_steps: int):
    """Shrinks [near, far] toward its midpoint early in training.

    Parity: ray_sampler.py:373-378. For ``step >= num_anneal_steps``
    (or no annealing configured) the bounds pass through unchanged.
    ``step`` may be a traced scalar; the blend factor is computed with
    jnp so the whole training step stays inside one jit.
    """
    if num_anneal_steps <= 0:
        return near, far
    progress = jnp.asarray(step, jnp.float32) / num_anneal_steps
    anneal = jnp.clip(progress, anneal_start, 1.0)
    anneal = jnp.where(jnp.asarray(step) < num_anneal_steps, anneal, 1.0)
    midpoint = (near + far) * 0.5
    return (midpoint + (near - midpoint) * anneal,
            midpoint + (far - midpoint) * anneal)


def uniform_t_values(near: jnp.ndarray, far: jnp.ndarray, num_samples: int,
                     rng: jax.Array = None,
                     jitter: jnp.ndarray = None) -> jnp.ndarray:
    """Evenly spaced sample depths with optional stratified jitter.

    Parity: ray_sampler.py:380-386 — a linspace from near to far, plus
    (when ``rng``/``jitter`` is given) per-sample uniform jitter of up
    to one bin width ``(far - near) / num_samples``. The jitter never
    exceeds the linspace step, so the output stays row-wise sorted.

    Args:
        near: (R,) entry depths.
        far: (R,) exit depths.
        num_samples: samples per ray.
        rng: PRNG key for stratified jitter, or None for deterministic.
        jitter: optional precomputed (R, num_samples) uniforms in
            [0, 1) (e.g. from ``per_ray_uniform``); overrides ``rng``.

    Returns:
        (R, num_samples) t values (row-wise sorted).
    """
    t_values = batch_linspace(near, far, num_samples)
    if jitter is None and rng is not None:
        jitter = jax.random.uniform(rng, t_values.shape, t_values.dtype)
    if jitter is not None:
        scale = (far - near) / num_samples
        t_values = t_values + jitter * scale[..., None]
    return t_values


def determine_cdf(t_values: jnp.ndarray,
                  opacity: jnp.ndarray) -> jnp.ndarray:
    """Builds a per-ray CDF over depth from coarse opacity estimates.

    Parity: ray_sampler.py:59-67 — blend weights with their first and
    last samples dropped, floored at 1e-5, normalized cumulative sum
    with a zero prepended. Output shape (R, S-1) for input (R, S).
    """
    weights = calculate_blend_weights(t_values, opacity)
    weights = weights[..., 1:-1] + 1e-5
    cdf = jnp.cumsum(weights, axis=-1)
    cdf = cdf / cdf[..., -1:]
    zero = jnp.zeros_like(cdf[..., :1])
    return jnp.concatenate([zero, cdf], axis=-1)


def _rowwise_searchsorted_right(cdf: jnp.ndarray,
                                quantiles: jnp.ndarray) -> jnp.ndarray:
    """Per-row searchsorted(side='right') as a comparison-count.

    For small bin counts this broadcast-and-sum formulation is orders
    of magnitude faster on TPU than ``vmap(jnp.searchsorted)`` (which
    lowers to per-row binary-search gathers): index = #{b: cdf_b <= q}.
    """
    hits = cdf[..., None, :] <= quantiles[..., :, None]
    return jnp.sum(hits.astype(jnp.int32), axis=-1)


def _monotone_bracket(values: jnp.ndarray, hits: jnp.ndarray,
                      last: jnp.ndarray):
    """Bracketing (below, above) edge values for each query.

    ``hits[r, s, b]`` marks edges at-or-below quantile s — a PREFIX of
    each row because ``values`` is monotone non-decreasing. The edge
    pair around the query is therefore a masked max (last hit) and a
    masked min (first miss): pure vector reductions. The equivalent
    ``take_along_axis`` row gathers lower to scalar gather loops on
    TPU and were measured ~10x slower at render scale.
    """
    big = jnp.asarray(3e38, values.dtype)
    rows = values[..., None, :]
    below = jnp.max(jnp.where(hits, rows, -big), axis=-1)
    above = jnp.min(jnp.where(hits, big, rows), axis=-1)
    # every edge hit (quantile == cdf[-1]): clamp to the last edge
    above = jnp.where(above >= big, last, above)
    return below, above


def _inverse_cdf_interp(grid: jnp.ndarray, cdf: jnp.ndarray,
                        quantiles: jnp.ndarray, eps: float):
    """Maps quantiles through a discrete CDF by bracket + lerp.

    Shared core of :func:`inverse_cdf_from_bins` and
    :func:`inverse_cdf_t_values` — gather-free bracketing (cdf and
    grid are both monotone, so the bin around each quantile comes from
    masked max/min reductions instead of searchsorted +
    take_along_axis), then linear interpolation with an
    ``eps``-guarded denominator (1e-5 preserves the reference's
    epsilon at ray_sampler.py:348; the explicit-bins API uses a
    tighter 1e-9).
    """
    hits = cdf[..., None, :] <= quantiles[..., :, None]
    cdf_i, cdf_j = _monotone_bracket(cdf, hits, cdf[..., -1:])
    t_i, t_j = _monotone_bracket(grid, hits, grid[..., -1:])
    denominator = cdf_j - cdf_i
    denominator = jnp.where(denominator < eps,
                            jnp.ones_like(denominator), denominator)
    frac = (quantiles - cdf_i) / denominator
    return t_i + frac * (t_j - t_i)


def inverse_cdf_from_bins(t_edges: jnp.ndarray, cdf: jnp.ndarray,
                          num_samples: int,
                          rng: jax.Array = None,
                          stratified_quantiles: bool = False,
                          quantiles: jnp.ndarray = None
                          ) -> jnp.ndarray:
    """Inverse-transform sampling over explicit bin edges.

    Args:
        t_edges: (R, B+1) monotonically increasing bin edges.
        cdf: (R, B+1) cumulative distribution at the edges
            (cdf[:, 0] == 0, cdf[:, -1] == 1).
        num_samples: samples to draw per ray.
        rng: PRNG key for random quantiles; None = even spacing.
        stratified_quantiles: draw one jittered quantile per stratum
            ((k + u)/num_samples) instead of iid uniforms — the
            output is then sorted by construction (no sort needed)
            with lower variance.
        quantiles: optional precomputed (R, num_samples) quantiles in
            [0, 1); overrides ``rng`` — pass layout-invariant per-ray
            draws (``per_ray_uniform``) so data-parallel shardings
            sample identically.

    Returns:
        (R, num_samples) t values, linearly interpolated within bins.
    """
    num_rays = t_edges.shape[0]
    if quantiles is not None:
        pass
    elif rng is None:
        quantiles = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, num_samples),
            (num_rays, num_samples))
    elif stratified_quantiles:
        jitter = jax.random.uniform(rng, (num_rays, num_samples))
        quantiles = (jnp.arange(num_samples) + jitter) / num_samples
    else:
        quantiles = jax.random.uniform(rng, (num_rays, num_samples))

    return _inverse_cdf_interp(t_edges, cdf, quantiles, eps=1e-9)


def inverse_cdf_t_values(near: jnp.ndarray, far: jnp.ndarray,
                         cdf: jnp.ndarray, num_samples: int,
                         num_cdf_samples: int,
                         rng: jax.Array = None,
                         quantiles: jnp.ndarray = None) -> jnp.ndarray:
    """Inverse-transform sampling of depths from a per-ray CDF.

    The coarse t grid is reconstructed exactly as the CDF was built
    over it — midpoints of a ``num_cdf_samples``-point linspace over
    [near, far] (ray_sampler.py:305-307) — then ``num_samples``
    uniform (or evenly spaced) quantiles are mapped through the CDF by
    searchsorted + linear interpolation (ray_sampler.py:301-357).

    Args:
        near/far: (R,) the *unannealed* ray bounds used to build the CDF.
        cdf: (R, num_cdf_samples - 1) cumulative distribution.
        num_samples: number of focus samples to draw per ray.
        num_cdf_samples: resolution of the coarse grid the CDF came from.
        rng: PRNG key for random quantiles, or None for even spacing.
        quantiles: optional precomputed (R, num_samples) quantiles in
            [0, 1); overrides ``rng``. Sorted quantiles yield sorted
            t values (the inverse CDF is monotone), enabling a
            sort-free downstream merge.

    Returns:
        (R, num_samples) sampled t values.
    """
    t_values = batch_linspace(near, far, num_cdf_samples)
    t_values = 0.5 * (t_values[..., :-1] + t_values[..., 1:])

    num_rays = near.shape[0]
    if quantiles is None:
        if rng is not None:
            quantiles = jax.random.uniform(rng, (num_rays, num_samples))
        else:
            quantiles = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, num_samples),
                (num_rays, num_samples))

    # reference-parity epsilon: ray_sampler.py:348
    return _inverse_cdf_interp(t_values, cdf, quantiles, eps=1e-5)


def sample_positions(starts: jnp.ndarray, directions: jnp.ndarray,
                     t_values: jnp.ndarray) -> jnp.ndarray:
    """Expands rays into 3D sample positions: ``start + t * direction``.

    Args:
        starts: (R, 3) ray origins.
        directions: (R, 3) ray directions.
        t_values: (R, S) sample depths.

    Returns:
        (R, S, 3) positions.
    """
    return starts[:, None, :] + t_values[..., None] * directions[:, None, :]
