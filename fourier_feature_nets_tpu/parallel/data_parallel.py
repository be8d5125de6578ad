"""Explicit shard_map data-parallel training step.

The raycaster's default multi-chip path uses jit + sharding
constraints (GSPMD inserts the gradient all-reduce). This module
provides the *explicit-collective* formulation with
``jax.shard_map`` — per-device gradient computation followed by a
hand-placed ``jax.lax.pmean`` over the data axis — which documents the
communication pattern exactly, serves as a numerical cross-check of
the GSPMD path, and is the natural home for future Pallas collective
kernels.

It follows the SAME data discipline as the production step
(render/raycaster.py `_train_data`/`_bind_data`): the sampler/dataset
per-ray tables ride as a jit-ARGUMENT pytree instead of being closed
over. Closed-over device arrays are embedded as constants in the
compile payload — at 800px dataset scale that is hundreds of MB and
remote TPU runtimes reject the compile (HTTP 413, CLAUDE.md) — and
they cannot be refreshed (occupancy-guided training) without a
recompile. ``steps_per_call`` amortizes per-dispatch runtime overhead
exactly like the production path.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..utils.optim import adam_update, exponential_lr
from .mesh import DATA_AXIS, put_replicated

__all__ = ["make_shard_map_train_step"]


def make_shard_map_train_step(caster, dataset, batch_size: int,
                              learning_rate: float, decay_rate: float,
                              decay_steps: int, weight_decay: float,
                              mesh, clip_value: float = 0.1,
                              clip_norm: float = 0.1,
                              fused: bool = False,
                              steps_per_call: int = 1):
    """Builds a jitted shard_map training step.

    Each inner step slices the (replicated) epoch permutation into a
    global ``batch_size`` ray batch; every device takes its own
    ``batch_size / mesh.size`` contiguous rows (``axis_index`` slab —
    the same layout GSPMD picks for a batch sharded on the data axis),
    computes local gradients, and participates in a single pmean over
    ICI; the Adam update then runs redundantly-replicated on every
    device. With ``steps_per_call > 1`` that inner step runs under
    ``lax.scan`` with the step counter/LR schedule advancing per step.

    Gradient-clipping caveat: value clipping commutes with pmean only
    approximately; to keep *exact* torch parity the local grads are
    pmean-reduced FIRST, then clipped — matching the single-device
    order of operations.

    With ``fused=True`` each device runs the Pallas fused custom-VJP
    NeRF kernels (ops/fused_nerf_train.py) on its ray shard — this is
    how the fused training path composes with data parallelism (the
    GSPMD partitioner cannot split a pallas_call, but shard_map places
    one whole kernel per device).

    Returns:
        ``step(params, opt_state, perm, offset, step_no, rng) ->
        (params, opt_state, loss)`` where ``perm`` is the replicated
        epoch ray-index permutation and ``offset`` the first batch's
        start. ``step.refresh()`` re-collects the dataset/sampler
        device arrays (e.g. a refreshed occupancy grid) with ZERO
        recompiles — they are arguments, not constants.
    """
    sampler = dataset.sampler
    stratified = sampler.stratified
    if batch_size % mesh.size:
        raise ValueError(f"batch_size {batch_size} must divide evenly "
                         f"over the {mesh.size}-device mesh")
    local_batch = batch_size // mesh.size

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(), P(), P(), P()),
             out_specs=(P(), P(), P()),
             check_vma=False)
    def device_steps(params, opt_state, perm, offset, step_no, rng, data):
        # pin the BUILD-time sampler: _bind_data resolves
        # dataset.sampler at TRACE time, and fit's occupancy flow can
        # swap it between build and first call — the trace would then
        # silently bind the wrong sampler against this step's
        # build-time `stratified` flag and collected tables (same
        # contract as _make_train_step, raycaster._bind_data docs)
        sampler_t, dataset_t = caster._bind_data(dataset, data,
                                                 sampler=sampler)
        shard_start = jax.lax.axis_index(DATA_AXIS) * local_batch
        modulo = max(perm.shape[0] - batch_size + 1, 1)

        def one_step(carry, k):
            params, opt_state = carry
            step_k = step_no + k
            k_offset = (offset + k * batch_size) % modulo
            idx = jax.lax.dynamic_slice(perm, (k_offset + shard_start,),
                                        (local_batch,))
            step_rng = (jax.random.fold_in(rng, step_k) if stratified
                        else None)
            rays = sampler_t.sample(idx, step_k, step_rng)

            def loss_fn(p):
                if fused:
                    render = caster._train_forward(p, rays)
                else:
                    render = caster.render(p, rays, include_depth=False)
                return dataset_t.loss(idx, render)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            # all-reduce over ICI: mean of per-device loss/grads
            loss = jax.lax.pmean(loss, DATA_AXIS)
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, DATA_AXIS),
                                 grads)

            lr = exponential_lr(learning_rate, step_k, decay_rate,
                                decay_steps)
            params, opt_state = adam_update(
                grads, opt_state, params, lr, weight_decay=weight_decay,
                clip_value=clip_value, clip_norm=clip_norm)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state),
            jnp.arange(steps_per_call, dtype=jnp.int32))
        return params, opt_state, losses[-1]

    jitted = jax.jit(device_steps, donate_argnums=(0, 1))
    state = {}

    def refresh():
        """Re-collects the dataset/sampler device arrays (same-shape
        swaps cost no recompile) and replicates them over the mesh
        (multi-host aware)."""
        state["data"] = put_replicated(
            caster._train_data(dataset, sampler=sampler), mesh)

    refresh()

    def step(params, opt_state, perm, offset, step_no, rng):
        return jitted(params, opt_state, perm, offset, step_no, rng,
                      state["data"])

    step.refresh = refresh
    return step
