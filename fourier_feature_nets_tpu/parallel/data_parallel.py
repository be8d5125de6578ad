"""Explicit shard_map data-parallel training step.

The raycaster's default multi-chip path uses jit + sharding
constraints (GSPMD inserts the gradient all-reduce). This module
provides the *explicit-collective* formulation with
``jax.shard_map`` — per-device gradient computation followed by a
hand-placed ``jax.lax.pmean`` over the data axis — which documents the
communication pattern exactly, serves as a numerical cross-check of
the GSPMD path, and is the natural home for future Pallas collective
kernels.
"""

from functools import partial

import jax
from jax.sharding import PartitionSpec as P

from ..utils.optim import adam_update, exponential_lr
from .mesh import DATA_AXIS

__all__ = ["make_shard_map_train_step"]


def make_shard_map_train_step(caster, dataset, batch_size: int,
                              learning_rate: float, decay_rate: float,
                              decay_steps: int, weight_decay: float,
                              mesh, clip_value: float = 0.1,
                              clip_norm: float = 0.1,
                              fused: bool = False):
    """Builds a jitted shard_map training step.

    Each device receives ``batch_size / mesh.size`` rays (the global
    index batch is sharded along the data axis), computes local
    gradients, and participates in a single pmean over ICI; the Adam
    update then runs redundantly-replicated on every device.

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
        step(params, opt_state, idx, step_no, rng) ->
        (params, opt_state, loss) where ``idx`` is the (global)
        ray-index batch, sharded on the data axis.
    """
    sampler = dataset.sampler
    stratified = sampler.stratified

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P(DATA_AXIS), P(), P()),
             out_specs=(P(), P(), P()),
             check_vma=False)
    def step(params, opt_state, idx, step_no, rng):
        step_rng = jax.random.fold_in(rng, step_no) if stratified else None
        rays = sampler.sample(idx, step_no, step_rng)

        def loss_fn(p):
            if fused:
                render = caster._train_forward(p, rays)
            else:
                render = caster.render(p, rays, include_depth=False)
            return dataset.loss(idx, render)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # all-reduce over ICI: mean of per-device loss/grads
        loss = jax.lax.pmean(loss, DATA_AXIS)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, DATA_AXIS), grads)

        lr = exponential_lr(learning_rate, step_no, decay_rate,
                            decay_steps)
        params, opt_state = adam_update(
            grads, opt_state, params, lr, weight_decay=weight_decay,
            clip_value=clip_value, clip_norm=clip_norm)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))
