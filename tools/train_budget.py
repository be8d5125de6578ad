"""Phase budget + MFU for the flagship FM training step (real TPU).

The serving frame was decomposed twice (docs/RESULTS.md § frame
floor, § serving-frame budget); this does the same for the train step
that dominates `Raycaster.fit` (the reference loop ray_caster.py:
310-375): scan-amortized timings for each phase of the bench.py
1024x128 step — fused fwd, fwd+bwd, blend+loss, Adam+clip, pack,
production batch sampling — plus the per-call dispatch overhead and
the roofline fraction (recompute-inclusive matmul FLOPs vs the chip's
bf16 peak).

FLOP accounting: the recompute-backward scheme (ops/fused_nerf_
train_fm.py) runs the forward matmul chain F once in fwd, then in bwd
recomputes F and adds dW = dz h^T (F) and dh = W^T dz (F) per layer —
a 4F total per step, with F = 2 * N * sum(W.size) over the packed
weight matrices.

Usage: python -m tools.train_budget [--rays N] [--samples S]
"""

import argparse
import sys
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rays", type=int, default=1024)
    parser.add_argument("--samples", type=int, default=128)
    parser.add_argument("--scan-steps", type=int, default=50)
    parser.add_argument("--peak-tflops", type=float, default=197.0,
                        help="bf16 peak of the chip (v5e: 197)")
    parser.add_argument("--interpret", action="store_true",
                        help="Pallas interpret mode (CPU smoke test; "
                        "timings are meaningless)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from fourier_feature_nets_tpu.models import flagship_nerf
    from fourier_feature_nets_tpu.ops.fused_nerf_train_fm import (
        fused_nerf_train_apply_fm,
        model_statics_fm,
        pack_fused_nerf_fm,
    )
    from fourier_feature_nets_tpu.render.raycaster import _composite
    from fourier_feature_nets_tpu.utils import adam_init, adam_update

    model = flagship_nerf()
    params = model.init(jax.random.PRNGKey(0))
    rays, samples = args.rays, args.samples
    scan_steps = args.scan_steps
    # interpret mode runs on CPU XLA, which has no bf16 dot
    kdtype = jnp.float32 if args.interpret else jnp.bfloat16
    statics = model_statics_fm(model, kdtype)

    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    t = jnp.sort(jax.random.uniform(k1, (rays, samples), jnp.float32,
                                    1.0, 4.0), -1)
    d = jax.random.normal(k2, (rays, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pos = (jnp.zeros((rays, 1, 3)) + t[..., None] * d[:, None])
    views = jnp.broadcast_to(d[:, None], pos.shape)
    fpos = pos.reshape(-1, 3)
    fviews = views.reshape(-1, 3)
    target = jnp.ones((rays, 3)) * 0.5

    def scan_time(body_fn, init, iters=scan_steps, rounds=3):
        """Best-of-``rounds`` mean seconds/iter of body_fn inside one
        compiled scan, chained through a scalar carry (bench.py
        methodology — the MIN over rounds measures the hardware, the
        outliers measure the tunnel's congestion episodes, CLAUDE.md)."""
        @jax.jit
        def run(carry):
            def body(c, _):
                return body_fn(c), None
            c, _ = jax.lax.scan(body, carry,
                                jnp.arange(iters, dtype=jnp.int32))
            return c
        c = run(init)
        jax.tree_util.tree_map(
            lambda a: float(jnp.sum(jnp.ravel(a)[0])), c)
        best = float("inf")
        for _ in range(rounds):
            start = time.perf_counter()
            c = run(c)
            jax.tree_util.tree_map(
                lambda a: float(jnp.sum(jnp.ravel(a)[0])), c)
            best = min(best, time.perf_counter() - start)
        return best / iters, run, c

    rows = []

    def report(label, dt):
        rows.append((label, dt))
        print(f"{label:<26}: {dt * 1e3:7.3f} ms")

    # --- full step: pack + fused fwd+bwd + composite/loss + Adam ---
    def full_step(carry):
        p, opt, c = carry

        def loss_fn(p):
            packed = pack_fused_nerf_fm(model, p, kdtype)
            logits = fused_nerf_train_apply_fm(
                statics, packed, fpos + c * 0.0, fviews, 512,
                args.interpret)
            out = _composite(logits.reshape(rays, samples, 4), t,
                             False)
            return jnp.mean(jnp.square(out.color - target))

        loss, grads = jax.value_and_grad(loss_fn)(p)
        p, opt = adam_update(grads, opt, p, 5e-4, weight_decay=1e-6,
                             clip_value=0.1, clip_norm=0.1)
        return p, opt, loss

    dt_full, run_full, _ = scan_time(
        full_step, (params, adam_init(params), jnp.float32(0.0)))
    report("full step", dt_full)

    # --- dispatch overhead: the same step NOT scan-amortized ---
    @jax.jit
    def one_step(p, opt, c):
        return full_step((p, opt, c))

    state = one_step(params, adam_init(params), jnp.float32(0.0))
    float(state[2])
    n_disp = 20
    dt_single = float("inf")
    for _ in range(3):  # best-of, congestion immunity (CLAUDE.md)
        start = time.perf_counter()
        for _ in range(n_disp):
            state = one_step(*state)
        float(state[2])
        dt_single = min(dt_single,
                        (time.perf_counter() - start) / n_disp)
    report("full step (1/dispatch)", dt_single)
    print(f"  -> per-dispatch overhead ~{(dt_single - dt_full) * 1e3:.2f} ms "
          "(asynchronously pipelined across calls; amortized away by "
          "fit(steps_per_call=K))")

    # --- fwd only (pack + kernel + composite + loss) ---
    def fwd_only(carry):
        # carry-dependent params so XLA cannot hoist the pack out of
        # the scan (it is loop-invariant otherwise)
        p = jax.tree_util.tree_map(lambda a: a + carry * 0.0, params)
        packed = pack_fused_nerf_fm(model, p, kdtype)
        logits = fused_nerf_train_apply_fm(
            statics, packed, fpos + carry * 0.0, fviews, 512,
            args.interpret)
        out = _composite(logits.reshape(rays, samples, 4), t, False)
        return jnp.mean(jnp.square(out.color - target))

    dt_fwd, _, _ = scan_time(fwd_only, jnp.float32(0.0))
    report("fwd (pack+kernel+loss)", dt_fwd)

    # --- fwd+bwd without the optimizer ---
    def fwd_bwd(carry):
        def loss_fn(p):
            packed = pack_fused_nerf_fm(model, p, kdtype)
            logits = fused_nerf_train_apply_fm(
                statics, packed, fpos + carry * 0.0, fviews, 512,
                args.interpret)
            out = _composite(logits.reshape(rays, samples, 4), t,
                             False)
            return jnp.mean(jnp.square(out.color - target))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss + sum(jnp.sum(g) * 1e-12
                          for g in jax.tree_util.tree_leaves(grads))

    dt_fb, _, _ = scan_time(fwd_bwd, jnp.float32(0.0))
    report("fwd+bwd (no optimizer)", dt_fb)
    print(f"  -> bwd kernel ~{(dt_fb - dt_fwd) * 1e3:.3f} ms, "
          f"Adam+clip+pack-grad ~{(dt_full - dt_fb) * 1e3:.3f} ms")

    # --- blend/composite + loss alone (on precomputed logits) ---
    logits0 = jnp.zeros((rays, samples, 4))

    def blend_loss(carry):
        out = _composite(logits0 + carry * 0.0, t, False)
        return jnp.mean(jnp.square(out.color - target))

    dt_blend, _, _ = scan_time(blend_loss, jnp.float32(0.0))
    report("blend+loss alone", dt_blend)

    # --- Adam + dual clipping alone ---
    grads0 = jax.tree_util.tree_map(lambda a: a * 1e-3, params)

    def adam_only(carry):
        p, opt, c = carry
        g = jax.tree_util.tree_map(lambda a: a + c * 1e-20, grads0)
        p, opt = adam_update(g, opt, p, 5e-4, weight_decay=1e-6,
                             clip_value=0.1, clip_norm=0.1)
        return p, opt, c + 1e-6

    dt_adam, _, _ = scan_time(
        adam_only, (params, adam_init(params), jnp.float32(0.0)))
    report("Adam+clip alone", dt_adam)

    # --- pack alone (transpose/cast of the param pytree) ---
    def pack_only(carry):
        p = jax.tree_util.tree_map(lambda a: a + carry * 0.0, params)
        packed = pack_fused_nerf_fm(model, p, kdtype)
        return carry + sum(
            jnp.sum(w.astype(jnp.float32)) * 1e-12
            for w in jax.tree_util.tree_leaves(packed))

    dt_pack, _, _ = scan_time(pack_only, jnp.float32(0.0))
    report("pack alone", dt_pack)

    # --- production batch sampling (epoch perm slice + sampler) ---
    try:
        import numpy as np

        from fourier_feature_nets_tpu.cameras import Resolution
        from fourier_feature_nets_tpu.datasets.synthetic import (
            load_or_generate,
        )
        from fourier_feature_nets_tpu.datasets import ImageDataset
        from fourier_feature_nets_tpu.utils.assets import (
            default_data_dir,
        )
        import os

        path = load_or_generate(
            os.path.join(default_data_dir(), "synthetic_400.npz"),
            resolution=400)
        dataset = ImageDataset.load(path, "train", samples, True,
                                    stratified=True)
        sampler = dataset.sampler
        _ = sampler.starts.shape  # force lazy tables outside jit
        num_rays = sampler.num_rays

        def sample_batch(carry):
            step, c = carry
            key = jax.random.fold_in(jax.random.PRNGKey(3), step)
            idx = jax.random.randint(key, (rays,), 0, num_rays)
            smp = sampler.sample(idx, step=step, rng=key)
            return step + 1, c + jnp.sum(smp.t_values) * 1e-9

        dt_sample, _, _ = scan_time(
            sample_batch, (jnp.int32(0), jnp.float32(0.0)))
        report("batch sampling (400px)", dt_sample)
    except Exception as error:
        print(f"batch sampling: skipped ({str(error)[:120]})",
              file=sys.stderr)

    # --- roofline ---
    packed = pack_fused_nerf_fm(model, params, kdtype)
    weight_elems = sum(
        w.size for w in jax.tree_util.tree_leaves(packed)
        if w.ndim == 2 and w.shape[1] > 1)  # matrices, not biases
    n_pts = rays * samples
    f_fwd = 2.0 * n_pts * weight_elems
    f_step = 4.0 * f_fwd  # fwd + recompute + dW + dh
    peak = args.peak_tflops * 1e12
    print("--- roofline ---")
    print(f"matmul weight elements: {weight_elems:,} "
          f"({n_pts:,} samples/step)")
    print(f"F_fwd = {f_fwd / 1e9:.2f} GFLOP, step total (4F) = "
          f"{f_step / 1e9:.2f} GFLOP")
    print(f"achieved: {f_step / dt_full / 1e12:.2f} TFLOP/s "
          f"= {f_step / dt_full / peak:.1%} MFU "
          f"(vs {args.peak_tflops:.0f} TFLOP bf16 peak)")
    print(f"MXU-floor step time at peak: {f_step / peak * 1e3:.3f} ms "
          f"(measured {dt_full * 1e3:.3f} ms -> "
          f"{dt_full / (f_step / peak):.1f}x above)")


if __name__ == "__main__":
    main()
