"""Debugging and profiling hooks.

The reference's only runtime invariants are inline NaN asserts
(ray_caster.py:73-74, voxels_model.py:44) and wall-clock timing inside
``fit`` (SURVEY.md §5). The TPU-native equivalents:

  * NaN detection: ``jax.config.jax_debug_nans`` — XLA re-runs the
    offending computation op-by-op and raises at the first NaN, a
    strictly stronger check than scattered asserts. Enable with
    :func:`enable_debug_nans` or ``FFN_TPU_DEBUG_NANS=1``.
  * Profiling: :func:`profile` wraps ``jax.profiler.trace`` so any
    training/render region can be captured for xprof/TensorBoard.
"""

import contextlib
import os

import jax

__all__ = ["enable_debug_nans", "profile", "init_from_env"]


def enable_debug_nans(enable: bool = True):
    """Raises on the first NaN produced by any jitted computation."""
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def profile(log_dir: str):
    """Captures a device trace for the enclosed region.

    View with TensorBoard's profile plugin or xprof:
        with profile("/tmp/trace"):
            train_step(...)
    """
    with jax.profiler.trace(log_dir):
        yield


def init_from_env():
    """Applies debug settings from environment variables."""
    if os.environ.get("FFN_TPU_DEBUG_NANS", "") not in ("", "0",
                                                        "false"):
        enable_debug_nans()
    if os.environ.get("FFN_TPU_FORCE_CPU", "") not in ("", "0",
                                                       "false"):
        # pin compute to host CPU even when an accelerator plugin
        # registered itself (some plugins ignore JAX_PLATFORMS); lets
        # every CLI keep working through accelerator/tunnel outages
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
