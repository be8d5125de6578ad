"""Regenerates docs/API.md from package docstrings.

Usage: python tools/gen_api_doc.py > docs/API.md
"""

import importlib
import inspect
import os
import sys

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

SECTIONS = [
    ("fourier_feature_nets_tpu", "Top-level package"),
    ("fourier_feature_nets_tpu.ops", "Numeric core ops"),
    ("fourier_feature_nets_tpu.ops.fused_nerf",
     "Pallas fused NeRF inference kernel"),
    ("fourier_feature_nets_tpu.ops.fused_nerf_fm",
     "Feature-major fused NeRF kernel (serving default)"),
    ("fourier_feature_nets_tpu.ops.fused_nerf_train",
     "Pallas fused NeRF training kernel (custom VJP)"),
    ("fourier_feature_nets_tpu.ops.fused_nerf_train_fm",
     "Feature-major fused training kernel (training default)"),
    ("fourier_feature_nets_tpu.ops.fused_ray_render",
     "Fully-fused ray compositing kernel"),
    ("fourier_feature_nets_tpu.models", "Model family"),
    ("fourier_feature_nets_tpu.datasets", "Datasets"),
    ("fourier_feature_nets_tpu.render", "Ray sampling + raycasting"),
    ("fourier_feature_nets_tpu.parallel", "Multi-chip parallelism"),
    ("fourier_feature_nets_tpu.octree", "Sparse octree"),
    ("fourier_feature_nets_tpu.mesh_export",
     "Isosurface mesh extraction"),
    ("fourier_feature_nets_tpu.utils", "Training utilities"),
    ("fourier_feature_nets_tpu.visualizers", "Visualization hooks"),
    ("fourier_feature_nets_tpu.lecture", "Lecture companion"),
]


def first_line(obj) -> str:
    doc = inspect.getdoc(obj) or ""
    return doc.split("\n")[0] if doc else "(no docstring)"


def kind(obj) -> str:
    if inspect.isclass(obj):
        return "class"
    if callable(obj):
        return "function"
    return "value"


def main():
    print("# API reference")
    print()
    print("Generated from docstrings (first line of each public "
          "symbol) by tools/gen_api_doc.py.")
    for name, title in SECTIONS:
        module = importlib.import_module(name)
        symbols = getattr(module, "__all__", None)
        if symbols is None:
            symbols = [n for n in dir(module) if not n.startswith("_")]
        print()
        print(f"## `{name}` — {title}")
        print()
        for symbol in symbols:
            obj = getattr(module, symbol)
            print(f"- **`{symbol}`** ({kind(obj)}): {first_line(obj)}")


if __name__ == "__main__":
    main()
