"""Public API surface parity with the reference package exports
(/root/reference/fourier_feature_nets/__init__.py:1-68, minus the
names that don't exist there — CameraTransform/Triangulation/
PatchVisualizer are latent bugs we do not replicate)."""

import fourier_feature_nets_tpu as ffn

REFERENCE_EXPORTS = [
    "CameraInfo", "Resolution", "MLP", "BasicFourierMLP",
    "FourierFeatureMLP", "PositionalFourierMLP", "GaussianFourierMLP",
    "NeRF", "Voxels", "ImageDataset", "PixelDataset", "SignalDataset",
    "RayDataset", "RaySampler", "RaySamples", "Raycaster", "OcTree",
    "calculate_blend_weights", "ETABar", "exponential_lr_decay",
    "hemisphere", "interpolate_bilinear", "load_model", "orbit",
    "ActivationVisualizer", "ComparisonVisualizer",
    "EvaluationVisualizer", "OrbitVideoVisualizer",
]


def test_reference_api_names_present():
    missing = [name for name in REFERENCE_EXPORTS
               if not hasattr(ffn, name)]
    assert not missing, f"missing reference API names: {missing}"


def test_framework_additions_present():
    for name in ["Mode", "RenderResult", "save_model",
                 "generate_synthetic_dataset", "Visualizer", "ops"]:
        assert hasattr(ffn, name), name


def test_scenepic_methods_gated():
    """to_scenepic exists and raises a clear error without scenepic."""
    import numpy as np
    import pytest
    camera = ffn.CameraInfo.create(
        "c", ffn.Resolution(8, 8), np.eye(3, dtype=np.float32),
        np.eye(4, dtype=np.float32))
    try:
        import scenepic  # noqa: F401
        camera.to_scenepic()  # should simply work when installed
    except ImportError:
        with pytest.raises(ImportError, match="scenepic"):
            camera.to_scenepic()
