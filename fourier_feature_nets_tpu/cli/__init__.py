"""Command-line entry points (python -m fourier_feature_nets_tpu.cli.<name>)."""
