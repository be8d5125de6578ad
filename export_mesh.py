"""Drop-in CLI wrapper; see fourier_feature_nets_tpu.cli.export_mesh."""

from fourier_feature_nets_tpu.cli.export_mesh import main

if __name__ == "__main__":
    raise SystemExit(main())
