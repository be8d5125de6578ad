"""Drop-in CLI wrapper; see fourier_feature_nets_tpu.cli.orbit_video."""

from fourier_feature_nets_tpu.cli.orbit_video import main

if __name__ == "__main__":
    main()
