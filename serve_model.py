"""Drop-in CLI wrapper; see fourier_feature_nets_tpu.cli.serve."""

from fourier_feature_nets_tpu.cli.serve import main

if __name__ == "__main__":
    main()
