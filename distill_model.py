"""Drop-in CLI wrapper; see fourier_feature_nets_tpu.cli.distill_model."""

from fourier_feature_nets_tpu.cli.distill_model import main

if __name__ == "__main__":
    main()
