"""Drop-in CLI wrapper; see fourier_feature_nets_tpu.cli.train_image_regression."""

from fourier_feature_nets_tpu.cli.train_image_regression import main

if __name__ == "__main__":
    main()
