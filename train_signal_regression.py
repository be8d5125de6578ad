"""Drop-in CLI wrapper; see fourier_feature_nets_tpu.cli.train_signal_regression."""

from fourier_feature_nets_tpu.cli.train_signal_regression import main

if __name__ == "__main__":
    main()
