"""Drop-in CLI wrapper; see fourier_feature_nets_tpu.cli.train_nerf."""

from fourier_feature_nets_tpu.cli.train_nerf import main

if __name__ == "__main__":
    main()
