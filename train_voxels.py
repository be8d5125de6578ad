"""Drop-in CLI wrapper; see fourier_feature_nets_tpu.cli.train_voxels."""

from fourier_feature_nets_tpu.cli.train_voxels import main

if __name__ == "__main__":
    main()
