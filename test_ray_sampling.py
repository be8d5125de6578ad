"""Drop-in CLI wrapper (visual inspection tool, not a unit test);
see fourier_feature_nets_tpu.cli.inspect_ray_sampling."""

from fourier_feature_nets_tpu.cli.inspect_ray_sampling import main

if __name__ == "__main__":
    main()
