"""Import-time stand-in for trimesh (not installed; only needed by the
reference's mesh-voxelization path, which the baseline runs skip)."""


def load(*args, **kwargs):
    raise NotImplementedError("trimesh stub: mesh loading unavailable")
