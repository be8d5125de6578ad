"""Optional scenepic visualizations.

The reference renders interactive 3D scene inspections with scenepic
(camera frusta, sampled rays, model point clouds — camera_info.py:111,
image_dataset.py:484, ray_caster.py:379). scenepic is an optional
dependency here: these functions implement the same visualizations
when it is installed and raise a clear ImportError otherwise (the
PNG-based visualizers in :mod:`.visualizers` cover headless
environments).
"""

import numpy as np

__all__ = ["camera_to_scenepic", "dataset_to_scenepic",
           "model_to_scenepic"]


def _require_scenepic():
    try:
        import scenepic as sp
        return sp
    except ImportError as error:
        raise ImportError(
            "scenepic visualizations require the optional 'scenepic' "
            "package (pip install scenepic)") from error


def camera_to_scenepic(camera, znear: float = 0.01, zfar: float = 100):
    """Converts a CameraInfo to a scenepic Camera
    (camera_info.py:111-118 parity)."""
    sp = _require_scenepic()
    world_to_camera = sp.Transforms.gl_world_to_camera(camera.extrinsics)
    projection = sp.Transforms.gl_projection(camera.intrinsics,
                                             camera.resolution.width,
                                             camera.resolution.height,
                                             znear, zfar)
    return sp.Camera(world_to_camera, projection)


def dataset_to_scenepic(dataset, num_rays_per_camera: int = 256):
    """Builds a ray-sampling inspection scene: camera frusta, image
    billboards, the bounds cube, and per-camera sample point clouds
    colored by ground truth (image_dataset.py:484-598 behavior)."""
    sp = _require_scenepic()
    import matplotlib.pyplot as plt

    scene = sp.Scene()
    frustums = scene.create_mesh("frustums", layer_id="frustums")
    height = 800
    width = height * dataset.image_width // dataset.image_height
    canvas = scene.create_canvas_3d(width=width, height=height)
    canvas.shading = sp.Shading(sp.Colors.Gray)

    cameras = dataset.cameras
    colors = plt.get_cmap("jet")(np.linspace(0, 1, len(cameras)))[:, :3]
    image_meshes = []
    for i, (pixels, camera, color) in enumerate(
            zip(dataset.images, cameras, colors)):
        sp_camera = camera_to_scenepic(camera)
        image = scene.create_image()
        image.from_numpy(pixels[..., :3])
        mesh = scene.create_mesh(layer_id="images",
                                 texture_id=image.image_id,
                                 double_sided=True)
        mesh.add_camera_image(sp_camera, depth=0.5)
        image_meshes.append(mesh)
        frustums.add_camera_frustum(sp_camera, color, depth=0.5,
                                    thickness=0.01)

    bounds_mesh = scene.create_mesh("bounds", layer_id="bounds")
    bounds_mesh.add_cube(sp.Colors.Blue,
                         transform=dataset.sampler.bounds)

    for cam in range(dataset.num_cameras):
        pool = dataset.sampler._valid_for_camera(cam)
        sel = np.linspace(0, len(pool), num_rays_per_camera,
                          endpoint=False).astype(int)
        idx = pool[sel]
        samples = dataset.get_rays_global(idx) if hasattr(
            dataset, "get_rays_global") else (
            dataset.sampler.sample(idx, None))
        render = dataset.render(samples.rays).numpy()

        positions = np.asarray(samples.positions).reshape(-1, 3)
        point_colors = np.repeat(render.color, dataset.num_samples,
                                 axis=0)
        if render.alpha is not None:
            empty = np.repeat(render.alpha < 0.1, dataset.num_samples)
        else:
            empty = np.zeros(len(positions), bool)

        mesh = scene.create_mesh(layer_id="samples")
        mesh.add_sphere(sp.Colors.White,
                        transform=sp.Transforms.scale(0.01))
        mesh.enable_instancing(positions=positions[~empty],
                               colors=point_colors[~empty])

        frame = canvas.create_frame()
        if empty.any():
            empty_mesh = scene.create_mesh(layer_id="empty samples")
            empty_mesh.add_sphere(sp.Colors.Black,
                                  transform=sp.Transforms.scale(0.01))
            empty_mesh.enable_instancing(positions=positions[empty])
            frame.add_mesh(empty_mesh)
        frame.camera = camera_to_scenepic(cameras[cam])
        frame.add_mesh(bounds_mesh)
        frame.add_mesh(mesh)
        frame.add_mesh(frustums)
        for image_mesh in image_meshes:
            frame.add_mesh(image_mesh)

    canvas.set_layer_settings({"bounds": {"opacity": 0.25},
                               "images": {"opacity": 0.5}})
    scene.framerate = 10
    return scene


def model_to_scenepic(raycaster, params, dataset, num_cameras: int = 10,
                      resolution: int = 50, num_samples: int = 64,
                      empty_threshold: float = 0.1):
    """Visualizes the current model state as colored sample spheres
    along rays from a camera subset (ray_caster.py:379-488 behavior)."""
    sp = _require_scenepic()
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    dataset = dataset.sample_cameras(num_cameras, num_samples, False)
    scene = sp.Scene()
    frustums = scene.create_mesh("frustums", layer_id="frustums")
    canvas_res = dataset.cameras[0].resolution.scale_to_height(800)
    canvas = scene.create_canvas_3d(width=canvas_res.width,
                                    height=canvas_res.height)
    canvas.shading = sp.Shading(sp.Colors.Gray)

    colors = plt.get_cmap("jet")(
        np.linspace(0, 1, dataset.num_cameras))[:, :3]
    image_meshes = []
    for pixels, camera, color in zip(dataset.images, dataset.cameras,
                                     colors):
        sp_camera = camera_to_scenepic(camera)
        image = scene.create_image()
        image.from_numpy(pixels[..., :3])
        mesh = scene.create_mesh(layer_id="images",
                                 texture_id=image.image_id,
                                 double_sided=True)
        mesh.add_camera_image(sp_camera, depth=0.5)
        image_meshes.append(mesh)
        frustums.add_camera_frustum(sp_camera, color, depth=0.5,
                                    thickness=0.01)

    sampler = dataset.sampler
    for cam in range(dataset.num_cameras):
        pool = sampler._valid_for_camera(cam)
        sel = np.linspace(0, len(pool), resolution * resolution,
                          endpoint=False).astype(int)
        rays = sampler.sample(jnp.asarray(pool[sel]), None)
        pred = raycaster.batched_render(params, rays, 4096, False)

        positions = np.asarray(rays.positions).reshape(-1, 3)
        color = np.repeat(np.clip(pred.color, 0, 1), num_samples, 0)
        empty = np.repeat(pred.alpha < empty_threshold, num_samples)

        mesh = scene.create_mesh()
        mesh.add_sphere(sp.Colors.White,
                        transform=sp.Transforms.scale(0.02))
        mesh.enable_instancing(positions=positions[~empty],
                               colors=color[~empty])
        empty_mesh = scene.create_mesh(layer_id="empty",
                                       shared_color=sp.Colors.Black)
        empty_mesh.add_sphere(transform=sp.Transforms.scale(0.02))
        empty_mesh.enable_instancing(positions=positions[empty])

        frame = canvas.create_frame()
        frame.camera = camera_to_scenepic(dataset.cameras[cam])
        frame.add_mesh(mesh)
        frame.add_mesh(empty_mesh)
        frame.add_mesh(frustums)
        for image_mesh in image_meshes:
            frame.add_mesh(image_mesh)

    scene.framerate = 10
    return scene
