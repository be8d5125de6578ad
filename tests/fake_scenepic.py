"""Recording stand-in for the optional ``scenepic`` package.

NOT a test module. Implements the API surface that
``fourier_feature_nets_tpu.scenepic_io`` (and the reference's
visualization code it mirrors — image_dataset.py:484-598,
ray_caster.py:379-488, camera_info.py:111-118) touches, recording
every call so tests can assert mesh/frustum/canvas/frame counts and
geometry instead of eyeballing HTML.
"""

import numpy as np


class Colors:
    Gray = (0.5, 0.5, 0.5)
    Blue = (0.0, 0.0, 1.0)
    White = (1.0, 1.0, 1.0)
    Black = (0.0, 0.0, 0.0)


class Shading:
    def __init__(self, color=None, **kwargs):
        self.color = color


class Transforms:
    @staticmethod
    def gl_world_to_camera(extrinsics):
        return np.linalg.inv(np.asarray(extrinsics, np.float32))

    @staticmethod
    def gl_projection(intrinsics, width, height, znear, zfar):
        proj = np.eye(4, dtype=np.float32)
        proj[0, 0] = 2 * np.asarray(intrinsics)[0, 0] / width
        proj[1, 1] = 2 * np.asarray(intrinsics)[1, 1] / height
        return proj

    @staticmethod
    def scale(value):
        return np.diag([value, value, value, 1.0]).astype(np.float32)


class Camera:
    def __init__(self, world_to_camera, projection):
        self.world_to_camera = np.asarray(world_to_camera)
        self.projection = np.asarray(projection)


class Image:
    def __init__(self, image_id):
        self.image_id = image_id
        self.array = None

    def from_numpy(self, array):
        self.array = np.asarray(array)


class Mesh:
    def __init__(self, name=None, layer_id=None, texture_id=None,
                 double_sided=False, shared_color=None):
        self.name = name
        self.layer_id = layer_id
        self.texture_id = texture_id
        self.double_sided = double_sided
        self.shared_color = shared_color
        self.frustums = []
        self.camera_images = []
        self.cubes = []
        self.spheres = []
        self.instanced_positions = None
        self.instanced_colors = None

    def add_camera_frustum(self, camera, color=None, depth=None,
                           thickness=None):
        self.frustums.append({"camera": camera, "color": color,
                              "depth": depth, "thickness": thickness})

    def add_camera_image(self, camera, depth=None):
        self.camera_images.append({"camera": camera, "depth": depth})

    def add_cube(self, color=None, transform=None):
        self.cubes.append({"color": color,
                           "transform": None if transform is None
                           else np.asarray(transform)})

    def add_sphere(self, color=None, transform=None):
        self.spheres.append({"color": color,
                             "transform": None if transform is None
                             else np.asarray(transform)})

    def enable_instancing(self, positions, colors=None, **kwargs):
        self.instanced_positions = np.asarray(positions)
        self.instanced_colors = (None if colors is None
                                 else np.asarray(colors))


class Frame:
    def __init__(self):
        self.meshes = []
        self.camera = None

    def add_mesh(self, mesh):
        self.meshes.append(mesh)


class Canvas3D:
    def __init__(self, width, height):
        self.width = width
        self.height = height
        self.shading = None
        self.frames = []
        self.layer_settings = None

    def create_frame(self):
        frame = Frame()
        self.frames.append(frame)
        return frame

    def set_layer_settings(self, settings):
        self.layer_settings = dict(settings)


class Scene:
    def __init__(self):
        self.meshes = []
        self.canvases = []
        self.images = []
        self.framerate = None
        self.saved_paths = []

    def create_mesh(self, name=None, **kwargs):
        mesh = Mesh(name=name, **kwargs)
        self.meshes.append(mesh)
        return mesh

    def create_canvas_3d(self, width=400, height=400, **kwargs):
        canvas = Canvas3D(width, height)
        self.canvases.append(canvas)
        return canvas

    def create_image(self, image_id=None):
        image = Image(image_id or f"image_{len(self.images)}")
        self.images.append(image)
        return image

    def save_as_html(self, path, title=None):
        self.saved_paths.append(path)
        with open(path, "w") as file:
            file.write(f"<html><!-- fake scenepic: {title} --></html>")
