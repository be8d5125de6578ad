"""Lecture animations: cameras, rays and the rendering equation.

Matplotlib/cv2 re-creations of the reference's scenepic lecture
animations (/root/reference/visualizations/: volume_raycasting 511,
camera_to_world 195, world_to_camera 178, ray_cube_intersection 165,
rendering_equation 125, voxels_animation 98, view_angle 71 LoC).
Each function writes a PNG frame sequence (and an MP4 when cv2 video
encoding is available) built from the framework's own geometry ops.
"""

import os

import numpy as np

from ..cameras import Resolution
from ..ops import (
    bounds_min_max,
    calculate_blend_weights,
    ray_aabb_near_far,
)
from ..utils.camera_paths import orbit

__all__ = ["camera_to_world_animation", "world_to_camera_animation",
           "ray_cube_intersection_animation",
           "rendering_equation_animation", "volume_raycasting_animation",
           "voxels_animation", "view_angle_animation",
           "save_all_animations"]


def _agg_plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def _save_frames(fig_fn, num_frames, output_dir, name, framerate=10):
    """Renders frames to PNGs + an MP4."""
    import cv2
    plt = _agg_plt()
    frame_dir = os.path.join(output_dir, name)
    os.makedirs(frame_dir, exist_ok=True)
    writer = None
    for i in range(num_frames):
        fig = fig_fn(i)
        fig.canvas.draw()
        pixels = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        plt.close(fig)
        path = os.path.join(frame_dir, f"frame_{i:04d}.png")
        bgr = cv2.cvtColor(pixels, cv2.COLOR_RGB2BGR)
        cv2.imwrite(path, bgr)
        if writer is None:
            writer = cv2.VideoWriter(
                os.path.join(output_dir, f"{name}.mp4"),
                cv2.VideoWriter_fourcc(*"mp4v"), framerate,
                (pixels.shape[1], pixels.shape[0]))
        writer.write(bgr)
    if writer is not None:
        writer.release()


def _cube_edges(lo, hi):
    corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                        for y in (lo[1], hi[1])
                        for z in (lo[2], hi[2])])
    edges = [(0, 1), (0, 2), (0, 4), (1, 3), (1, 5), (2, 3), (2, 6),
             (3, 7), (4, 5), (4, 6), (5, 7), (6, 7)]
    return corners, edges


def _draw_cube(ax, lo, hi, color="tab:blue", alpha=0.6):
    corners, edges = _cube_edges(lo, hi)
    for a, b in edges:
        ax.plot(*zip(corners[a], corners[b]), color=color, alpha=alpha)


def camera_to_world_animation(output_dir, num_frames=60):
    """A camera orbits the scene; its frustum and axes shown in world
    coordinates (camera_to_world.py equivalent)."""
    plt = _agg_plt()
    cameras = orbit(np.array([0.0, 1.0, 0.0]), np.array([0.0, 0.0, 1.0]),
                    num_frames, 40, Resolution(64, 64), 3.0)

    def frame(i):
        camera = cameras[i]
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(projection="3d")
        _draw_cube(ax, [-1, -1, -1], [1, 1, 1])
        pos = camera.position[0]
        for axis, color in zip(camera.extrinsics[:3, :3].T,
                               ("r", "g", "b")):
            ax.quiver(*pos, *axis, length=0.6, color=color)
        corners = camera.raycast(np.array(
            [[0, 0], [63, 0], [63, 63], [0, 63]], np.float32))
        for origin, direction in zip(corners.origin, corners.direction):
            end = origin + direction * 1.5
            ax.plot(*zip(origin, end), "k-", alpha=0.4)
        ax.set_xlim(-3, 3)
        ax.set_ylim(-3, 3)
        ax.set_zlim(-3, 3)
        ax.set_title("camera-to-world: frustum in world space")
        return fig

    _save_frames(frame, num_frames, output_dir, "camera_to_world")


def world_to_camera_animation(output_dir, num_frames=60):
    """World points projected into a moving camera's image plane
    (world_to_camera.py equivalent)."""
    plt = _agg_plt()
    cameras = orbit(np.array([0.0, 1.0, 0.0]), np.array([0.0, 0.0, 1.0]),
                    num_frames, 40, Resolution(256, 256), 3.0)
    rng = np.random.default_rng(0)
    points = rng.uniform(-0.8, 0.8, (128, 3)).astype(np.float32)
    colors = (points + 1) / 2

    def frame(i):
        camera = cameras[i]
        projected = camera.project(points)
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.scatter(projected[:, 0], projected[:, 1], c=colors, s=12)
        ax.set_xlim(0, 256)
        ax.set_ylim(256, 0)
        ax.set_title("world-to-camera: projected points")
        return fig

    _save_frames(frame, num_frames, output_dir, "world_to_camera")


def ray_cube_intersection_animation(output_dir, num_frames=60):
    """The slab method: a rotating ray against the unit cube with its
    near/far planes (ray_cube_intersection.py equivalent)."""
    plt = _agg_plt()
    import jax.numpy as jnp

    bounds = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    lo, hi = bounds_min_max(bounds)

    def frame(i):
        angle = 2 * np.pi * i / num_frames
        start = np.array([2.5 * np.cos(angle), 0.6,
                          2.5 * np.sin(angle)], np.float32)
        direction = -start / np.linalg.norm(start)
        direction += np.array([0.3 * np.sin(3 * angle), 0.2, 0],
                              np.float32)
        direction /= np.linalg.norm(direction)
        nf = ray_aabb_near_far(jnp.asarray(start[None]),
                               jnp.asarray(direction[None]),
                               jnp.asarray(lo), jnp.asarray(hi))
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(projection="3d")
        _draw_cube(ax, lo, hi)
        end = start + direction * 6
        ax.plot(*zip(start, end), "k-", alpha=0.5)
        if bool(nf.valid[0]):
            p0 = start + float(nf.near[0]) * direction
            p1 = start + float(nf.far[0]) * direction
            ax.plot(*zip(p0, p1), "r-", linewidth=3)
            ax.scatter(*p0, color="g", s=40)
            ax.scatter(*p1, color="m", s=40)
        ax.set_xlim(-3, 3)
        ax.set_ylim(-3, 3)
        ax.set_zlim(-3, 3)
        ax.set_title("ray/AABB slab intersection")
        return fig

    _save_frames(frame, num_frames, output_dir, "ray_cube_intersection")


def rendering_equation_animation(output_dir, num_frames=50):
    """The emission-absorption integral along one ray: opacity, alpha,
    transmittance and blend weights as opacity grows
    (rendering_equation.py equivalent)."""
    plt = _agg_plt()
    import jax.numpy as jnp

    t = np.linspace(1.0, 3.0, 64, dtype=np.float32)
    base = np.exp(-0.5 * ((t - 2.0) / 0.15) ** 2)

    def frame(i):
        scale = 12.0 * (i + 1) / num_frames
        opacity = scale * base
        weights = np.asarray(calculate_blend_weights(
            jnp.asarray(t[None]), jnp.asarray(opacity[None])))[0]
        trans = np.concatenate([[1.0], 1 - np.cumsum(weights)[:-1]])
        fig, axes = plt.subplots(3, 1, figsize=(6, 7), sharex=True)
        axes[0].plot(t, opacity)
        axes[0].set_ylabel("sigma(t)")
        axes[0].set_ylim(0, 13)
        axes[1].plot(t, trans)
        axes[1].set_ylabel("transmittance")
        axes[1].set_ylim(0, 1.05)
        axes[2].plot(t, weights)
        axes[2].set_ylabel("blend weight")
        axes[2].set_xlabel("t")
        axes[2].set_ylim(0, 0.4)
        fig.suptitle("the rendering equation along a ray")
        return fig

    _save_frames(frame, num_frames, output_dir, "rendering_equation")


def volume_raycasting_animation(output_dir, num_frames=40,
                                resolution=96):
    """Full volume raycasting of the synthetic scene from an orbiting
    camera (volume_raycasting.py equivalent, rendered with the
    framework's actual render ops)."""
    plt = _agg_plt()
    from ..datasets.synthetic import (
        make_scene_volume,
        render_dataset_images,
    )

    volume = make_scene_volume(48)
    bounds = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    cameras = orbit(np.array([0.0, 1.0, 0.0]), np.array([0.0, 0.0, 1.0]),
                    num_frames, 40, Resolution(resolution, resolution),
                    3.0)
    images = render_dataset_images(volume, cameras, bounds,
                                   num_samples=128)

    def frame(i):
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.imshow(images[i][..., :3])
        ax.set_axis_off()
        ax.set_title(f"volume raycasting (frame {i})")
        return fig

    _save_frames(frame, num_frames, output_dir, "volume_raycasting")


def voxels_animation(voxels, output_dir, min_depth=4, num_frames=60):
    """A model increasing in voxel resolution (voxels_animation.py
    equivalent): the octree is pruned from its full depth down to
    ``min_depth``; an orbiting view shows each level's leaf voxels
    (colored by leaf data) with a voxel-count label, sweeping from
    coarse to fine over the animation.

    Args:
        voxels: an :class:`~fourier_feature_nets_tpu.octree.OcTree`
            at maximum resolution (it is pruned level by level).
        output_dir: directory for the PNG frames + MP4.
        min_depth: coarsest level in the sweep.
        num_frames: frames in the orbit.
    """
    plt = _agg_plt()
    max_depth = voxels.depth
    levels = {}
    while voxels.depth >= min_depth:
        colors = voxels.leaf_data()
        if colors is None:
            colors = np.full((voxels.num_leaves, 3), 0.5, np.float32)
        levels[voxels.depth] = (voxels.leaf_centers(),
                                voxels.leaf_depths(),
                                np.clip(colors[:, :3], 0.0, 1.0),
                                voxels.scale)
        if voxels.depth == min_depth:
            break
        voxels = voxels.prune()

    frame_depth = np.linspace(min_depth, max_depth + 1, num_frames,
                              endpoint=False).astype(np.int32)

    def frame(i):
        centers, depths, colors, scale = levels[int(frame_depth[i])]
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(projection="3d")
        # marker area tracks the world-space voxel edge length
        sizes = (2.0 ** (1 - depths.astype(np.float32)) * scale
                 / (2 * scale) * 72) ** 2
        ax.scatter(centers[:, 0], centers[:, 1], centers[:, 2],
                   c=colors, s=sizes, marker="s", depthshade=False)
        ax.view_init(elev=20, azim=360.0 * i / num_frames)
        lim = scale
        ax.set_xlim(-lim, lim)
        ax.set_ylim(-lim, lim)
        ax.set_zlim(-lim, lim)
        ax.set_axis_off()
        ax.set_title(f"{len(centers)} voxels")
        return fig

    _save_frames(frame, num_frames, output_dir, "voxels")


def view_angle_animation(dataset, raycaster, params, output_dir,
                         camera=1, row=None, col=None,
                         angle_threshold=0.5, patch_size=32,
                         zoom_size=128):
    """How one surface point looks from different viewing angles
    (view_angle.py equivalent): a pixel in a source camera is lifted
    to 3D using the model's rendered depth, then every camera within
    ``angle_threshold`` (cosine) of the source view gets a frame
    showing its image, the reprojected patch around the point, and a
    magnified inset of that patch.

    Args:
        dataset: an ImageDataset (images + cameras + ray sampler).
        raycaster / params: model used to render the pixel's depth.
        output_dir: directory for the PNG frames + MP4.
        camera: source camera index.
        row / col: source pixel (defaults to the image center).
        angle_threshold: minimum cosine between camera positions.
        patch_size / zoom_size: reprojected patch + inset sizes.
    """
    import cv2
    import jax.numpy as jnp

    sampler = dataset.sampler
    width = sampler.image_width
    height = sampler.image_height
    if row is None:
        row = height // 2
    if col is None:
        col = width // 2

    # lift the source pixel to 3D with the model's depth
    import jax

    index = camera * sampler.rays_per_camera + row * width + col
    rng = jax.random.PRNGKey(0) if sampler.stratified else None
    rays = sampler.sample(jnp.asarray([index]), None, rng)
    render = raycaster.render(params, rays, include_depth=True)
    start = np.asarray(sampler.starts[index])
    direction = np.asarray(sampler.directions[index])
    position = start + direction * float(render.depth[0])

    def _rgb(image):
        image = image.astype(np.float32) / 255
        if image.shape[-1] == 4:
            image = image[..., :3] * image[..., 3:]
        return (image * 255).astype(np.uint8)

    source_pos = dataset.cameras[camera].position.reshape(-1)
    source_pos = source_pos / np.linalg.norm(source_pos)

    frame_dir = os.path.join(output_dir, "view_angle")
    os.makedirs(frame_dir, exist_ok=True)
    writer = None
    half = patch_size // 2
    # the inset must fit the frame: low-res datasets (e.g. the 100px
    # synthetic scene) with the default zoom_size=128 would otherwise
    # produce a negative slice start and a shape-mismatch crash
    zoom_size = min(zoom_size, height, width)
    zoom_row = (height - zoom_size) // 2
    zoom_col = width + (width - zoom_size) // 2
    out = 0
    for cam, image in zip(dataset.cameras, dataset.images):
        pos = cam.position.reshape(-1)
        angle = float((source_pos * pos / np.linalg.norm(pos)).sum())
        if angle < angle_threshold:
            continue

        u, v = cam.project(position[np.newaxis])[0]
        c, r = int(u) - half, int(v) - half
        if not (0 <= r <= height - patch_size
                and 0 <= c <= width - patch_size):
            continue
        image = _rgb(image)
        patch = cv2.resize(image[r:r + patch_size, c:c + patch_size],
                           (zoom_size, zoom_size),
                           interpolation=cv2.INTER_NEAREST)

        frame = np.zeros((height, 2 * width, 3), np.uint8)
        frame[:, :width] = image
        frame[zoom_row:zoom_row + zoom_size,
              zoom_col:zoom_col + zoom_size] = patch
        white = (255, 255, 255)
        cv2.rectangle(frame, (c, r), (c + patch_size, r + patch_size),
                      white, 2)
        cv2.rectangle(frame, (zoom_col, zoom_row),
                      (zoom_col + zoom_size, zoom_row + zoom_size),
                      white, 2)
        cv2.line(frame, (c + patch_size, r), (zoom_col, zoom_row),
                 white, 2)
        cv2.line(frame, (c + patch_size, r + patch_size),
                 (zoom_col, zoom_row + zoom_size), white, 2)

        bgr = cv2.cvtColor(frame, cv2.COLOR_RGB2BGR)
        cv2.imwrite(os.path.join(frame_dir, f"frame_{out:04d}.png"), bgr)
        if writer is None:
            writer = cv2.VideoWriter(
                os.path.join(output_dir, "view_angle.mp4"),
                cv2.VideoWriter_fourcc(*"mp4v"), 10,
                (frame.shape[1], frame.shape[0]))
        writer.write(bgr)
        out += 1
    if writer is not None:
        writer.release()
    return out


def save_all_animations(output_dir: str, num_frames: int = 40):
    """Renders every lecture animation that needs no trained model.

    ``voxels_animation`` and ``view_angle_animation`` take an octree /
    trained model respectively and are invoked separately.
    """
    camera_to_world_animation(output_dir, num_frames)
    world_to_camera_animation(output_dir, num_frames)
    ray_cube_intersection_animation(output_dir, num_frames)
    rendering_equation_animation(output_dir, num_frames)
    volume_raycasting_animation(output_dir, num_frames)
