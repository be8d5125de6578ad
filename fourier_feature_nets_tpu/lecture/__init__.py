"""Lecture companion: educational figures and animations
(matplotlib/cv2 re-creations of the reference's scenepic lecture
material, built on the framework's own ops)."""

from .animations import (
    save_all_animations,
    view_angle_animation,
    voxels_animation,
)
from .figures import save_all_figures

__all__ = ["save_all_animations", "save_all_figures",
           "voxels_animation", "view_angle_animation"]
