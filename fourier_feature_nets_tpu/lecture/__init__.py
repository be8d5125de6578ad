"""Lecture companion: educational figures and animations
(matplotlib/cv2 re-creations of the reference's scenepic lecture
material, built on the framework's own ops)."""

from .animations import save_all_animations
from .figures import save_all_figures

__all__ = ["save_all_animations", "save_all_figures"]
