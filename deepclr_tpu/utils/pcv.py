"""Point cloud visualization.

API-compatible replacement for the reference's VTK-based viewer
(/root/reference/deepclr/utils/pcv.py:134-200): add/update named clouds with
colors, optional ground plane, and render.  Backend is matplotlib 3D (VTK is
not part of the TPU image); ``spin`` shows an interactive window when a
display is available, ``save`` renders to file for headless use.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

__all__ = ["PointCloudVisualizer"]


class PointCloudVisualizer:
    """Simple multi-cloud 3D viewer."""

    def __init__(self, background: Tuple[float, float, float] = (1, 1, 1),
                 point_size: float = 1.0):
        import matplotlib.pyplot as plt

        self._plt = plt
        self._fig = plt.figure(figsize=(10, 8))
        self._ax = self._fig.add_subplot(111, projection="3d")
        self._fig.patch.set_facecolor(background)
        self._point_size = point_size
        self._clouds: Dict[str, dict] = {}
        self._ground_plane = None

    def add_cloud(self, name: str, points: np.ndarray,
                  color: Optional[Tuple[float, float, float]] = None,
                  point_size: Optional[float] = None) -> None:
        """Add or replace a named cloud ((N,3+) array)."""
        self._clouds[name] = {
            "points": np.asarray(points)[:, :3],
            "color": color,
            "size": point_size or self._point_size,
        }

    def update_cloud(self, name: str, points: np.ndarray) -> None:
        if name not in self._clouds:
            raise KeyError(name)
        self._clouds[name]["points"] = np.asarray(points)[:, :3]

    def remove_cloud(self, name: str) -> None:
        self._clouds.pop(name, None)

    def add_ground_plane(self, z: float = 0.0, size: float = 50.0) -> None:
        self._ground_plane = (z, size)

    def set_camera(self, elev: float = 30.0, azim: float = -60.0) -> None:
        self._ax.view_init(elev=elev, azim=azim)

    def _render(self) -> None:
        self._ax.clear()
        for name, c in self._clouds.items():
            pts = c["points"]
            self._ax.scatter(
                pts[:, 0], pts[:, 1], pts[:, 2],
                s=c["size"], c=[c["color"]] if c["color"] else None,
                label=name, depthshade=False,
            )
        if self._ground_plane is not None:
            z, size = self._ground_plane
            xx, yy = np.meshgrid(
                np.linspace(-size, size, 2), np.linspace(-size, size, 2)
            )
            self._ax.plot_surface(xx, yy, np.full_like(xx, z), alpha=0.1)
        self._ax.set_xlabel("x [m]")
        self._ax.set_ylabel("y [m]")
        self._ax.set_zlabel("z [m]")
        if self._clouds:
            self._ax.legend()

    def spin_once(self, pause: float = 0.01) -> None:
        """Render one frame (interactive backends only)."""
        self._render()
        self._plt.pause(pause)

    def spin(self) -> None:
        """Render and block until the window is closed."""
        self._render()
        self._plt.show()

    def save(self, filename: str) -> None:
        """Headless rendering to an image file."""
        self._render()
        self._fig.savefig(filename, bbox_inches="tight")

    def close(self) -> None:
        self._plt.close(self._fig)
