"""Visualization export — replaces the reference's amrl/rviz plumbing.

The reference publishes VisualizationMsg point/line layers with fixed
colors and ±25 m offsets for the active/dynamic maps
(src/visualization/visualization.cc, dpg_slam_main.cc:117-159). Here
visualization is an EXPORT, not a middleware layer: matplotlib figures
(PNG) and plain dict/npz dumps a notebook or viewer can consume.
"""

from __future__ import annotations

import numpy as np

__all__ = ["render_session", "export_layers"]

# Layer colors follow the reference's scheme (dpg_slam_main.cc:139-156):
# grey full map; active static blue-ish; added green; removed red.
_COLORS = {
    "map": "#888888",
    "trajectory": "#1f77b4",
    "odometry": "#ff7f0e",
    "active_static": "#17becf",
    "active_added": "#2ca02c",
    "dynamic_added": "#98df8a",
    "dynamic_removed": "#d62728",
}


def export_layers(engine) -> dict[str, np.ndarray]:
    """All drawable layers as host arrays (points (P, 2) / poses (N, 3))."""
    layers = {
        "map": engine.map_points(),
        "trajectory": engine.trajectory(),
        "odometry": engine.odom_trajectory(),
    }
    layers.update(engine.map_layers())
    return layers


def render_session(
    engine,
    out_path: str,
    *,
    show_dynamic: bool = True,
    dpi: int = 120,
) -> str:
    """Render the session to a PNG: full map + trajectories, and (if DPG
    ran) the active/dynamic layers side by side like the reference's
    offset displays — but as subplots, not coordinate offsets."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    layers = export_layers(engine)
    n_panels = 2 if show_dynamic else 1
    fig, axes = plt.subplots(1, n_panels, figsize=(8 * n_panels, 7), squeeze=False)
    axes = axes[0]

    ax = axes[0]
    m = layers["map"]
    if len(m):
        ax.scatter(m[:, 0], m[:, 1], s=1, c=_COLORS["map"], label="map")
    tr = layers["trajectory"]
    if len(tr):
        ax.plot(tr[:, 0], tr[:, 1], "-", c=_COLORS["trajectory"], lw=1.5, label="slam")
    od = layers["odometry"]
    if len(od):
        ax.plot(od[:, 0], od[:, 1], ":", c=_COLORS["odometry"], lw=1, label="odometry")
    ax.set_title("map + trajectory")
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)

    if show_dynamic:
        ax = axes[1]
        for name in ("active_static", "active_added", "dynamic_added", "dynamic_removed"):
            pts = layers.get(name)
            if pts is not None and len(pts):
                ax.scatter(pts[:, 0], pts[:, 1], s=2, c=_COLORS[name], label=name)
        ax.set_title("DPG layers")
        ax.set_aspect("equal")
        ax.legend(loc="upper right", fontsize=8)

    fig.tight_layout()
    fig.savefig(out_path, dpi=dpi)
    plt.close(fig)
    return out_path
