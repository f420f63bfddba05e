"""Plotting helpers (reference utils.py:270-317 analogs): alpha colormaps,
Gaussian ellipses, 2D arrows, eigenvector coloring, confusion matrices."""

from __future__ import annotations

import numpy as np

__all__ = ["create_alpha_cmap", "gaussian_ellipse", "plot_2d_arrow",
           "per_vertex_eigenvector_color", "plot_confusion_matrix"]


def create_alpha_cmap(base_color_name):
    """White→color colormap with a transparent ramp-in (reference
    utils.py:277-284), for layered KDE shading."""
    from matplotlib.colors import ListedColormap, to_rgba_array

    vals = np.ones((256, 4))
    base = to_rgba_array(base_color_name)
    for c in range(3):
        vals[:, c] = np.linspace(1, base[0, c], 256)
    vals[:10, 3] = np.linspace(0, 1, 10)
    return ListedColormap(vals)


def gaussian_ellipse(mean, covariance, color, n_sigma: int = 3):
    """matplotlib Ellipse patch for a 2D Gaussian at n_sigma (reference
    utils.py:287-295)."""
    from matplotlib.patches import Ellipse
    from scipy.linalg import eigh, norm

    v, w = eigh(covariance)
    u = w[0] / norm(w[0])
    angle = 180 * np.arctan2(u[1], u[0]) / np.pi
    ell = Ellipse(mean, n_sigma * v[0] ** 0.5, n_sigma * v[1] ** 0.5,
                  angle=180 + angle, facecolor=color, edgecolor=color,
                  linewidth=2)
    ell.set_alpha(0.2)
    return ell


def plot_2d_arrow(tail_coords, head_coords, ax, color: str = "#e881a7",
                  scale: int = 15):
    """FancyArrow between two embedding points (reference utils.py:311-317)
    — used for pre/post-op latent displacement overlays."""
    from matplotlib.patches import FancyArrowPatch

    arrow = FancyArrowPatch(np.squeeze(tail_coords),
                            np.squeeze(head_coords),
                            color=color, arrowstyle="-|>",
                            mutation_scale=scale)
    ax.add_patch(arrow)
    return arrow


def per_vertex_eigenvector_color(eigvecs: np.ndarray,
                                 eigenvec_n: int) -> np.ndarray:
    """Vertex colors from one Laplacian eigenvector (reference
    utils.py:270-274)."""
    import matplotlib
    from matplotlib.colors import Normalize

    e = eigvecs[:, eigenvec_n]
    cmap = matplotlib.colormaps.get_cmap("bwr")
    return cmap(Normalize(vmin=e.min(), vmax=e.max())(e))


def plot_confusion_matrix(data, labels, output_filename):
    """Heatmap SVG (reference utils.py:298-308)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    sns.set(color_codes=True)
    plt.figure()
    ax = sns.heatmap(data, annot=True, cmap="YlGnBu", vmin=0.0, vmax=1.0)
    ax.set_xticklabels(labels)
    ax.set_yticklabels(labels)
    ax.set(ylabel="True Label", xlabel="Predicted Label")
    plt.savefig(output_filename, bbox_inches="tight", dpi=300)
    plt.close()
