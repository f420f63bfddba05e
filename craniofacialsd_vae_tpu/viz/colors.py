"""Colormap utilities (reference utils.py:168-177 errors_to_colors)."""

from __future__ import annotations

import numpy as np

__all__ = ["errors_to_colors", "template_region_colors"]


def errors_to_colors(values: np.ndarray, min_value=None, max_value=None,
                     cmap: str = "plasma") -> np.ndarray:
    """Per-vertex scalar errors → RGB uint8 colors via a matplotlib
    colormap (reference utils.py:168-177)."""
    import matplotlib
    values = np.asarray(values, np.float64)
    lo = values.min() if min_value is None else min_value
    hi = values.max() if max_value is None else max_value
    if lo != hi:
        values = (values - lo) / (hi - lo)
    mapper = matplotlib.colormaps.get_cmap(cmap)
    rgba = mapper(values, bytes=True)
    return rgba[..., :3]


def template_region_colors(template) -> np.ndarray:
    """[N, 3] float colors from the template's vertex colors (for region
    visualizations)."""
    if template.colors is None:
        return np.full((template.num_vertices, 3), 0.5, np.float32)
    return template.colors[:, :3].astype(np.float32) / 255.0
