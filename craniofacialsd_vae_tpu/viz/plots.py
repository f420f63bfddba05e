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


def load_pickled_figure(path):
    """Unpickle a matplotlib figure/FacetGrid, tolerating figures pickled
    by older matplotlib versions (the reference's shipped
    lda_emb_distributions.pkl / emb_all_train_dist.pkl predate the
    CallbackRegistry '_cid_gen' state key)."""
    import pickle

    from matplotlib import cbook

    orig_cr = cbook.CallbackRegistry.__setstate__
    orig_gr = cbook.Grouper.__setstate__

    def tolerant_cr(self, state):
        state.setdefault("_cid_gen", 0)
        state.pop("_func_cid_map", None)
        state.pop("exception_handler", None)
        try:
            orig_cr(self, state)
        except Exception:
            # last resort: a fresh registry (overlays don't need callbacks)
            cbook.CallbackRegistry.__init__(self)

    def tolerant_gr(self, state):
        state.setdefault("_ordering", {})
        state.setdefault("_next_order", len(state["_ordering"]))
        try:
            orig_gr(self, state)
        except Exception:
            cbook.Grouper.__init__(self)

    from matplotlib import figure as mfigure
    from matplotlib.axes import _base as axes_base

    orig_st = mfigure._AxesStack.__setstate__

    def tolerant_st(self, state):
        if "_axes" not in state and "_elements" in state:
            # pre-3.6 stack: _elements = [(ind, axes), ...]
            state = {"_axes": {ax: i for i, ax in state["_elements"]}}
        state.setdefault("_counter", len(state.get("_axes", {})))
        orig_st(self, dict(state))

    orig_ax = axes_base._AxesBase.__setstate__

    def tolerant_ax(self, state):
        # pre-3.7 pickles carry _shared_x_axes/_shared_y_axes Groupers
        # instead of the _shared_axes/_twinned_axes state keys
        state.setdefault("_shared_axes", {})
        state.setdefault("_twinned_axes", None)
        for legacy in ("_shared_x_axes", "_shared_y_axes"):
            state.pop(legacy, None)
        orig_ax(self, state)

    def _subplot_ctor(axes_class=None):
        # pre-3.7 pickles construct AxesSubplot through this factory
        from matplotlib.axes import Axes
        return Axes.__new__(Axes)

    try:    # pandas' own compat unpickler knows the old-Index remaps
        from pandas.compat.pickle_compat import Unpickler as _BaseUnpickler
    except Exception:
        _BaseUnpickler = pickle.Unpickler

    class _CompatUnpickler(_BaseUnpickler):
        _REMAP = {
            ("matplotlib.axes._subplots", "AxesSubplot"):
                ("matplotlib.axes", "Axes"),
            ("matplotlib.axes._subplots", "Subplot"):
                ("matplotlib.axes", "Axes"),
            ("matplotlib.axes._subplots",
             "_picklable_subplot_class_constructor"): _subplot_ctor,
        }

        def find_class(self, module, name):
            hit = self._REMAP.get((module, name))
            if hit is not None:
                if callable(hit) and not isinstance(hit, tuple):
                    return hit
                module, name = hit
            return super().find_class(module, name)

    def _fixup_axes(obj):
        """Repair attribute renames on unpickled axes (old 'converter' /
        'units' instance attrs became '_converter' / '_units')."""
        figs = []
        od = vars(obj) if hasattr(obj, "__dict__") else {}
        for legacy in ("fig", "_fig"):            # seaborn < 0.12 FacetGrid
            if "_figure" not in od and legacy in od:
                obj._figure = od[legacy]
        if isinstance(obj, mfigure.Figure):
            figs.append(obj)
        elif hasattr(obj, "fig"):                     # seaborn FacetGrid
            figs.append(obj.fig)
        from matplotlib.axes._base import _process_plot_var_args
        import matplotlib.axis as maxis
        import matplotlib.patches as mpatches

        # class-level defaults: instances unpickled from old matplotlib
        # fall back to these when the attribute is missing; new instances
        # always set them in __init__, so this is inert otherwise
        mpatches.Rectangle._rotation_point = "xy"        # mpl 3.6
        mpatches.Rectangle._aspect_ratio_correction = 1.0
        mpatches.Patch._dash_pattern = (0, None)         # mpl 3.6 rename
        from matplotlib.collections import Collection as _Coll
        from matplotlib.lines import Line2D as _L2D
        _Coll._gapcolor = None                           # mpl 3.8
        _L2D._gapcolor = None
        # backstop for Line2D instances the artist walk cannot reach
        # (e.g. created lazily at draw time from legend handler state):
        # solid-line defaults, the mpl 3.6 rename of _dashSeq/_dashOffset
        _L2D._unscaled_dash_pattern = (0, None)
        _L2D._dash_pattern = (0, None)
        import matplotlib.text as mtext
        mtext.Text._parse_math = True                    # mpl 3.6
        mtext.Text._antialiased = True                   # mpl 3.7
        import matplotlib.markers as mmarkers
        mmarkers.MarkerStyle._user_transform = None      # mpl 3.6
        mmarkers.MarkerStyle._user_capstyle = None
        mmarkers.MarkerStyle._user_joinstyle = None
        maxis.Axis._converter = None                     # mpl 3.10 rename
        maxis.Axis._converter_is_explicit = False
        maxis.Axis._units = None
        maxis.Axis._autoscale_on = True                  # mpl 3.6 move
        maxis.Axis._tick_space = None
        mfigure.Figure._layout_engine = None             # mpl 3.6

        def _walk(artist):
            yield artist
            try:
                kids = artist.get_children()
            except Exception:
                kids = []
            for k in kids:
                yield from _walk(k)

        for fig in figs:
            fd = vars(fig)
            if not isinstance(fd.get("_localaxes"), list):
                fig._localaxes = list(fig.axes)   # mpl 3.5 kept a stack
            fd.setdefault("subfigs", [])
            fd.setdefault("_root_figure", fig)    # mpl 3.10
            fd.setdefault("_parent_figure", None)
            from matplotlib.cbook import Grouper as _Grouper
            groups = fd.get("_align_label_groups")
            if not isinstance(groups, dict) or "title" not in groups:
                fig._align_label_groups = {
                    "x": _Grouper(), "y": _Grouper(), "title": _Grouper()}
            for ax in fig.axes:
                # pre-3.8 pickles carry prop-cycler state the new
                # _process_plot_var_args can't use; rebuild fresh ones
                if "_cycler_items" not in vars(
                        vars(ax).get("_get_lines", object()) or object()):
                    ax._get_lines = _process_plot_var_args()
                    ax._get_patches_for_fill = \
                        _process_plot_var_args('Polygon')
                d = vars(ax)
                if "_stale_viewlims" not in d:   # pre-3.9 per-axis flags
                    ax._stale_viewlims = {
                        "x": d.get("_stale_viewlim_x", False),
                        "y": d.get("_stale_viewlim_y", False)}
                if "_children" not in d:
                    # pre-3.5 axes keep artists in per-type lists
                    kids = []
                    for key in ("artists", "patches", "lines", "texts",
                                "tables", "images", "collections",
                                "containers"):
                        val = d.get(key)
                        if isinstance(val, (list, tuple)):
                            kids.extend(val)
                    ax._children = kids
                for axis in (ax.xaxis, ax.yaxis):
                    d = vars(axis)
                    if "_converter" not in d:
                        axis._converter = d.get("converter", None)
                    if "_converter_is_explicit" not in d:
                        axis._converter_is_explicit = False
                    if "_units" not in d:
                        axis._units = d.get("units", None)
            # walk the (now reachable) artist tree for per-artist renames
            from matplotlib.collections import Collection
            from matplotlib.lines import Line2D
            for root in [fig] + list(fig.axes):
                for art in _walk(root):
                    d = vars(art)
                    if "_parent_figure" not in d:  # pre-3.10 'figure' attr
                        art._parent_figure = d.get("figure", fig)
                    if isinstance(art, Collection) \
                            and "_offset_transform" not in d:
                        art._offset_transform = d.get("_transOffset")
                    if isinstance(art, Line2D):
                        legacy = (d.get("_dashOffset", 0),
                                  d.get("_dashSeq"))
                        if "_dash_pattern" not in d:
                            art._dash_pattern = legacy
                        if "_unscaled_dash_pattern" not in d:
                            # mpl 3.6 keeps both the lw-scaled and the
                            # unscaled pattern; old pickles have neither
                            art._unscaled_dash_pattern = \
                                d.get("_dash_pattern", legacy)
                    import matplotlib.text as mtext
                    if isinstance(art, mtext.Text):
                        rot = d.get("_rotation", 0)
                        if rot is None:
                            art._rotation = 0.
                        elif isinstance(rot, str):   # 'horizontal'/'vertical'
                            art._rotation = 90. if rot == "vertical" else 0.
        return obj

    cbook.CallbackRegistry.__setstate__ = tolerant_cr
    cbook.Grouper.__setstate__ = tolerant_gr
    axes_base._AxesBase.__setstate__ = tolerant_ax
    mfigure._AxesStack.__setstate__ = tolerant_st
    try:
        with open(path, "rb") as f:
            return _fixup_axes(_CompatUnpickler(f).load())
    finally:
        cbook.CallbackRegistry.__setstate__ = orig_cr
        cbook.Grouper.__setstate__ = orig_gr
        axes_base._AxesBase.__setstate__ = orig_ax
        mfigure._AxesStack.__setstate__ = orig_st
