"""Evaluation / analysis harness — the reference's 1,500-line Tester
(test.py:35-1440) rebuilt on the TPU-native stack.

Produces the same artifact families into outputs/<id>/:
  * eval_metrics.json — reconstruction mm errors + diversity metrics
  * accuracies.json / classification_report[_regions].json / confusion
    matrix SVGs (global and per-region)
  * latent traversal videos/images + per-region displacement plots
  * LDA / t-SNE embedding scatter + KDE plots (figures pickled for later
    overlay, exactly like the reference workflow)
  * surgical planning interpolations (all-attributes + per-procedure) with
    renders, embedding trajectories, PLY exports
  * pre/post surgery assessment metrics + boxplots
  * mesh fitting of unregistered scans (Procrustes + Adam over z with a
    JAX chamfer distance)

Heavy math (decode, render, chamfer) runs jitted on TPU; matplotlib/seaborn
artifact generation stays on the host.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from ..analysis.classifiers import QDAClassifier
from ..geometry.mesh_io import read_mesh, write_ply
from ..geometry.template import COLOUR2ATTRIBUTE, PROCEDURES2ATTRIBUTES
from ..viz.renderer import make_image_grid

__all__ = ["Tester", "compute_latent_stats", "reconstruction_errors",
           "compute_diversity", "random_generation"]

# 20 hand-picked facial landmark vertex ids on the craniofacial template
# (reference test.py:52-55) — a property of the template asset.
TEMPLATE_LANDMARKS_IDX = [14336, 14250, 13087, 13145, 4134,
                          871, 4166, 303, 15614, 7166,
                          3904, 16465, 9246, 4643, 10122,
                          4548, 2893, 2985, 830, 2004]


# vector_linspace lives in analysis/planning.py (the pure latent-math
# module shared with the serving path); re-exported here for the
# historical import path.
from .planning import vector_linspace  # noqa: E402,F401


def compute_latent_stats(manager, output_dir: str, train_iter=None,
                         cache: bool = True, transient: bool = False
                         ) -> dict:
    """Per-dim mean/std/min/max over train latents, cached z_stats.npz
    (reference test.py:95-117).

    transient=True computes stats for the CURRENT model state with zero
    persistent side effects: no z_stats.npz read/write, no
    manager._train_latents fill, and a dataset-order pass that does not
    consume the iterator's shuffle RNG — required for mid-training
    snapshots, where any cached artifact would be served stale to the
    end-of-training evaluation and any RNG draw would shift subsequent
    epoch plans."""
    path = os.path.join(output_dir, "z_stats.npz")
    if transient:
        if train_iter is None:
            raise ValueError("transient stats need train_iter")
        batches = (train_iter.ordered_batches()
                   if hasattr(train_iter, "ordered_batches")
                   else train_iter)
        latents, _ = manager.encode_all(batches, is_train_loader=False)
    else:
        if cache and os.path.exists(path):
            z = np.load(path)
            return {k: z[k] for k in ("means", "stds", "mins", "maxs")}
        # reference-run directories cache the same stats as z_stats.pkl
        # (pickled torch tensors, reference test.py:95-117) — consume them
        # in place when migrating a run. Like the reference's own cache,
        # the pkl is never invalidated: it reflects the model state at the
        # time it was written, so warn loudly (continued training makes it
        # stale — delete it to recompute).
        ref_pkl = os.path.join(output_dir, "z_stats.pkl")
        if cache and os.path.exists(ref_pkl):
            import pickle
            with open(ref_pkl, "rb") as f:
                ref = pickle.load(f)
            print(f"[tester] using migrated latent stats from {ref_pkl} — "
                  "these reflect the model that wrote them; delete the "
                  "file to recompute for the current weights")
            return {k: np.asarray(ref[k], dtype=np.float32)
                    for k in ("means", "stds", "mins", "maxs")}
        latents, _ = manager.train_latents_and_labels
        if latents is None:
            if train_iter is None:
                raise ValueError("no cached train latents; pass train_iter")
            latents, _ = manager.encode_all(train_iter,
                                            is_train_loader=True)
    stats = {"means": latents.mean(axis=0),
             "stds": latents.std(axis=0, ddof=1),
             "mins": latents.min(axis=0),
             "maxs": latents.max(axis=0)}
    if not transient and cache:
        os.makedirs(output_dir, exist_ok=True)
        np.savez(path, **stats)
    return stats


def reconstruction_errors(manager, data_iter, normalization: dict) -> dict:
    """Per-mesh mean vertex error in mm; stats over meshes
    (reference test.py:280-301)."""
    mean = np.asarray(normalization["mean"])
    std = np.asarray(normalization["std"])
    per_mesh = []
    for batch in data_iter:
        x = batch["x"]
        out = np.asarray(manager.forward(x, training=False)[0])
        gt = x * std + mean
        pred = out * std + mean
        err = np.asarray(manager.compute_vertex_errors(pred, gt))
        per_mesh.append(err.mean(axis=1))
    e = np.concatenate(per_mesh)
    return {"mean": float(e.mean()), "median": float(np.median(e)),
            "max": float(e.max()), "std": float(e.std(ddof=1))}


def compute_diversity(meshes_a: np.ndarray, meshes_b: np.ndarray,
                      to_mm: float = 1.0) -> float:
    """Mean per-vertex distance between two matched mesh sets."""
    d = np.linalg.norm(meshes_a - meshes_b, axis=-1) * to_mm
    return float(d.mean())


def random_generation(manager, z_stats, n_samples=16, seed=0,
                      z_range_multiplier=1.0):
    rng = np.random.default_rng(seed)
    if manager.is_vae:
        z = rng.standard_normal((n_samples, manager.model_latent_size))
    else:
        lo = z_stats["mins"] * z_range_multiplier
        hi = z_stats["maxs"] * z_range_multiplier
        z = rng.uniform(size=(n_samples, len(lo))) * (hi - lo) + lo
    return np.asarray(manager.generate(z.astype(np.float32)))


class Tester:
    """Standard evaluation suite runner (reference test.py:57-79)."""

    def __init__(self, manager, norm_dict, train_iter, test_iter,
                 out_dir: str, config: dict, lazy_stats: bool = False):
        """With lazy_stats=True the train-latent statistics are computed
        on first use instead of at construction. The reference Tester
        always encodes the full train set at init and pickles the result
        (test.py:48, 95-117) — which, when the Tester is built *before*
        training (as train.py does for the in-training traversal cadence),
        caches untrained-model stats that the end-of-training
        compute_latent_stats then reloads stale. Deferring fixes that while
        keeping the same workflow: in-training traversals run with
        use_z_stats=False and never touch the stats."""
        self._manager = manager
        self._norm = {k: np.asarray(v) for k, v in norm_dict.items()}
        self._normalized = config["data"].get("normalize_data", True)
        self._out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self._config = config
        self._train_iter = train_iter
        self._test_iter = test_iter
        self._is_vae = manager.is_vae
        self._latent_stats = None if lazy_stats else \
            compute_latent_stats(manager, out_dir, train_iter)
        self.template_landmarks_idx = list(TEMPLATE_LANDMARKS_IDX)
        self._image_size = 256
        self._background = 0.0

    @property
    def latent_stats(self) -> dict:
        if self._latent_stats is None:
            self._latent_stats = compute_latent_stats(
                self._manager, self._out_dir, self._train_iter)
        return self._latent_stats

    # ------------------------------------------------------------------
    def __call__(self):
        self.set_renderings_size(256)
        self.set_rendering_background_color(1.0)
        self.latent_traversals(use_z_stats=False)
        self.plot_embeddings()
        self.random_generation_and_rendering(n_samples=16)
        self.random_generation_and_save(n_samples=16)
        self.test_classifiers()
        metrics = {
            "recon_errors": reconstruction_errors(
                self._manager, self._test_iter, self._norm),
            "train_set_diversity": self.compute_diversity_train_set(),
            "diversity": self.compute_diversity(),
        }
        with open(os.path.join(self._out_dir, "eval_metrics.json"),
                  "w") as f:
            json.dump(metrics, f)
        return metrics

    # ------------------------------------------------------------------
    def _unnormalize(self, verts: np.ndarray) -> np.ndarray:
        if not self._normalized:
            return verts
        return verts * self._norm["std"] + self._norm["mean"]

    def _normalize(self, verts: np.ndarray) -> np.ndarray:
        if not self._normalized:
            return verts
        return (verts - self._norm["mean"]) / self._norm["std"]

    def set_renderings_size(self, size: int):
        self._image_size = size

    def set_rendering_background_color(self, color=1.0):
        """Grayscale background level (reference sets white for the
        standard suite, test.py:59-60, 89-93)."""
        self._background = float(color if not isinstance(color, (list,
                                 tuple)) else color[0])

    def _render(self, verts, errors=None, error_max_scale=None):
        return self._manager.render(verts, errors, error_max_scale,
                                    image_size=self._image_size,
                                    background=self._background)

    def save_batch(self, batch_verts, out_dir, v_colours=None):
        os.makedirs(out_dir, exist_ok=True)
        for i, v in enumerate(np.asarray(batch_verts)):
            vc = None if v_colours is None else np.asarray(v_colours[i])
            write_ply(os.path.join(out_dir, f"{i}.ply"), v,
                      self._manager.template.face, vc)

    @staticmethod
    def _write_video(path, frames, fps=4):
        """[T, H, W, 3] float frames → mp4 when an ffmpeg backend exists,
        else a self-contained Motion-JPEG AVI (viz/video.py — real video,
        no external encoder needed), then GIF, then a PNG strip."""
        import imageio.v2 as imageio

        frames8 = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
        try:
            imageio.mimwrite(path, frames8, fps=fps)
            return
        except Exception:
            pass
        try:
            from ..viz.video import write_mjpeg_avi

            avi = path.rsplit(".", 1)[0] + ".avi"
            write_mjpeg_avi(avi, frames8, fps=fps)
            return
        except Exception:
            pass
        try:
            gif = path.rsplit(".", 1)[0] + ".gif"
            imageio.mimwrite(gif, frames8, duration=1000.0 / fps, loop=0)
            return
        except Exception as e:
            alt = path.rsplit(".", 1)[0] + "_strip.png"
            imageio.imwrite(alt, np.concatenate(list(frames8), axis=1))
            print(f"[tester] video backends unavailable ({e}); wrote {alt}")

    @staticmethod
    def _save_image(path, image):
        import imageio.v2 as imageio
        imageio.imwrite(path, (np.clip(image, 0, 1) * 255).astype(np.uint8))

    @staticmethod
    def string_to_color(rgba_string, swap_bw=True):
        vals = [int(c) / 255 for c in rgba_string[1:-1].split()[:-1]]
        if vals == [1.0, 1.0, 1.0] and swap_bw:
            vals = [0.0, 0.0, 0.0]
        return tuple(vals)

    # ------------------------------------------------------------------
    # latent traversals (reference test.py:128-229)
    def latent_traversals(self, z_range_multiplier=1.0, use_z_stats=True,
                          save_suffix=None, n_steps=10,
                          render_videos=True):
        latent_size = self._manager.model_latent_size
        if self._is_vae and not use_z_stats:
            z_means = np.zeros(latent_size, np.float32)
            z_mins = -3 * z_range_multiplier * np.ones(latent_size)
            z_maxs = 3 * z_range_multiplier * np.ones(latent_size)
        else:
            # non-VAE traversals always need data-derived ranges. For the
            # mid-training cadence (use_z_stats=False, e.g. body.yaml AE
            # runs) compute them transiently: going through
            # self.latent_stats here would cache half-trained-model stats
            # (z_stats.npz + manager._train_latents) that the final
            # evaluation then reloads stale, and would consume a shuffle
            # draw from the train iterator, shifting later epoch plans.
            if not use_z_stats and self._latent_stats is None:
                stats = compute_latent_stats(
                    self._manager, self._out_dir, self._train_iter,
                    transient=True)
            else:
                stats = self.latent_stats
            z_means = np.asarray(stats["means"])
            z_mins = np.asarray(stats["mins"]) * z_range_multiplier
            z_maxs = np.asarray(stats["maxs"]) * z_range_multiplier

        s = save_suffix if save_suffix is not None else ""
        # batched decode over dims in chunks (per-dim generate calls each
        # pay a device fetch round-trip, ~1.3 s through the tunnel — 75 of
        # them dominated the traversal sweep; a single 750-mesh decode
        # exhausts HBM at full resolution, so chunk to ~80 meshes)
        z_all = np.tile(z_means,
                        (latent_size, n_steps, 1)).astype(np.float32)
        for i in range(latent_size):
            z_all[i, :, i] = np.linspace(z_mins[i], z_maxs[i], n_steps)
        # largest divisor of latent_size within the memory budget keeps
        # every decode the same shape (one compile); when a single dim's
        # n_steps already exceeds the ~80-mesh budget, chunk along the
        # step axis instead so no decode ever exceeds it
        flat = z_all.reshape(-1, latent_size)           # [Z·steps, Z]
        cap = max(80 // n_steps, 1)
        dims_per_chunk = max(
            [d for d in range(1, cap + 1) if latent_size % d == 0])
        rows = dims_per_chunk * n_steps if n_steps <= 80 else 80
        chunks = []
        for s0 in range(0, len(flat), rows):
            zc = flat[s0:s0 + rows]
            chunks.append(np.asarray(self._manager.generate(zc)))
        gen_all = np.concatenate(chunks).reshape(
            latent_size, n_steps, -1, 3)

        all_frames, all_diff_renders, max_distances = [], [], []
        for i in range(latent_size):
            gen = self._unnormalize(gen_all[i])
            diffs = np.asarray(self._manager.compute_vertex_errors(
                gen, np.broadcast_to(gen[0], gen.shape)))
            max_distances.append(diffs[-1])
            if render_videos:
                renders = self._render(gen)
                diff_renders = self._render(gen, diffs, 5)
                all_diff_renders.append(diff_renders)
                frames = np.concatenate([renders, diff_renders], axis=2)
                black = np.zeros_like(frames[:2])
                all_frames.append(np.concatenate([frames, black]))

        if render_videos:
            self._write_video(
                os.path.join(self._out_dir, f"latent_exploration{s}.mp4"),
                np.concatenate(all_frames), fps=4)
            # tiled grid video over traversal steps
            n_regions = max(len(self._manager.latent_regions), 1)
            nrow = latent_size // n_regions \
                if self._config["data"].get("swap_features") else 8
            stacked = np.stack(all_diff_renders)       # [Z, steps, H, W, 3]
            grid_frames = [make_image_grid(stacked[:, t], nrow=nrow)
                           for t in range(stacked.shape[1])]
            self._save_image(
                os.path.join(self._out_dir,
                             f"latent_exploration_tiled{s}.png"),
                grid_frames[-1])
            self._write_video(
                os.path.join(self._out_dir,
                             f"latent_exploration_tiled{s}.mp4"),
                np.stack(grid_frames), fps=1)

        # per-region displacement line plots
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            import pandas as pd
            import seaborn as sns

            rows = []
            for zi, dist in enumerate(max_distances):
                for region, idxs in \
                        self._manager.template.feat_and_cont.items():
                    rows.append({
                        "mean_dist": float(
                            dist[np.asarray(idxs["feature"])].mean()),
                        "z_var": zi,
                        "region": region})
            df = pd.DataFrame(rows)
            palette = {k: self.string_to_color(k)
                       for k in self._manager.template.feat_and_cont}
            sns.set_theme(style="ticks")
            grid = sns.FacetGrid(df, col="region", hue="region",
                                 palette=palette, col_wrap=4, height=3)
            grid.map(plt.plot, "z_var", "mean_dist", marker="o")
            plt.savefig(os.path.join(
                self._out_dir, f"latent_exploration_split{s}.svg"))
            plt.close("all")
            sns.relplot(data=df, kind="line", x="z_var", y="mean_dist",
                        hue="region", palette=palette)
            plt.savefig(os.path.join(self._out_dir,
                                     f"latent_exploration{s}.svg"))
            plt.close("all")
        except Exception as e:
            print(f"[tester] traversal plots skipped: {e}")
        return max_distances

    # ------------------------------------------------------------------
    # generation (reference test.py:231-266)
    def random_latent(self, n_samples, z_range_multiplier=1.0, seed=0):
        rng = np.random.default_rng(seed)
        if self._is_vae:
            return rng.standard_normal(
                (n_samples, self._manager.model_latent_size)) \
                .astype(np.float32)
        lo = np.asarray(self.latent_stats["mins"]) * z_range_multiplier
        hi = np.asarray(self.latent_stats["maxs"]) * z_range_multiplier
        u = rng.uniform(size=(n_samples, len(lo)))
        return (u * (hi - lo) + lo).astype(np.float32)

    def random_generation(self, n_samples=16, z_range_multiplier=1.0,
                          denormalize=True, seed=0):
        z = self.random_latent(n_samples, z_range_multiplier, seed)
        gen = np.asarray(self._manager.generate(z))
        return self._unnormalize(gen) if denormalize else gen

    def random_generation_and_rendering(self, n_samples=16,
                                        z_range_multiplier=1.0):
        gen = self.random_generation(n_samples, z_range_multiplier)
        grid = make_image_grid(self._render(gen), nrow=4)
        self._save_image(os.path.join(self._out_dir,
                                      "random_generation.png"), grid)

    def random_generation_and_save(self, n_samples=16,
                                   z_range_multiplier=1.0):
        gen = self.random_generation(n_samples, z_range_multiplier)
        self.save_batch(gen, os.path.join(self._out_dir, "random_meshes"))

    # ------------------------------------------------------------------
    # quantitative (reference test.py:280-334)
    def reconstruction_errors(self, data_iter=None):
        return reconstruction_errors(
            self._manager, data_iter or self._test_iter, self._norm)

    def compute_diversity_train_set(self) -> float:
        prev = None
        dists = []
        for batch in self._train_iter:
            cur = self._unnormalize(batch["x"])
            if prev is not None:
                n = min(len(prev), len(cur))
                d = np.asarray(self._manager.compute_vertex_errors(
                    prev[:n], cur[:n]))
                dists.append(d.mean(axis=1))
            prev = cur
        return float(np.concatenate(dists).mean()) if dists else 0.0

    def compute_diversity(self, n_samples=10000, batch=100) -> float:
        """Mean vertex distance between pairs of independently generated
        meshes (reference test.py:325-334; batched larger here to amortize
        dispatch — 10k samples in 50 device calls instead of 500)."""
        dists = []
        for i in range(n_samples // (2 * batch)):
            a = self.random_generation(batch, seed=2 * i)
            b = self.random_generation(batch, seed=2 * i + 1)
            d = np.asarray(self._manager.compute_vertex_errors(a, b))
            dists.append(d.mean(axis=1))
        return float(np.concatenate(dists).mean()) if dists else 0.0

    # ------------------------------------------------------------------
    # embeddings (reference test.py:1160-1321)
    def plot_embeddings(self, embedding_mode="lda"):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import pandas as pd
        import pickle
        import seaborn as sns

        mgr = self._manager
        tr_z, tr_l = mgr.train_latents_and_labels
        if tr_z is None:
            tr_z, tr_l = mgr.encode_all(self._train_iter, True)
        ts_z, ts_l = mgr.encode_all(self._test_iter, False)
        tr_y = np.asarray(mgr.class2idx(tr_l["y"]))
        ts_y = np.asarray(mgr.class2idx(ts_l["y"]))

        if embedding_mode == "lda":
            emb = np.concatenate([mgr.lda_project_latents_in_2d(tr_z),
                                  mgr.lda_project_latents_in_2d(ts_z)])
        elif embedding_mode == "tsne":
            from sklearn.manifold import TSNE
            emb = TSNE(n_components=2, init="random").fit_transform(
                np.concatenate([tr_z, ts_z]))
        else:
            raise NotImplementedError(embedding_mode)

        df = pd.DataFrame({
            "x1": emb[:, 0], "x2": emb[:, 1],
            "class": mgr.idx2class(np.concatenate([tr_y, ts_y])),
            "type": ["train"] * len(tr_y) + ["test"] * len(ts_y),
            "aug": np.concatenate([np.asarray(tr_l["augmented"]),
                                   np.asarray(ts_l["augmented"])]),
            "gender": tr_l["gender"] + ts_l["gender"],
            "age": np.concatenate([np.asarray(tr_l["age"]),
                                   np.asarray(ts_l["age"])]),
        })

        colours = ["#ed6e5d", "#74bfc2", "#eecd4a", "#124d81"]
        hue_order = [c for c in ["n", "a", "c", "m"]
                     if c in set(df["class"])]
        palette = dict(zip(["n", "a", "c", "m"], colours))
        sns.set_theme(style="ticks")

        plt.figure()
        sns.scatterplot(data=df, x="x1", y="x2", hue="class", style="type",
                        hue_order=hue_order, palette=palette)
        plt.savefig(os.path.join(
            self._out_dir, f"{embedding_mode}_emb_train_vs_test.svg"))
        plt.close()

        plt.figure()
        sns.scatterplot(data=df[df["type"] == "train"], x="x1", y="x2",
                        hue="class", style="aug", hue_order=hue_order,
                        palette=palette)
        plt.savefig(os.path.join(
            self._out_dir, f"{embedding_mode}_emb_real_vs_aug.svg"))
        plt.close()

        # KDE distribution figure, pickled for later overlays
        fig_handle = plt.figure()
        real_train = df[(df["type"] == "train") & (~df["aug"])]
        for c in hue_order:
            sub = real_train[real_train["class"] == c]
            if len(sub) >= 5:
                try:
                    sns.kdeplot(data=sub, x="x1", y="x2", fill=True,
                                levels=5, alpha=0.5, color=palette[c])
                except Exception:
                    pass
            plt.scatter(sub["x1"], sub["x2"], s=6, color=palette[c],
                        label=c)
        plt.legend()
        fig_name = os.path.join(self._out_dir,
                                f"{embedding_mode}_emb_distributions")
        with open(fig_name + ".pkl", "wb") as f:
            pickle.dump(fig_handle, f)
        plt.savefig(fig_name + ".svg")
        plt.close("all")

        self.plot_embeddings_per_region(tr_z, tr_y, tr_l)

    def plot_embeddings_per_region(self, tr_z, tr_y, tr_l):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import pandas as pd
        import pickle
        import seaborn as sns

        mgr = self._manager
        zoo = mgr.classifiers
        if zoo is None or not zoo.region_ldas:
            print("[tester] region LDAs unavailable; skipping region plots")
            return
        dfs = []
        aug = np.asarray(tr_l["augmented"])
        for key, (lo, hi) in mgr.latent_regions.items():
            if hi - lo > 2:
                emb = zoo.region_ldas[key].transform_sklearn_style(
                    tr_z[:, lo:hi]) if hasattr(
                        zoo.region_ldas[key], "_sklearn_transform") \
                    else zoo.region_ldas[key].transform(tr_z[:, lo:hi])
                x1, x2 = emb[:, 0], emb[:, 1]
            else:
                x1, x2 = tr_z[:, lo], tr_z[:, hi - 1]
            dfs.append(pd.DataFrame({
                "x1": x1, "x2": x2,
                "class": mgr.idx2class(tr_y),
                "aug": aug,
                "region": [COLOUR2ATTRIBUTE.get(key, key)] * len(tr_y)}))
        df = pd.concat(dfs)
        df = df[~df["aug"]]

        colours = ["#ed6e5d", "#74bfc2", "#eecd4a", "#124d81", "#dbcbbe"]
        hue_order = [c for c in ["n", "a", "c", "m"]
                     if c in set(df["class"])]
        g = sns.FacetGrid(df, col="region", hue="class",
                          palette=colours[:len(hue_order)],
                          hue_order=hue_order, col_wrap=5, height=2)
        g.map(sns.scatterplot, "x1", "x2", s=10)
        g.set_titles(col_template="{col_name}")
        g.add_legend()
        plt.savefig(os.path.join(self._out_dir, "emb_all_train.svg"))

        fig_name = os.path.join(self._out_dir, "emb_all_train_dist")
        with open(fig_name + ".pkl", "wb") as f:
            pickle.dump(g, f)
        plt.savefig(fig_name + ".svg")
        plt.close("all")

    # ------------------------------------------------------------------
    # classifier evaluation (reference test.py:1323-1440)
    def test_classifiers(self):
        from sklearn.metrics import classification_report, confusion_matrix
        from sklearn.utils.multiclass import unique_labels

        mgr = self._manager
        zoo = mgr.classifiers
        ts_z, ts_l = mgr.encode_all(self._test_iter, False)
        ts_ly = np.asarray(ts_l["y"])
        ts_y = np.asarray(mgr.class2idx(ts_l["y"]))

        accs, reports, preds = {}, {}, {}
        for name in ("mlp", "svm", "lda", "qda"):
            try:
                pred = zoo.predict(ts_z, name)
            except Exception as e:
                print(f"[tester] {name} unavailable: {e}")
                continue
            pred_chars = np.asarray(mgr.idx2class(pred))
            accs[f"accuracy_{name}"] = float(np.mean(pred == ts_y))
            reports[name] = classification_report(
                ts_ly, pred_chars, output_dict=True, zero_division=0)
            preds[name] = pred_chars

        with open(os.path.join(self._out_dir, "accuracies.json"), "w") as f:
            json.dump(accs, f)
        with open(os.path.join(self._out_dir,
                               "classification_report.json"), "w") as f:
            json.dump(reports, f)

        # labels must span predictions too: a head predicting a class
        # absent from the small test split would otherwise give the
        # matrix one more row than the tick-label list
        labels = unique_labels(ts_ly, *preds.values()) if preds \
            else unique_labels(ts_ly)
        for name, pred_chars in preds.items():
            cm = confusion_matrix(ts_ly, pred_chars, labels=labels,
                                  normalize="true")
            self._plot_confusion_matrix(
                cm, labels,
                os.path.join(self._out_dir, f"confmat_{name}.svg"))

        # per-region QDA reports + confusion matrices
        if zoo is not None and zoo.region_qdas:
            region_reports = {}
            for key, (lo, hi) in mgr.latent_regions.items():
                pred = zoo.region_qdas[key].predict(ts_z[:, lo:hi])
                pred_chars = np.asarray(mgr.idx2class(pred))
                region_reports[key] = classification_report(
                    ts_ly, pred_chars, output_dict=True, zero_division=0)
                region_reports[key]["accuracy"] = float(
                    np.mean(pred == ts_y))
            with open(os.path.join(
                    self._out_dir,
                    "classification_report_regions.json"), "w") as f:
                json.dump(region_reports, f)
            self.confusion_matrices_per_region(ts_z, ts_ly)
        return accs

    def confusion_matrices_per_region(self, ts_z, ts_ly):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns
        from sklearn.metrics import confusion_matrix
        from sklearn.utils.multiclass import unique_labels

        mgr = self._manager
        zoo = mgr.classifiers
        for m, clf_dict in (("lda", zoo.region_ldas),
                            ("qda", zoo.region_qdas)):
            if not clf_dict:
                continue
            n_regions = len(clf_dict)
            n_cols = 5
            n_rows = -(-n_regions // n_cols)
            plt.figure(figsize=(7.5 * n_cols, 6 * n_rows))
            for n, (key, clf) in enumerate(clf_dict.items()):
                lo, hi = mgr.latent_regions[key]
                pred = np.asarray(mgr.idx2class(clf.predict(ts_z[:, lo:hi])))
                # per-subplot label set spanning predictions, so the
                # matrix shape always matches the tick labels
                labels = unique_labels(ts_ly, pred)
                cf = confusion_matrix(ts_ly, pred, labels=labels,
                                      normalize="true")
                ax = plt.subplot(n_rows, n_cols, n + 1)
                g = sns.heatmap(cf, annot=True, cmap="YlGnBu", ax=ax,
                                vmin=0.0, vmax=1.0)
                g.set_title(COLOUR2ATTRIBUTE.get(key, key))
                g.set_xticklabels(labels)
                g.set_yticklabels(labels)
                g.set(ylabel="True Label", xlabel="Predicted Label")
            plt.tight_layout()
            plt.savefig(os.path.join(self._out_dir,
                                     f"region_confmats_{m}.svg"),
                        bbox_inches="tight")
            plt.close("all")

    @staticmethod
    def _plot_confusion_matrix(cm, labels, path):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns

        plt.figure()
        ax = sns.heatmap(cm, annot=True, cmap="YlGnBu", vmin=0.0, vmax=1.0)
        ax.set_xticklabels(labels)
        ax.set_yticklabels(labels)
        ax.set(ylabel="True Label", xlabel="Predicted Label")
        plt.savefig(path, bbox_inches="tight", dpi=300)
        plt.close()

    # ------------------------------------------------------------------
    # interpolations (reference test.py:544-637)
    def interpolate(self, v_1: np.ndarray, v_2: np.ndarray,
                    per_variable_steps: int = 3):
        """Per-feature / per-variable / all-features latent interpolation
        between two meshes (raw vertex arrays), with the reference's video
        artifacts (test.py:544-637: interpolate_per_feature.png/mp4,
        interpolate_per_variable.mp4, interpolate_all.png)."""
        mgr = self._manager
        z_1 = np.asarray(mgr.encode(self._normalize(v_1)))
        z_2 = np.asarray(mgr.encode(self._normalize(v_2)))
        features = list(mgr.template.feat_and_cont.keys())
        n = max(len(features) // 2, 2)

        # per feature: walk each region's slice from z1 to z2 sequentially
        rows, all_frames = [], []
        z = np.tile(z_1, (n, 1))
        for feature in features:
            lo, hi = mgr.latent_regions[feature]
            z[:, lo:hi] = vector_linspace(z_1[lo:hi], z_2[lo:hi], n)
            gen = self._unnormalize(np.asarray(mgr.generate(z)))
            renders = self._render(gen)
            all_frames.append(renders)
            rows.append(make_image_grid(renders, nrow=n))
            z = np.tile(z[-1], (n, 1))
        self._save_image(
            os.path.join(self._out_dir, "interpolate_per_feature.png"),
            np.concatenate(rows, axis=0))
        self._write_video(
            os.path.join(self._out_dir, "interpolate_per_feature.mp4"),
            np.concatenate(all_frames, axis=0), fps=4)

        # per variable: walk every latent dimension z1->z2 sequentially
        # (reference test.py:608-627)
        all_frames = []
        z = np.tile(z_1, (per_variable_steps, 1))
        for z_i in range(z_1.shape[-1]):
            z[:, z_i] = np.linspace(float(z_1[z_i]), float(z_2[z_i]),
                                    per_variable_steps)
            gen = self._unnormalize(np.asarray(mgr.generate(z)))
            all_frames.append(self._render(gen))
            z = np.tile(z[-1], (per_variable_steps, 1))
        self._write_video(
            os.path.join(self._out_dir, "interpolate_per_variable.mp4"),
            np.concatenate(all_frames, axis=0), fps=4)

        # all features at once
        zs = vector_linspace(z_1, z_2, len(features))
        gen = self._unnormalize(np.asarray(mgr.generate(zs)))
        self._save_image(
            os.path.join(self._out_dir, "interpolate_all.png"),
            make_image_grid(self._render(gen), nrow=len(features)))

    # ------------------------------------------------------------------
    # surgical planning (reference test.py:652-905)
    def _load_and_encode(self, mesh_path: str) -> np.ndarray:
        verts = read_mesh(mesh_path).vertices.astype(np.float32)
        return np.asarray(self._manager.encode(self._normalize(verts)))

    def interpolate_syndrome_to_normal(self, patient_path: str,
                                       n_p_to_3std: int = 8,
                                       n_linspace: int = 5000,
                                       render: bool = True) -> dict:
        """Plan surgery: walk the patient latent toward the healthy-class
        QDA Gaussian, locating the 3/2/1-std crossings by log-pdf thresholds
        (reference test.py:652-748). Returns the key latents + per-procedure
        interpolations; renders artifacts when render=True."""
        from .planning import healthy_gaussian, plan_to_healthy

        mgr = self._manager
        z_p = self._load_and_encode(patient_path).reshape(-1)
        patient_fname = os.path.basename(patient_path)

        assert mgr.classifiers is not None and \
            mgr.classifiers.qda is not None, \
            "surgical planning needs the trained QDA (run " \
            "train_and_validate_classifiers or resume a checkpoint " \
            "with classifier pickles first)"
        mean_h, cov_h = healthy_gaussian(mgr.classifiers.qda,
                                         mgr.class2idx("n"))
        out = plan_to_healthy(z_p, mean_h, cov_h, mgr.latent_regions,
                              n_p_to_3std=n_p_to_3std,
                              n_linspace=n_linspace)
        if render:
            self._render_embed_save_z_interpolations(
                out["all_attributes"],
                patient_fname[:-4] + "_all_attributes")
            for proc, zp_grid in out["procedures"].items():
                self._render_embed_save_z_interpolations(
                    zp_grid, patient_fname[:-4] + "_" + proc)
            import pandas as pd
            interp_dir = os.path.join(self._out_dir, "interpolations")
            os.makedirs(interp_dir, exist_ok=True)
            pd.DataFrame(out["procedure_distances"]).to_csv(os.path.join(
                interp_dir,
                patient_fname[:-4] + "_procedure_distances.csv"))
        return out

    def _render_embed_save_z_interpolations(self, z_interp, save_id):
        """Render mesh sequence + error maps, export PLYs, overlay the
        latent trajectory on the (pickled) embedding figures
        (reference test.py:750-905)."""
        mgr = self._manager
        out_dir = os.path.join(self._out_dir, "interpolations", save_id)
        os.makedirs(out_dir, exist_ok=True)

        gen = self._unnormalize(
            np.asarray(mgr.generate(z_interp.astype(np.float32))))
        errors = np.asarray(mgr.compute_vertex_errors(
            gen, np.broadcast_to(gen[0], gen.shape)))
        renders = self._render(gen)
        err_renders = self._render(gen, errors, 5)
        self._save_image(os.path.join(out_dir, "interpolation.png"),
                         make_image_grid(renders, nrow=len(gen)))
        self._save_image(os.path.join(out_dir, "interpolation_errors.png"),
                         make_image_grid(err_renders, nrow=len(gen)))
        self._write_video(os.path.join(out_dir, "interpolation.mp4"),
                          np.concatenate([renders, err_renders], axis=2),
                          fps=2)
        self.save_batch(gen, out_dir)

        # embedding-space trajectory overlays: static svg + per-point video
        # on both pickled figures (reference test.py:771-833)
        try:
            self._overlay_on_global_figure(
                z_interp, out_dir, save_id + "_emb",
                video_name=save_id + "_emb_interpolate")
            self._overlay_on_region_grid(
                z_interp, out_dir, save_id + "_emb_r_interpolate",
                video=True)
        except Exception as e:
            print(f"[tester] embedding overlay skipped: {e}")

    @staticmethod
    def _fig_to_frame(fig) -> np.ndarray:
        """Rasterize a matplotlib figure to a float [H, W, 3] frame."""
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        return buf.astype(np.float32) / 255.0

    def _region_projections(self, z: np.ndarray) -> dict:
        """{region_key: [P, 2]} per-region 2-D projections, matching the
        conventions of plot_embeddings_per_region."""
        mgr = self._manager
        zoo = mgr.classifiers
        out = {}
        for key, (lo, hi) in mgr.latent_regions.items():
            if hi - lo > 2 and zoo is not None and zoo.region_ldas:
                lda = zoo.region_ldas[key]
                emb = lda.transform_sklearn_style(z[:, lo:hi]) \
                    if hasattr(lda, "_sklearn_transform") \
                    else lda.transform(z[:, lo:hi])
            else:
                emb = z[:, [lo, hi - 1]]
            emb = np.asarray(emb)
            if emb.shape[1] < 2:    # 2-class LDA has a single component
                emb = np.concatenate(
                    [emb, np.zeros((len(emb), 2 - emb.shape[1]))], axis=1)
            out[key] = emb
        return out

    def _overlay_on_global_figure(self, z, out_dir, svg_name,
                                  video_name=None,
                                  fig_path=None):
        """Overlay latents onto the pickled global LDA-embedding figure
        (reference test.py:771-797, 872-890)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from ..viz.plots import load_pickled_figure

        fig_path = fig_path or os.path.join(self._out_dir,
                                            "lda_emb_distributions.pkl")
        if not os.path.exists(fig_path):
            print(f"[tester] {fig_path} missing; global overlay skipped")
            return
        z = np.atleast_2d(np.asarray(z))
        proj = self._manager.lda_project_latents_in_2d(z)

        fig = load_pickled_figure(fig_path)
        ax = fig.gca()
        ax.plot(proj[:, 0], proj[:, 1], "-o", color="#e881a7", markersize=3)
        fig.savefig(os.path.join(out_dir, svg_name + ".svg"))
        plt.close(fig)

        if video_name is not None and len(proj) > 1:
            frames = []
            for p in range(len(proj)):
                fig = load_pickled_figure(fig_path)
                ax = fig.gca()
                ax.scatter(proj[:p + 1, 0], proj[:p + 1, 1],
                           c="#e881a7", s=6)
                frames.append(self._fig_to_frame(fig))
                plt.close(fig)
            self._write_video(os.path.join(out_dir, video_name + ".mp4"),
                              np.stack(frames), fps=4)

    def _overlay_on_region_grid(self, z, out_dir, name, video=False,
                                fig_path=None):
        """Overlay per-region latent slices onto the pickled per-region
        FacetGrid (reference test.py:798-833, 891-904)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from ..viz.plots import load_pickled_figure

        fig_path = fig_path or os.path.join(self._out_dir,
                                            "emb_all_train_dist.pkl")
        if not os.path.exists(fig_path):
            print(f"[tester] {fig_path} missing; region overlay skipped")
            return
        z = np.atleast_2d(np.asarray(z))
        r_proj = self._region_projections(z)

        grid = load_pickled_figure(fig_path)
        for key, emb in r_proj.items():
            ax = grid.axes_dict.get(COLOUR2ATTRIBUTE.get(key, key))
            if ax is not None:
                ax.scatter(emb[:, 0], emb[:, 1], c=["#e881a7"], s=2)
        grid.fig.savefig(os.path.join(out_dir, name + ".svg"))
        plt.close(grid.fig)

        if video and len(z) > 1:
            frames = []
            for p in range(len(z)):
                grid = load_pickled_figure(fig_path)
                for key, emb in r_proj.items():
                    ax = grid.axes_dict.get(COLOUR2ATTRIBUTE.get(key, key))
                    if ax is not None:
                        ax.scatter(emb[p, 0], emb[p, 1],
                                   c=["#e881a7"], s=2)
                frames.append(self._fig_to_frame(grid.fig))
                plt.close(grid.fig)
            self._write_video(os.path.join(out_dir, name + ".mp4"),
                              np.stack(frames), fps=4)

    def classify_and_project(self, mesh_path: str):
        """Diagnose one patient mesh with the main (QDA) classifier and
        overlay its latent onto both pickled embedding figures
        (reference test.py:872-904)."""
        z_p = self._load_and_encode(mesh_path).reshape(1, -1)
        label = self._manager.classify_latent(z_p, "qda")
        print(f"[tester] {os.path.basename(mesh_path)} classified as "
              f"{label}")
        out_dir = os.path.join(self._out_dir, "interpolations")
        os.makedirs(out_dir, exist_ok=True)
        name = os.path.splitext(os.path.basename(mesh_path))[0]
        self._overlay_on_global_figure(z_p, out_dir, name + "_emb")
        self._overlay_on_region_grid(z_p, out_dir, name + "_emb_r")
        return label

    # ------------------------------------------------------------------
    # pre/post surgery assessment (reference test.py:972-1157)
    def evaluate_pre_post_pair(self, pre_path, post_path, patient_id,
                               procedure="monobloc") -> dict:
        mgr = self._manager
        zoo = mgr.classifiers
        z_pre = self._load_and_encode(pre_path).reshape(1, -1)
        z_post = self._load_and_encode(post_path).reshape(1, -1)

        self._project_pre_post_pair(z_pre, z_post, patient_id)
        pre_class = mgr.classify_latent(z_pre, "qda")
        post_class = mgr.classify_latent(z_post, "qda")

        n_label = mgr.class2idx("n")
        d_pre = zoo.mahalanobis(z_pre, n_label)
        d_post = zoo.mahalanobis(z_post, n_label)
        metric_global = (d_pre - d_post) / max(d_post, 1e-9)

        assert zoo.qda is not None, \
            "pre/post assessment needs the trained QDA distribution"
        qda = zoo.qda
        # class_covariance (not covs[i]) — it rebuilds the covariance for
        # heads imported from store_covariance=False sklearn pickles,
        # where covs is None
        mean_h, cov_h = qda.class_covariance(n_label)
        d_pre_l2 = float(np.linalg.norm(z_pre[0] - mean_h))
        d_post_l2 = float(np.linalg.norm(z_post[0] - mean_h))
        metric_global_l2 = (d_pre_l2 - d_post_l2) / max(d_post_l2, 1e-9)

        displacement = z_post[0] - z_pre[0]
        ideal = mean_h - z_pre[0]
        cos_angle = float(
            displacement @ ideal /
            (np.linalg.norm(displacement) * np.linalg.norm(ideal) + 1e-12))
        diff = z_post[0] - z_pre[0]
        length_maha = float(np.sqrt(max(
            diff @ qda._solve_cov(cov_h, diff), 0.0)))
        metric_global_dir = length_maha * cos_angle / max(d_post, 1e-9)

        # procedure metric, weighted by per-region QDA accuracy if the
        # classifier test suite ran
        report_path = os.path.join(self._out_dir,
                                   "classification_report_regions.json")
        region_reports = None
        if os.path.exists(report_path):
            with open(report_path) as f:
                region_reports = json.load(f)

        affected = [a for a in PROCEDURES2ATTRIBUTES[procedure]
                    if a in mgr.latent_regions]
        metric_regions = 0.0
        region_metrics = {}
        for key in affected:
            lo, hi = mgr.latent_regions[key]
            d_pre_r = zoo.mahalanobis(z_pre[0, lo:hi], n_label, region=key)
            d_post_r = zoo.mahalanobis(z_post[0, lo:hi], n_label,
                                       region=key)
            w = region_reports[key]["accuracy"] if region_reports else 1.0
            metric_regions += w * ((d_pre_r - d_post_r) /
                                   max(d_post_r, 1e-9))

            rq = zoo.region_qdas[key]
            m_r, cov_r = rq.class_covariance(n_label)
            disp = z_post[0, lo:hi] - z_pre[0, lo:hi]
            ideal_r = m_r - z_pre[0, lo:hi]
            cos_r = float(disp @ ideal_r /
                          (np.linalg.norm(disp) * np.linalg.norm(ideal_r)
                           + 1e-12))
            len_r = float(np.sqrt(max(
                disp @ QDAClassifier._solve_cov(cov_r, disp), 0.0)))
            region_metrics[key] = {
                "metric_distances": (d_pre_r - d_post_r) /
                    max(d_post_r, 1e-9),
                "metric_with_angle": len_r * cos_r / max(d_post_r, 1e-9),
            }
        metric_regions /= max(len(affected), 1)

        return {"pre_class": pre_class, "post_class": post_class,
                "global_metric": metric_global,
                "global_metric_l2": metric_global_l2,
                "global_metric_directional": metric_global_dir,
                "procedure_metric": metric_regions,
                "region_metrics": region_metrics}

    def _project_pre_post_pair(self, z_pre, z_post, patient_id):
        """Overlay the pre→post latent displacement as an arrow on the
        pickled LDA embedding figure (reference test.py:1090-1157)."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            from ..viz.plots import load_pickled_figure, plot_2d_arrow

            fig_path = os.path.join(self._out_dir,
                                    "lda_emb_distributions.pkl")
            if not os.path.exists(fig_path):
                return
            fig = load_pickled_figure(fig_path)
            pre2d = self._manager.lda_project_latents_in_2d(z_pre)
            post2d = self._manager.lda_project_latents_in_2d(z_post)
            ax = fig.gca()
            ax.scatter(pre2d[:, 0], pre2d[:, 1], c="#e881a7", s=12)
            ax.scatter(post2d[:, 0], post2d[:, 1], c="#81a7e8", s=12)
            plot_2d_arrow(pre2d[0], post2d[0], ax)
            out_dir = os.path.join(self._out_dir, "pre_post_eval_plots")
            os.makedirs(out_dir, exist_ok=True)
            fig.savefig(os.path.join(out_dir,
                                     f"{patient_id}_displacement.svg"))
            plt.close(fig)
        except Exception as e:
            print(f"[tester] pre/post projection skipped: {e}")

    def evaluate_all_pre_post_pairs_in_excel(self, pairs_root,
                                             pairs_excel_path):
        """Batch pre/post driver over an xlsx table + seaborn boxplots
        (reference test.py:906-970)."""
        import pandas as pd

        if pairs_excel_path.endswith(".csv"):
            pairs_df = pd.read_csv(pairs_excel_path)
        else:
            pairs_df = pd.read_excel(pairs_excel_path)
        out_dir = os.path.join(self._out_dir, "pre_post_eval_plots")
        os.makedirs(out_dir, exist_ok=True)

        region_rows, region_rows_a = [], []
        for r_idx, row in pairs_df.iterrows():
            metrics = self.evaluate_pre_post_pair(
                os.path.join(pairs_root, row["Pre name"]),
                os.path.join(pairs_root, row["Post name"]),
                str(row["PID"]), row["Surgery regions"])
            region_metrics = metrics.pop("region_metrics")
            rr = {"Procedure": row.get("Procedure")}
            rra = {"Procedure": row.get("Procedure"),
                   "Syndrome": row.get("Syndrome")}
            for k, m in region_metrics.items():
                name = COLOUR2ATTRIBUTE.get(k, k)
                rr[name] = m["metric_distances"]
                rra[name] = m["metric_with_angle"]
            region_rows.append(rr)
            region_rows_a.append(rra)
            for k, v in metrics.items():
                pairs_df.loc[r_idx, k] = str(v) \
                    if isinstance(v, list) else v

        pairs_df.to_csv(os.path.join(
            out_dir, os.path.basename(pairs_excel_path).rsplit(".", 1)[0]
            + "_with_results.csv"))

        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns

        rdf = pd.DataFrame(region_rows).fillna(0)
        plt.close("all")
        ax = sns.boxplot(data=pd.melt(rdf, id_vars="Procedure"),
                         x="variable", y="value", hue="Procedure")
        ax.set_xticklabels(ax.get_xticklabels(), rotation=30)
        ax.figure.savefig(os.path.join(out_dir,
                                       "region_metrics_distances.svg"))

        # per-syndrome angle-metric boxplots (reference test.py:952-971;
        # matched case-insensitively — the reference requires exactly
        # "Apert"/"Crouzon" in the xlsx)
        rdf_a = pd.DataFrame(region_rows_a).fillna(0)
        for syndrome in ("Apert", "Crouzon"):
            sub = rdf_a[rdf_a["Syndrome"].astype(str).str.lower()
                        == syndrome.lower()]
            if not len(sub):
                continue
            plt.close("all")
            ax = sns.boxplot(
                data=pd.melt(sub.drop(columns="Syndrome"),
                             id_vars="Procedure"),
                x="variable", y="value", hue="Procedure")
            ax.set_xticklabels(ax.get_xticklabels(), rotation=30)
            ax.figure.savefig(os.path.join(
                out_dir,
                f"region_metrics_with_angles_{syndrome.lower()}.svg"))
        plt.close("all")
        return pairs_df

    def compute_and_save_postop_mesh_colourmap(self, pre_path, post_path,
                                               out_name="postop_displacement"):
        """Pre/post displacement error-colormap export
        (reference test.py:1138-1151)."""
        pre = read_mesh(pre_path).vertices.astype(np.float32)
        post = read_mesh(post_path).vertices.astype(np.float32)
        disp = np.asarray(self._manager.compute_vertex_errors(
            post[None], pre[None]))[0]
        from ..viz.colors import errors_to_colors
        cols = errors_to_colors(disp, 0, disp.max() or 1.0, "plasma")
        rgba = np.concatenate(
            [cols, np.full((len(cols), 1), 255, np.uint8)], axis=1)
        write_ply(os.path.join(self._out_dir, out_name + ".ply"), post,
                  self._manager.template.face, rgba)

    # ------------------------------------------------------------------
    # diagnostic saliency (new surface; the reference offers no
    # explanation of its classifier outputs)
    def saliency_maps(self, n_meshes=4, healthy_class="n",
                      save_artifacts=True) -> list:
        """Gradient attribution of the QDA diagnosis onto the scan
        surface for the first test meshes: which vertices — and which
        anatomical regions — drive each prediction away from the healthy
        class (analysis/saliency.py; one jitted reverse-mode dispatch for
        the whole batch). Writes ``saliency/<i>_saliency.ply`` (plasma
        per-vertex colormap), ``saliency/saliency_maps.png`` (shadeless
        render grid on a shared scale) and ``saliency/report.json``;
        returns the per-mesh report list."""
        from ..viz.colors import errors_to_colors
        from .saliency import make_saliency_fn, region_attribution

        mgr = self._manager
        if mgr.classifiers is None or mgr.classifiers.qda is None:
            raise RuntimeError("saliency_maps needs the fitted QDA head")
        qda = mgr.classifiers.qda
        raws = []
        for batch in self._test_iter:
            raws.append(self._unnormalize(np.asarray(batch["x"],
                                                     np.float32)))
            if sum(len(r) for r in raws) >= n_meshes:
                break
        raw = np.concatenate(raws, axis=0)[:n_meshes]
        fn = jax.jit(make_saliency_fn(
            mgr, self._norm if self._normalized else None, qda,
            mgr.class2idx(healthy_class)))
        sal, margin, pred, ref, _, _ = [
            np.asarray(r) for r in fn(mgr.state.params, raw)]
        qda_classes = np.asarray(qda.classes)
        out_dir = os.path.join(self._out_dir, "saliency")
        if save_artifacts:
            os.makedirs(out_dir, exist_ok=True)
        reports = []
        for i in range(len(raw)):
            reports.append({
                "mesh": i,
                "label": mgr.idx2class(int(qda_classes[pred[i]])),
                "reference_class": mgr.idx2class(int(qda_classes[ref[i]])),
                "margin_nats": float(margin[i]),
                "regions": region_attribution(sal[i], mgr.template),
            })
            if save_artifacts:
                cols = errors_to_colors(sal[i], 0, sal[i].max() or 1.0,
                                        "plasma")
                rgba = np.concatenate(
                    [cols, np.full((len(cols), 1), 255, np.uint8)], axis=1)
                write_ply(os.path.join(out_dir, f"{i}_saliency.ply"),
                          raw[i], mgr.template.face, rgba)
        if save_artifacts:
            grid = make_image_grid(
                self._render(raw, sal, float(sal.max()) or 1.0), nrow=4)
            self._save_image(os.path.join(out_dir, "saliency_maps.png"),
                             grid)
            with open(os.path.join(out_dir, "report.json"), "w") as f:
                json.dump(reports, f, indent=1)
        return reports

    # ------------------------------------------------------------------
    # diagnosis uncertainty (new surface; the reference's diagnosis is a
    # bare point label)
    def diagnosis_uncertainty(self, n_meshes=8, n_samples=64, seed=0,
                              agreement_threshold=0.9,
                              save_artifacts=True) -> list:
        """Posterior-sampling uncertainty of the QDA diagnosis for the
        first test meshes (analysis/uncertainty.py; VAE runs only): the
        encoder posterior q(z|x) is sampled ``n_samples`` times and every
        sample classified — ONE jitted dispatch per batch. Each report
        carries the point label, the fraction of samples agreeing with
        it, per-class vote counts, posterior mean/std, predictive
        entropy, and ``flagged`` when agreement falls below
        ``agreement_threshold`` (the scans a clinician should review).
        Writes ``uncertainty/report.json``; returns the report list."""
        from .uncertainty import make_uncertainty_fn, summarize_uncertainty

        mgr = self._manager
        if mgr.classifiers is None or mgr.classifiers.qda is None:
            raise RuntimeError(
                "diagnosis_uncertainty needs the fitted QDA head")
        qda = mgr.classifiers.qda
        raws = []
        for batch in self._test_iter:
            raws.append(self._unnormalize(np.asarray(batch["x"],
                                                     np.float32)))
            if sum(len(r) for r in raws) >= n_meshes:
                break
        raw = np.concatenate(raws, axis=0)[:n_meshes]
        fn = jax.jit(make_uncertainty_fn(
            mgr, self._norm if self._normalized else None, qda,
            int(n_samples)))
        mu, lp_mu, sample_lp, sample_pred, _ = fn(
            mgr.state.params, raw, jax.random.PRNGKey(int(seed)))
        reports = summarize_uncertainty(lp_mu, sample_lp, sample_pred,
                                        qda.classes, mgr._idx2class_dict)
        for i, rep in enumerate(reports):
            rep["mesh"] = i
            rep["flagged"] = rep["label_agreement"] < agreement_threshold
        if save_artifacts:
            out_dir = os.path.join(self._out_dir, "uncertainty")
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, "report.json"), "w") as f:
                json.dump(reports, f, indent=1)
        return reports

    # ------------------------------------------------------------------
    # mesh fitting (reference test.py:336-520)
    def fit_mesh(self, mesh_path, landmarks, lr=5e-3, iterations=250,
                 n_restarts=16, seed=0, save_artifacts=False):
        """Fit a latent to an unregistered scan: Procrustes landmark
        alignment then Adam over multiple z inits minimizing
        10·landmark-MSE + chamfer, pick the best, classify it.

        landmarks: [20, 3] array or a path to the reference's landmark
        JSON ([{'x':..,'y':..,'z':..}, ...]).

        With save_artifacts=True the fitted mesh and the aligned scan are
        exported for inspection (reference test.py:477-483 writes
        `*_aligned.obj` / `*_fit.obj` next to the input; here they land
        in <out_dir>/fit/ to keep source dirs read-only-safe).
        """
        from .fitting import fit_latent

        scan_mesh = read_mesh(mesh_path)
        mgr = self._manager
        if isinstance(landmarks, str):
            with open(landmarks) as f:
                pts = json.load(f)
            landmarks = np.asarray([[p["x"], p["y"], p["z"]] for p in pts])

        result = fit_latent(
            mgr, self._norm if self._normalized else None,
            scan_mesh.vertices, landmarks, self.template_landmarks_idx,
            lr=lr, iterations=iterations, n_restarts=n_restarts, seed=seed,
            z_anchor=np.asarray(self.latent_stats["means"], np.float32))
        gen, aligned = result["vertices"], result["aligned_scan"]
        z_best = result["z"]
        if mgr.classifiers is not None and mgr.classifiers.qda is not None:
            result["pred_class"] = mgr.classify_latent(
                z_best[None], "qda")
            region_preds = {}
            for key, (lo, hi) in mgr.latent_regions.items():
                if mgr.classifiers.region_qdas:
                    p = mgr.classifiers.region_qdas[key].predict(
                        z_best[None, lo:hi])
                    region_preds[COLOUR2ATTRIBUTE.get(key, key)] = \
                        mgr.idx2class(p)
            result["region_pred_classes"] = region_preds
        if save_artifacts:
            fit_dir = os.path.join(self._out_dir, "fit")
            os.makedirs(fit_dir, exist_ok=True)
            base = os.path.splitext(os.path.basename(mesh_path))[0]
            fit_path = os.path.join(fit_dir, f"{base}_fit.ply")
            aligned_path = os.path.join(fit_dir, f"{base}_aligned.ply")
            write_ply(fit_path, gen, mgr.template.face)
            write_ply(aligned_path, aligned, scan_mesh.faces)
            scalars = {k: v for k, v in result.items()
                       if isinstance(v, (int, float, str, list, dict))}
            with open(os.path.join(fit_dir, f"{base}_fit.json"),
                      "w") as f:
                json.dump(scalars, f, indent=1, default=str)
            result["artifacts"] = [fit_path, aligned_path]
        return result
