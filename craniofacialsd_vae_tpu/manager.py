"""ModelManager: the orchestration layer (reference model_manager.py analog).

Owns config → geometry → model params → optimizer → train/eval loops →
checkpointing → latent classifiers, exposing the same surface the reference's
god-object does (run_epoch / encode / generate / encode_all /
train_and_validate_classifiers / classify_latent / save_weights / resume /
latent_regions) so users migrating from the PyTorch implementation find the
API they know — but every hot path delegates to the jitted TPU train step.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import load_or_compute_geometry, load_template
from .models import (SDVAEConfig, SpiralGeometry, decode, encode, forward,
                     init_sdvae, init_mlp, latent_regions)
from .training import (LOSS_KEYS, LossWeights, coupled_adam,
                       create_train_state, make_eval_step, make_train_step)
from .training.checkpoint import resume_checkpoint, save_checkpoint
from .utils import class_conversions_and_weights

_coupled_adam = coupled_adam   # torch-style coupled L2 (training.trainer)

__all__ = ["ModelManager"]


class ModelManager:
    def __init__(self, configurations: dict, precomputed_storage_path:
                 str = "precomputed", seed: int = 0):
        self.config = configurations
        self._model_params = configurations["model"]
        self._optimization_params = configurations["optimization"]
        self._data_params = configurations["data"]
        self._classifier_params = configurations.get("classifier")
        self.to_mm_const = float(
            self._data_params.get("to_mm_constant", 1.0))

        # --- geometry (cached precompute, reference mm.py:176-230) --------
        self.template = load_template(self._data_params["template_path"])
        sampling = self._model_params["sampling"]
        spirals = self._model_params["spirals"]
        self.bundle = load_or_compute_geometry(
            precomputed_storage_path, self.template,
            sampling["sampling_factors"], spirals["length"],
            spirals["dilation"],
            region_weighted=sampling.get("type", "basic") != "basic")
        # Build the geometry tables ON THE HOST CPU device, then push one
        # copy to the accelerator. Two reasons: (a) the serving/saliency/
        # uncertainty/export program builders CLOSE OVER the geometry (by
        # design — exported artifacts are self-contained), and tracing a
        # closure constant that lives on the tunneled TPU fetches every
        # one of its 757 arrays device→host in its own round trip
        # (measured: minutes per fresh process); the host-resident copy
        # embeds instantly. (b) the runtime copy is transferred
        # host→device once, asynchronously, instead of leaf-by-leaf
        # jnp.asarray dispatches.
        # local_devices, NOT devices: under multihost, jax.devices() is
        # the GLOBAL list and index 0 may be another process's device —
        # committing arrays to a non-addressable device hangs collective
        # setup (caught by tests/test_multihost_scanned.py)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            self.geometry_host = SpiralGeometry.from_bundle(self.bundle)
        default_dev = jax.local_devices()[0]
        self.geometry = self.geometry_host if default_dev.platform == \
            "cpu" else jax.device_put(self.geometry_host, default_dev)

        # --- model + losses ----------------------------------------------
        self.loss_weights = LossWeights.from_config(
            self._optimization_params, self._classifier_params)
        self.net_config = SDVAEConfig.from_dict(
            self._model_params, self.loss_weights.kl)
        self.swap_features = bool(
            self._data_params.get("swap_features", False))
        if self.loss_weights.latent_consistency > 0:
            assert self.swap_features, \
                "latent consistency requires swap_features"
        self.batch_size = int(self._optimization_params["batch_size"])
        # per-step host batch rows the steps are compiled for (grows to
        # n_devices × batch_size under data parallelism)
        self._global_batch_size = self.batch_size

        key = jax.random.PRNGKey(seed)
        k_net, k_clf = jax.random.split(key)
        params = init_sdvae(k_net, self.net_config, self.geometry)

        # torch.optim.Adam couples weight_decay into the gradient (L2 enters
        # the moment estimates, reference model_manager.py:69-72) — that is
        # add_decayed_weights BEFORE adam, not decoupled adamw
        self.optimizer = _coupled_adam(
            float(self._optimization_params["lr"]),
            float(self._optimization_params.get("weight_decay", 0.0)))

        clf_params = None
        self.clf_optimizer = None
        self._mlp_end2end = False
        if self._classifier_params:
            self._mlp_end2end = \
                self._classifier_params.get("mlp_training_type") == "end2end"
            n_classes = self._count_dataset_classes()
            clf_params = init_mlp(
                k_clf, self._model_params["latent_size"],
                self._classifier_params["mlp_hidden_features"], n_classes)
            self.clf_optimizer = _coupled_adam(
                float(self._classifier_params.get("mlp_lr", 1e-4)),
                float(self._optimization_params.get("weight_decay", 0.0)))

        self.state = create_train_state(params, self.optimizer, clf_params,
                                        self.clf_optimizer)
        self._train_step = make_train_step(
            self.net_config, self.loss_weights, self.optimizer,
            self.batch_size, swap=self.swap_features,
            clf_optimizer=self.clf_optimizer)
        self._scanned_step = None      # built lazily on first scanned epoch
        self._scanned_epochs = None    # multi-epoch scan (run_epochs_scanned)
        self._eval_step = make_eval_step(
            self.net_config, self.loss_weights, self.batch_size,
            swap=self.swap_features)
        self._build_inference_jits()

        self._latent_regions = latent_regions(
            self._model_params["latent_size"], self.template.region_names)

        self._class2idx_dict = None
        self._idx2class_dict = None
        self._class_weights = None
        self._losses = None
        self._epoch_key = jax.random.PRNGKey(seed + 1)
        self._step_counter = 0

        # lazily-built classifier zoo (analysis/classifiers.py)
        self.classifiers = None
        self._train_latents = None
        self._train_labels = None

    # ------------------------------------------------------------------
    def enable_data_parallel(self, n_devices: int | None = None):
        """Swap the train/eval steps for shard_map'd versions over a data
        mesh; the host must then feed global batches of
        n_devices × batch_size meshes."""
        from .parallel import (make_data_mesh, make_parallel_eval_step,
                               make_parallel_train_step)

        mesh = make_data_mesh(n_devices)
        self._scanned_step = None      # rebuild scanned paths sharded
        self._scanned_epochs = None
        self._train_step = make_parallel_train_step(
            self.net_config, self.loss_weights, self.optimizer,
            self.batch_size, mesh, swap=self.swap_features,
            clf_optimizer=self.clf_optimizer)
        self._eval_step = make_parallel_eval_step(
            self.net_config, self.loss_weights, self.batch_size, mesh,
            swap=self.swap_features, with_labels=self._mlp_end2end)
        self.mesh = mesh
        self._global_batch_size = self.batch_size * mesh.devices.size
        return mesh

    # ------------------------------------------------------------------
    # properties mirroring the reference surface
    @property
    def loss_keys(self):
        return list(LOSS_KEYS)

    @property
    def latent_regions(self):
        return self._latent_regions

    @property
    def is_vae(self):
        return self.net_config.is_vae

    @property
    def model_latent_size(self):
        return self._model_params["latent_size"]

    @property
    def batch_diagonal_idx(self):
        bs = self.batch_size
        return [(bs + 1) * i for i in range(bs)]

    @property
    def train_latents_and_labels(self):
        return self._train_latents, self._train_labels

    def _count_dataset_classes(self) -> int:
        """Classes = distinct first letters of the dataset's mesh
        filenames (reference mm.py:104-108). An unreadable dataset path
        fails loudly rather than silently sizing the end2end classifier
        head wrong; `classifier.n_classes` in the config overrides the
        directory scan (e.g. headless/demo setups)."""
        explicit = (self._classifier_params or {}).get("n_classes")
        if explicit:
            return int(explicit)
        path = self._data_params.get("dataset_path")
        try:
            names = [n for n in os.listdir(path)
                     if n.endswith((".obj", ".ply"))]
        except (TypeError, FileNotFoundError, NotADirectoryError) as e:
            raise ValueError(
                f"cannot count dataset classes: dataset_path {path!r} is "
                f"not readable ({e}); fix the path or set "
                f"classifier.n_classes explicitly") from None
        if not names:
            raise ValueError(
                f"cannot count dataset classes: no .obj/.ply meshes in "
                f"{path!r}; fix the path or set classifier.n_classes")
        return max(len({n[0] for n in names}), 2)

    # ------------------------------------------------------------------
    # class maps
    def set_class_conversions_and_weights(self, class_weight_dict: dict):
        self._class2idx_dict, weights = class_conversions_and_weights(
            class_weight_dict)
        self._idx2class_dict = {v: k for k, v in
                                self._class2idx_dict.items()}
        self._class_weights = jnp.asarray(weights)

    def set_class_conversions(self, class2idx: dict):
        self._class2idx_dict = dict(class2idx)
        self._idx2class_dict = {v: k for k, v in
                                self._class2idx_dict.items()}

    def class2idx(self, data_class):
        if isinstance(data_class, (list, np.ndarray)):
            return [self._class2idx_dict[d] for d in data_class]
        return self._class2idx_dict[data_class]

    def idx2class(self, idx):
        inv = self._idx2class_dict
        if isinstance(idx, (list, np.ndarray)):
            return [inv[int(i)] for i in idx]
        return inv[int(idx)]

    # ------------------------------------------------------------------
    # core model calls — jitted: the eager path paid per-op dispatch on
    # every Tester/demo encode/decode (~30 ms through the tunnel vs ~2 ms
    # compute); jit caches one compiled program per batch shape.
    # NB the geometry rides as an ARGUMENT, not a closure: a captured
    # geometry pytree (757 device arrays, ~12 MB) is embedded as compile-
    # time constants, and tracing fetches every one of them device→host
    # in its own tunnel round trip — measured MINUTES of trace time per
    # fresh process on the tunneled chip (vs instant as an argument,
    # which only touches abstract avals). The train step passes geom the
    # same way.
    def _build_inference_jits(self):
        config = self.net_config

        @jax.jit
        def _encode(params, geom, x):           # [B, N, 3] → [B, Z]
            mu, _ = encode(params, geom, config, jnp.swapaxes(x, 0, 1))
            return mu

        @jax.jit
        def _decode(params, geom, z):           # [B, Z] → [B, N, 3]
            return jnp.swapaxes(decode(params, geom, config, z), 0, 1)

        from functools import partial

        @partial(jax.jit, static_argnames=("training",))
        def _forward(params, geom, x, key, training=False):
            out, z, mu, logvar = forward(params, geom, config,
                                         jnp.swapaxes(x, 0, 1), key,
                                         training)
            return jnp.swapaxes(out, 0, 1), z, mu, logvar

        self._jit_encode, self._jit_decode, self._jit_forward = \
            _encode, _decode, _forward

    def encode(self, x) -> jnp.ndarray:
        """[B, N, 3] or [N, 3] → latents [B, Z] (deterministic, mu)."""
        x = jnp.asarray(x, jnp.float32)
        single = x.ndim == 2
        if single:
            x = x[None]
        mu = self._jit_encode(self.state.params, self.geometry, x)
        return mu[0] if single else mu

    def generate(self, z) -> jnp.ndarray:
        """[B, Z] or [Z] → vertices [B, N, 3]."""
        z = jnp.asarray(z, jnp.float32)
        single = z.ndim == 1
        if single:
            z = z[None]
        out = self._jit_decode(self.state.params, self.geometry, z)
        return out[0] if single else out

    def forward(self, x, key=None, training: bool = False):
        return self._jit_forward(self.state.params, self.geometry,
                                 jnp.asarray(x, jnp.float32), key,
                                 training=training)

    def compute_vertex_errors(self, out_verts, gt_verts):
        """Per-vertex Euclidean error in mm (reference mm.py:395-400)."""
        err = jnp.sqrt(jnp.sum((out_verts - gt_verts) ** 2, axis=-1))
        return err * self.to_mm_const

    # ------------------------------------------------------------------
    # epochs
    def run_epoch(self, batch_iter, train: bool = True) -> dict:
        """One pass over the loader; losses averaged over iterations
        (reference mm.py:257-272).

        Metrics stay on device and accumulate asynchronously — a single
        host sync per epoch, not 7 blocking transfers per step (device↔host
        round-trips dominate wall time on tunneled TPUs). Device-resident
        iterators train the whole epoch inside ONE lax.scan dispatch
        (make_scanned_train_step): per-step dispatches each cross the
        host↔device link, which under tunnel jitter can cost more than the
        step itself."""
        if train and hasattr(batch_iter, "epoch_plan") and \
                getattr(batch_iter, "drop_last", False) and \
                getattr(batch_iter, "batch_size", None) \
                == self._global_batch_size:
            # (a mismatched iterator batch size falls through to the
            # per-step guard below rather than feeding the wrong
            # swap-grid shape; under data parallelism the scanned step is
            # the shard_map'd variant and the plan's global-batch columns
            # are sharded over the mesh)
            return self._run_epoch_scanned(batch_iter)
        totals = None
        count = 0
        for batch in batch_iter:
            if self.swap_features and \
                    batch["x"].shape[0] != self._global_batch_size:
                continue  # swap grid is compiled for a fixed batch size
                # (reference uses drop_last=True everywhere,
                # data_loading.py:40-48)
            self._step_counter += 1
            key = jax.random.fold_in(self._epoch_key, self._step_counter)
            x = jnp.asarray(batch["x"])
            labels = None
            if self._mlp_end2end and "labels" in batch:
                labels = jnp.asarray(batch["labels"])
            if train:
                self.state, metrics = self._train_step(
                    self.state, self.geometry, x, labels,
                    self._class_weights, key)
            else:
                metrics = self._eval_step(
                    self.state, self.geometry, x, labels,
                    self._class_weights, key)
            totals = metrics if totals is None else \
                jax.tree.map(jnp.add, totals, metrics)
            count += 1
        if totals is None:
            self._losses = {k: 0.0 for k in LOSS_KEYS}
        else:
            totals = jax.device_get(totals)   # one sync
            self._losses = {k: float(totals[k]) / count for k in LOSS_KEYS}
        return self._losses

    def can_scan_epochs(self, train_iter, val_iter) -> bool:
        """Multi-epoch scan path available? (device-resident iterators,
        drop_last, iterator batch size matching the global compiled batch
        — which under data parallelism is n_devices × batch_size)."""
        gb = self._global_batch_size
        return (hasattr(train_iter, "epoch_plan")
                and hasattr(val_iter, "epoch_plan")
                and getattr(train_iter, "drop_last", False)
                and getattr(val_iter, "drop_last", False)
                and getattr(train_iter, "batch_size", None) == gb
                and getattr(val_iter, "batch_size", None) == gb
                and len(train_iter) > 0 and len(val_iter) > 0)

    def run_epochs_scanned(self, train_iter, val_iter, n_epochs: int):
        """Train n_epochs (train steps + per-epoch validation) in ONE
        compiled dispatch (training.make_scanned_train_epochs). Returns
        (per-epoch train losses, per-epoch val losses) as lists of dicts;
        key schedule identical to sequential run_epoch calls."""
        from .training import assemble_epoch_plans, make_scanned_train_epochs

        plan_args, self._step_counter = assemble_epoch_plans(
            train_iter, val_iter, n_epochs, self._step_counter,
            with_labels=self._mlp_end2end)

        if self._scanned_epochs is None:
            # jit re-specializes on the labels pytree structure (None vs
            # array), so one cached callable serves both variants
            mesh = getattr(self, "mesh", None)
            if mesh is not None:
                from .parallel import make_scanned_parallel_epochs
                self._scanned_epochs = make_scanned_parallel_epochs(
                    self.net_config, self.loss_weights, self.optimizer,
                    self.batch_size, mesh, swap=self.swap_features,
                    clf_optimizer=self.clf_optimizer)
            else:
                self._scanned_epochs = make_scanned_train_epochs(
                    self.net_config, self.loss_weights, self.optimizer,
                    self.batch_size, swap=self.swap_features,
                    clf_optimizer=self.clf_optimizer)
        self.state, tr_m, va_m = self._scanned_epochs(
            self.state, self.geometry, *plan_args,
            self._class_weights, self._epoch_key)
        tr_m = jax.device_get(tr_m)                       # one sync
        va_m = jax.device_get(va_m)
        tr_list = [{k: float(tr_m[k][e]) for k in LOSS_KEYS}
                   for e in range(n_epochs)]
        va_list = [{k: float(va_m[k][e]) for k in LOSS_KEYS}
                   for e in range(n_epochs)]
        # per-step parity: after run_epoch(train) + run_epoch(val) the
        # manager's _losses hold the VALIDATION averages
        self._losses = va_list[-1]
        return tr_list, va_list

    def _run_epoch_scanned(self, batch_iter) -> dict:
        """Whole epoch in one dispatch; key schedule identical to the
        per-step path (fold_in(epoch_key, running step counter))."""
        from .training import make_scanned_train_step

        x_dev, idx, labels = batch_iter.epoch_plan()
        steps = idx.shape[0]
        if steps == 0:
            self._losses = {k: 0.0 for k in LOSS_KEYS}
            return self._losses
        if self._scanned_step is None:
            mesh = getattr(self, "mesh", None)
            if mesh is not None:
                from .parallel import make_scanned_parallel_step
                self._scanned_step = make_scanned_parallel_step(
                    self.net_config, self.loss_weights, self.optimizer,
                    self.batch_size, mesh, swap=self.swap_features,
                    clf_optimizer=self.clf_optimizer)
            else:
                self._scanned_step = make_scanned_train_step(
                    self.net_config, self.loss_weights, self.optimizer,
                    self.batch_size, swap=self.swap_features,
                    clf_optimizer=self.clf_optimizer)
        step_ids = self._step_counter + 1 + jnp.arange(steps)
        self._step_counter += steps
        lab = jnp.asarray(labels) if (labels is not None
                                      and self._mlp_end2end) else None
        self.state, metrics = self._scanned_step(
            self.state, self.geometry, x_dev, jnp.asarray(idx), step_ids,
            lab, self._class_weights, self._epoch_key)
        metrics = jax.device_get(metrics)     # one sync
        self._losses = {k: float(metrics[k]) for k in LOSS_KEYS}
        return self._losses

    def log_losses(self, writer, epoch: int, phase: str = "train"):
        for k, v in (self._losses or {}).items():
            writer.add_scalar(f"{phase}/{k}", v, epoch + 1)

    # ------------------------------------------------------------------
    # rendering (reference mm.py:616-658; pure-JAX rasterizer, host path)
    def render(self, batched_verts, vertex_errors=None,
               error_max_scale=None, image_size: int = 256,
               background: float = 0.0) -> np.ndarray:
        """[B, N, 3] → [B, H, W, 3] images; with vertex_errors, shadeless
        plasma colormap like the reference's error renders."""
        from .viz.colors import errors_to_colors
        from .viz.renderer import render_batch

        verts = np.asarray(batched_verts)
        if vertex_errors is not None:
            cols = errors_to_colors(np.asarray(vertex_errors), 0,
                                    error_max_scale, "plasma") / 255.0
            return render_batch(verts, self.template.face, cols,
                                image_size=image_size, shadeless=True,
                                background=background)
        return render_batch(verts, self.template.face,
                            image_size=image_size, background=background)

    def log_images(self, batch, writer, epoch: int, normalization=None,
                   phase: str = "train", error_max_scale: float = 5.0,
                   max_meshes: int = 4):
        """GT / reconstruction / error-map grid to TensorBoard
        (reference mm.py:594-614)."""
        from .viz.renderer import make_image_grid

        x = np.asarray(batch["x"])[:max_meshes]
        out = np.asarray(self.forward(x, training=False)[0])
        if normalization is not None:
            mean = np.asarray(normalization["mean"])
            std = np.asarray(normalization["std"])
            x = x * std + mean
            out = out * std + mean
        errors = np.asarray(self.compute_vertex_errors(out, x))
        renders = np.concatenate([
            self.render(x), self.render(out),
            self.render(out, errors, error_max_scale)], axis=0)
        grid = make_image_grid(renders, nrow=len(x))
        try:
            writer.add_image(phase, grid.transpose(2, 0, 1),
                             global_step=epoch + 1)
        except Exception:
            pass  # jsonl fallback writer has no image support

    # ------------------------------------------------------------------
    # latents for analysis
    def encode_all(self, batch_iter, is_train_loader: bool = True):
        """Encode every (diagonal) mesh in a loader → (latents [M, Z],
        labels dict) (reference mm.py:402-426; the on-device pipeline never
        builds the swap grid here, so no diagonal slicing is needed)."""
        zs, labels = [], {"y": [], "age": [], "gender": [], "augmented": []}
        for batch in batch_iter:
            zs.append(np.asarray(self.encode(batch["x"])))
            labels["y"].extend(batch["y"])
            labels["age"].extend(np.asarray(batch["age"]).tolist())
            labels["gender"].extend(batch["gender"])
            labels["augmented"].extend(
                np.asarray(batch["augmented"]).tolist())
        latents = np.concatenate(zs, axis=0) if zs else np.zeros((0, 1))
        if is_train_loader:
            self._train_latents = latents
            self._train_labels = labels
        return latents, labels

    # ------------------------------------------------------------------
    # classifier zoo (delegates to analysis.classifiers)
    def build_classifiers(self):
        from .analysis.classifiers import LatentClassifiers

        per_region = self.loss_weights.latent_consistency > 0
        self.classifiers = LatentClassifiers(
            latent_size=self.model_latent_size,
            latent_regions=self._latent_regions if per_region else None,
            mlp_hidden=(self._classifier_params or {}).get(
                "mlp_hidden_features", [512, 128, 64]),
            mlp_lr=float((self._classifier_params or {}).get(
                "mlp_lr", 1e-4)),
            mlp_epochs=int((self._classifier_params or {}).get(
                "mlp_epochs", 50)),
            # reference optimizer semantics: coupled Adam with the main
            # config's weight_decay, one step per latent loader batch
            # (reference mm.py:118-121, 428-446)
            mlp_weight_decay=float(
                self._optimization_params.get("weight_decay", 0.0)),
            mlp_batch=self.batch_size,
            mlp_restarts=int((self._classifier_params or {}).get(
                "mlp_restarts", 4)),
        )
        return self.classifiers

    def train_and_validate_classifiers(self, train_iter, val_iter,
                                       writer=None, checkpoint_dir=None):
        """Fit MLP/SVM/LDA/QDA (+ per-region LDA/QDA) on train latents
        (reference mm.py:448-504)."""
        if self._train_latents is None:
            self.encode_all(train_iter, is_train_loader=True)
        val_z, val_labels = self.encode_all(val_iter, is_train_loader=False)
        if len(self._train_latents) == 0 or len(val_z) == 0:
            raise ValueError(
                "classifier fitting got an empty latent set — the loader "
                "yielded no batches (batch_size larger than the split with "
                "drop_last?)")
        if self.classifiers is None:
            self.build_classifiers()

        y = np.asarray(self.class2idx(self._train_labels["y"]))
        y_val = np.asarray(self.class2idx(val_labels["y"]))
        accs = self.classifiers.fit_all(
            self._train_latents, y, val_z, y_val,
            class_weights=np.asarray(self._class_weights)
            if self._class_weights is not None else None,
            mlp_init=self.state.clf_params if self._mlp_end2end else None,
            writer=writer)
        if checkpoint_dir:
            self.classifiers.save(checkpoint_dir)
        return accs

    def classify_latent(self, z, model: str = "main"):
        if model == "main":
            model = (self._classifier_params or {}).get(
                "main_model_type", "qda")
        pred = self.classifiers.predict(np.asarray(z), model)
        return self.idx2class(pred)

    def mahalanobis_dist_to_qda_distribution(self, z, distribution_class="n",
                                             region="all"):
        idx = self.class2idx(distribution_class)
        return self.classifiers.mahalanobis(np.asarray(z), idx, region)

    def qda_sample(self, sample_class="a", n_samples=1, seed=0):
        if isinstance(sample_class, str):
            sample_class = self.class2idx(sample_class)
        return self.classifiers.qda_sample(sample_class, n_samples, seed)

    def lda_project_latents_in_2d(self, latents):
        return self.classifiers.lda_transform(np.asarray(latents))

    # ------------------------------------------------------------------
    # checkpointing
    def save_weights(self, checkpoint_dir: str, epoch: int):
        save_checkpoint(checkpoint_dir, self.state, epoch + 1)
        if self.classifiers is not None:
            self.classifiers.save(checkpoint_dir)

    def resume(self, checkpoint_dir: str) -> int:
        self.state, epoch = resume_checkpoint(checkpoint_dir, self.state)
        try:
            if self.classifiers is None:
                self.build_classifiers()
            self.classifiers.load(checkpoint_dir)
        except FileNotFoundError:
            # a migrated reference run carries sklearn pickles instead of
            # our classifiers.npz — consume them in place
            if any(os.path.exists(os.path.join(checkpoint_dir, n))
                   for n in ("lda_classifier.pkl", "qda_classifier.pkl")):
                self.classifiers.load_reference_pickles(checkpoint_dir)
                print("Classifiers loaded from reference sklearn pickles")
            else:
                print("Classifiers not trained yet; "
                      "skipping classifier resume")
        return epoch
