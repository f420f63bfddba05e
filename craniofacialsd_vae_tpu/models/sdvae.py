"""The swap-disentangled (V)AE over mesh hierarchies — functional JAX.

Mirrors the reference architecture (model.py:88-188): 4 encoder blocks
(spiral conv → ELU → down-pool) across the vertex hierarchy, dense heads for
mu (and logvar when a VAE), mirrored decoder (dense → [up-pool → spiral conv
→ ELU] ×4 → final spiral conv to xyz). Everything is a pure function over a
parameter pytree + a static geometry pytree, so the whole train step jits
and shards with pjit/shard_map.

TPU-specific design:
  * activations are **vertex-major** [N, B, C] end to end — every spiral
    gather and pooling op reads contiguous B·C-float rows (measured ~3×
    faster than batch-major on v5e); the host boundary transposes once;
  * forward and backward contain **no scatters** — all sparse operators
    carry precomputed transposes (see ops/sparse.py).

Latent layout: `latent_size` is split into contiguous equal slices, one per
anatomical region in template region order (reference
model_manager.py:232-238) — the structure the latent-consistency loss and
per-region classifiers operate on.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (build_pool_operator, build_spiral_op, init_spiral_conv,
                   pool, spiral_conv, spiral_conv_out_gather)

__all__ = ["SDVAEConfig", "SpiralGeometry", "init_sdvae", "encode", "decode",
           "forward", "reparameterize", "latent_regions", "to_vertex_major",
           "from_vertex_major"]


def to_vertex_major(x: jnp.ndarray) -> jnp.ndarray:
    """[B, N, C] → [N, B, C] (host-boundary layout change)."""
    return jnp.swapaxes(x, 0, 1)


def from_vertex_major(x: jnp.ndarray) -> jnp.ndarray:
    """[N, B, C] → [B, N, C]."""
    return jnp.swapaxes(x, 0, 1)


@dataclass(frozen=True)
class SDVAEConfig:
    in_channels: int = 3
    out_channels: tuple = (32, 32, 32, 64)
    latent_size: int = 75
    is_vae: bool = True
    pre_z_sigmoid: bool = False
    # Activation dtype policy through the conv/pool stack; params, latents
    # and losses always stay float32. Choices:
    #   "float32"  — everything fp32 (default; bit-parity with the oracles).
    #   "mixed"    — level-0 ops fp32, deeper levels bfloat16. The step is
    #     gather-ROW-throughput-bound (docs/PERFORMANCE.md) and bf16 halves
    #     row bytes; measured on v5e the ≥512-float rows gather 1.3–2.1×
    #     faster in bf16 while the 48-float (G·3) rows get SLOWER (fall
    #     below 128-lane alignment), so the first conv, final output,
    #     Laplacian loss and latent heads stay fp32.
    #   "bfloat16" — everything bf16 (legacy knob; measured ~5× slower on
    #     v5e because of the thin level-0 rows — kept for experiments).
    compute_dtype: str = "float32"
    # Under the bf16/mixed policies, compute the final decoder conv
    # matmul-first (ops/spiral_conv.spiral_conv_out_gather): its gathers move
    # G·3-width rows instead of G·32 in both directions. No effect under
    # "float32", which keeps the gather-first formulation for bit-parity
    # with the oracles and the golden fixture.
    final_out_gather: bool = True

    @classmethod
    def from_dict(cls, model_cfg: dict, kl_weight: float) -> "SDVAEConfig":
        return cls(
            in_channels=model_cfg["in_channels"],
            out_channels=tuple(model_cfg["out_channels"]),
            latent_size=model_cfg["latent_size"],
            # pyyaml parses bare scientific notation ("1e-4") as str
            is_vae=float(kl_weight) > 0,
            pre_z_sigmoid=model_cfg.get("pre_z_sigmoid", False),
            compute_dtype=model_cfg.get("compute_dtype", "float32"),
            final_out_gather=model_cfg.get("final_out_gather", True),
        )

    @property
    def activation_dtype(self):
        """Dtype of level-0 activations (width-G·3 gather rows)."""
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" \
            else jnp.float32

    @property
    def deep_dtype(self):
        """Dtype of level ≥1 activations (width ≥ G·32 gather rows)."""
        return jnp.bfloat16 \
            if self.compute_dtype in ("bfloat16", "mixed") else jnp.float32


@jax.tree_util.register_pytree_node_class
@dataclass
class SpiralGeometry:
    """Static per-template constants: spiral ops + pooling operators."""
    spirals: list                 # SpiralOp per level
    down: list                    # pooling operators (GatherRows / ELL)
    up: list
    laplacian: Any = None         # PaddedRowSparse of the template Laplacian
    region_masks: Any = None      # [R, N] bool, template region order
    enc_spirals: list = None      # SpiralOp per level, pre-composed with the
                                  # down selection (conv evaluated only at
                                  # surviving vertices — identical math,
                                  # ~4× less encoder gather/matmul work)

    def tree_flatten(self):
        return ((self.spirals, self.down, self.up, self.laplacian,
                 self.region_masks, self.enc_spirals), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_bundle(cls, bundle, with_laplacian: bool = True) -> \
            "SpiralGeometry":
        from ..ops.pool import selection_indices
        from ..ops.sparse import from_coo

        lap = None
        if with_laplacian:
            rows, cols, vals = bundle.template.laplacian
            n = bundle.template.num_vertices
            lap = from_coo(rows, cols, vals, (n, n))
        masks = None
        if bundle.template.feat_and_cont:
            masks = jnp.asarray(bundle.template.region_masks())

        # Encoder blocks end in a row selection (down matrices are pure
        # selections): compose it into the conv's gather tables so the conv
        # only ever evaluates the rows that survive pooling.
        enc_spirals = []
        for s, d in zip(bundle.spirals, bundle.down_transforms):
            sel = selection_indices(d)
            enc_spirals.append(
                build_spiral_op(np.asarray(s)[sel], n_src=s.shape[0])
                if sel is not None else None)

        return cls(
            spirals=[build_spiral_op(s) for s in bundle.spirals],
            down=[build_pool_operator(d) for d in bundle.down_transforms],
            up=[build_pool_operator(u) for u in bundle.up_transforms],
            laplacian=lap,
            region_masks=masks,
            enc_spirals=enc_spirals,
        )

    @property
    def num_latent_vertices(self) -> int:
        """Vertex count at the deepest pooling level."""
        return self.down[-1].shape[0]


def latent_regions(latent_size: int, region_names: list) -> dict:
    """{region_key: (start, end)} contiguous equal slices (reference
    model_manager.py:232-238)."""
    assert latent_size % len(region_names) == 0
    size = latent_size // len(region_names)
    return {k: (i * size, (i + 1) * size)
            for i, k in enumerate(region_names)}


def _init_dense(key, n_in, n_out, dtype=jnp.float32):
    limit = float(np.sqrt(6.0 / (n_in + n_out)))
    w = jax.random.uniform(key, (n_in, n_out), dtype,
                           minval=-limit, maxval=limit)
    return {"w": w, "b": jnp.zeros((n_out,), dtype)}


def init_sdvae(key, config: SDVAEConfig, geom: SpiralGeometry) -> dict:
    chans = [config.in_channels] + list(config.out_channels)
    n_levels = len(config.out_channels)
    num_vert = geom.num_latent_vertices
    flat = num_vert * config.out_channels[-1]

    keys = jax.random.split(key, 2 * n_levels + 4)
    params = {
        "en_convs": [
            init_spiral_conv(keys[i], chans[i], chans[i + 1],
                             geom.spirals[i].seq_length)
            for i in range(n_levels)
        ],
        "mu": _init_dense(keys[n_levels], flat, config.latent_size),
        "de_dense": _init_dense(keys[n_levels + 1], config.latent_size, flat),
        # Decoder block j operates at hierarchy level (n_levels-1-j); channel
        # widths mirror the encoder (reference model.py:122-134): block 0
        # keeps the deepest width, later blocks step down the reversed list.
        "de_convs": [
            init_spiral_conv(
                keys[n_levels + 2 + j],
                config.out_channels[-1] if j == 0
                else config.out_channels[n_levels - j],
                config.out_channels[n_levels - 1 - j],
                geom.spirals[n_levels - 1 - j].seq_length)
            for j in range(n_levels)
        ],
        "final_conv": init_spiral_conv(keys[2 * n_levels + 2],
                                       chans[1], config.in_channels,
                                       geom.spirals[0].seq_length),
    }
    if config.is_vae:
        params["logvar"] = _init_dense(keys[2 * n_levels + 3], flat,
                                       config.latent_size)
    return params


def encode(params: dict, geom: SpiralGeometry, config: SDVAEConfig,
           x: jnp.ndarray):
    """Vertex-major [N, B, 3] → (mu [B, Z], logvar [B, Z] | None)."""
    h = x.astype(config.activation_dtype)
    for i, conv_p in enumerate(params["en_convs"]):
        # enblock = conv → ELU → down-select (reference model.py:58-70);
        # selection commutes with the pointwise ELU, so when the composed
        # table exists the conv runs only at the surviving vertices.
        enc = geom.enc_spirals[i] if geom.enc_spirals else None
        if enc is not None:
            h = jax.nn.elu(spiral_conv(conv_p, h, enc))
        else:
            h = pool(jax.nn.elu(spiral_conv(conv_p, h, geom.spirals[i])),
                     geom.down[i])
        if i == 0:
            # boundary of the mixed-precision policy: conv 0 gathered the
            # thin G·3 rows in activation_dtype; everything deeper gathers
            # ≥G·32 rows, where bf16 is a measured win (no-op unless mixed)
            h = h.astype(config.deep_dtype)
    # [num_vert, B, C] → [B, num_vert*C], vertex-major flatten order matches
    # the reference's [B, N, C] flatten for weight-layout parity
    h = jnp.swapaxes(h, 0, 1).reshape(h.shape[1], -1)
    h = h.astype(jnp.float32)          # latent heads in full precision
    mu = h @ params["mu"]["w"] + params["mu"]["b"]
    if config.is_vae:
        logvar = h @ params["logvar"]["w"] + params["logvar"]["b"]
        return mu, logvar
    if config.pre_z_sigmoid:
        mu = jax.nn.sigmoid(mu)
    return mu, None


def decode(params: dict, geom: SpiralGeometry, config: SDVAEConfig,
           z: jnp.ndarray) -> jnp.ndarray:
    """[B, Z] → vertex-major [N, B, 3]."""
    n_levels = len(params["de_convs"])
    num_vert = geom.num_latent_vertices
    h = z @ params["de_dense"]["w"] + params["de_dense"]["b"]
    h = h.reshape(z.shape[0], num_vert, -1)         # [B, num_vert, C]
    h = jnp.swapaxes(h, 0, 1)                       # vertex-major
    # the whole decoder (up-pools, level convs, final conv) gathers rows of
    # width ≥ G·32 — deep_dtype territory; the final conv returns its fp32
    # MXU accumulator unrounded so losses and recon see full precision
    h = h.astype(config.deep_dtype)
    for j, conv_p in enumerate(params["de_convs"]):
        level = n_levels - 1 - j
        h = pool(h, geom.up[level])
        h = spiral_conv(conv_p, h, geom.spirals[level])
        h = jax.nn.elu(h)
    if config.final_out_gather and h.dtype == jnp.bfloat16:
        # matmul-first final conv: gathers move G·3-width fp32 rows instead
        # of G·32 bf16 in both directions (the fastest measured row class)
        return spiral_conv_out_gather(params["final_conv"], h,
                                      geom.spirals[0])
    return spiral_conv(params["final_conv"], h, geom.spirals[0],
                       out_dtype=jnp.float32).astype(jnp.float32)


def reparameterize(key, mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return mu + eps * std


def forward(params: dict, geom: SpiralGeometry, config: SDVAEConfig,
            x: jnp.ndarray, key=None, training: bool = False):
    """Vertex-major in/out. Returns (reconstruction, z, mu, logvar)."""
    mu, logvar = encode(params, geom, config, x)
    if config.is_vae and training:
        z = reparameterize(key, mu, logvar)
    else:
        z = mu
    out = decode(params, geom, config, z)
    return out, z, mu, logvar
