"""On-device mini-batch feature swapping — the core disentanglement trick.

The reference does this inside CPU DataLoader collate workers with nested
Python loops over numpy copies (swap_batch_transform.py:13-52): a batch of B
meshes becomes B² meshes where grid element (i, j) is mesh i with one
anatomical region's vertices replaced by mesh j's. On TPU this is a single
fused broadcast + select, so it runs inside the jitted train step at HBM
speed and the host pipeline only ever ships B meshes per step.

Grid layout matches the reference exactly: row i·B+j = identity i, donor j;
diagonal rows are the originals (which keep their labels downstream).
Operands are vertex-major [N, B, 3] like the rest of the compute path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["swap_features", "swap_features_dynamic", "choose_region"]


@jax.jit
def swap_features(x: jnp.ndarray, region_mask: jnp.ndarray) -> jnp.ndarray:
    """Vertex-major [N, B, 3], [N] bool → [N, B², 3] swap grid.

    out[:, i·B+j] = where(region_mask, x[:, j], x[:, i]).
    """
    xi = x[:, :, None, :]                    # identity  [N, B, 1, 3]
    xj = x[:, None, :, :]                    # donor     [N, 1, B, 3]
    grid = jnp.where(region_mask[:, None, None, None], xj, xi)
    return grid.reshape(x.shape[0], -1, x.shape[-1])


def choose_region(key, num_regions: int) -> jnp.ndarray:
    """Uniformly sample the region to swap this step (reference picks one
    random region per batch, swap_batch_transform.py:26)."""
    return jax.random.randint(key, (), 0, num_regions)


@jax.jit
def swap_features_dynamic(x: jnp.ndarray, region_masks: jnp.ndarray,
                          region_idx: jnp.ndarray) -> jnp.ndarray:
    """Swap with a traced region index into the [R, N] stacked masks —
    keeps the train step a single compiled program across regions."""
    mask = jnp.take(region_masks, region_idx, axis=0)
    return swap_features(x, mask)
