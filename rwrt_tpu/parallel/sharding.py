"""Multi-chip execution: shard the ray batch over a device mesh.

The reference is strictly single-process (SURVEY.md section 2 parallelism
checklist); its only parallel axis is numpy vectorization over rays. The
TPU-native scaling story is correspondingly simple and is implemented here:

- one mesh axis ``'rays'`` over all chips (pure data parallelism);
- the background field stack is small (nlon x nlat x 18) and REPLICATED on
  every chip;
- the (5, R) ray state and all per-ray lanes are sharded along R;
- the hot loop needs NO collectives (every ray is independent: the RHS is a
  gather from the replicated background plus elementwise algebra); the only
  communication is the implicit all-gather when trajectories are fetched.

Because the computation is elementwise along R, jit + input shardings are
sufficient for GSPMD to partition the whole scan/while_loop program without
any resharding; ``shard_map`` is unnecessary. R is padded with NaN lanes
(dead rays) up to a multiple of the mesh size.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the first n_devices local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def ray_sharding(mesh: Mesh, state_ndim: int = 2) -> NamedSharding:
    """Sharding for an array whose LAST axis is the ray axis."""
    spec = P(*([None] * (state_ndim - 1) + [RAY_AXIS]))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_rays(y: jax.Array, n_shards: int):
    """Pad the trailing ray axis with NaN lanes to a multiple of n_shards.

    Returns (padded, original_R). NaN lanes behave exactly like dead rays.
    """
    r = y.shape[-1]
    pad = (-r) % n_shards
    if pad == 0:
        return y, r
    widths = [(0, 0)] * (y.ndim - 1) + [(0, pad)]
    import jax.numpy as jnp

    return jnp.pad(y, widths, constant_values=jnp.nan), r


def shard_rays(y: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a ray-batched array (ray axis last) onto the mesh."""
    return jax.device_put(y, ray_sharding(mesh, y.ndim))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. the Background) on every device."""
    return jax.device_put(tree, replicated(mesh))
