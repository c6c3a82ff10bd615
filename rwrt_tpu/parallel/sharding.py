"""Multi-chip execution: shard the ray batch over a device mesh.

The reference is strictly single-process (SURVEY.md section 2 parallelism
checklist); its only parallel axis is numpy vectorization over rays. The
TPU-native scaling story is correspondingly simple and is implemented here:

- one mesh axis ``'rays'`` over all chips (pure data parallelism);
- the background field stack is small (nlon x nlat x 18) and REPLICATED on
  every chip;
- the (5, R) ray state and all per-ray lanes are sharded along R;
- the only communication is the implicit all-gather when trajectories are
  fetched.

The fixed-step (RK4) path is a pure elementwise scan, so jit + input
shardings are sufficient for GSPMD to partition it without collectives. The
ADAPTIVE path is NOT: its ``while_loop`` condition ``jnp.any(~done)`` is a
global reduction over the lane axis, which GSPMD would turn into a
cross-chip all-reduce on every controller iteration and couple every shard
to the globally slowest ray. The adaptive runners therefore go through
``jax.shard_map`` (tracer._run_rk45_sharded and the *_shardmap chunk
wrappers): each shard owns its lanes AND its own while_loop, the reduction
is shard-local, the compiled program contains no collectives (asserted in
tests/test_shardmap.py), and shards exit their loops independently. The
per-lane algorithm is exactly the single-device one; results differ only by
compiler codegen ULP wobble (XLA vectorizes the smaller per-shard lane
count differently), deterministic and ~7 orders below the physics gate,
with identical NaN masks. R is padded with NaN lanes (dead rays) up to a
multiple of the mesh size.
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
