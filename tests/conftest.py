"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Must set XLA flags before jax initializes (multi-chip sharding tests run on a
virtual CPU mesh; float64 gives bit-parity headroom for golden tests against
the float64 reference).
"""

import os

# Defensive headroom: the default 8 MiB stack is marginal for XLA:CPU's
# compilation of the largest programs here (the sharded chunked adaptive
# runner compiles a deep shard_map/while_loop/scan nest). The hard limit is
# unlimited in this environment, so raise the soft limit; the main-thread
# stack grows on demand up to the soft limit at fault time. (This alone did
# not cure the full-suite compile segfault investigated in round 2 -- see
# the module-isolation fixture below -- but deep-recursion headroom is
# cheap and removes one failure mode; the actual cure is the
# clear_caches fixture at the top of tests/test_shardmap.py.)
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 512 * 1024 * 1024
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        _new = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
        resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))
except (ImportError, ValueError, OSError):  # pragma: no cover
    pass

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel
# AND its sitecustomize imports jax at interpreter start, overriding the env
# var via jax.config — so the config must be re-overridden after import.
# Tests need float64 bit-parity with the reference and a virtual 8-device
# mesh, both CPU-only features here.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _bound_live_executables():
    """Release compiled executables at every module boundary.

    XLA:CPU's backend_compile segfaults deterministically once enough
    compiled executables accumulate in one process (round-2 investigation,
    docs/STATUS.md "Full-suite stability"): the crash site is whichever
    large compile happens to cross the threshold, so it MOVES as test
    modules are added (first test_shardmap's sharded chunked-resume
    compile, later test_round2_fixes once test_compact_dead and the
    spectral-sampler tests grew the suite). Clearing per module bounds the
    live-executable count regardless of suite size; the recompile cost is
    per-module programs only (modules rarely share jitted shapes).
    """
    jax.clear_caches()
    yield


@pytest.fixture(scope="session")
def jet_field():
    """Synthetic zonally-varying jet background used across golden tests."""
    nlon, nlat = 72, 37
    lat = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    lon = np.arange(nlon) * 2 * np.pi / nlon
    u = (
        20.0 * np.cos(lat)[None, :] ** 2
        + 8.0 * np.cos(2 * lon)[:, None] * np.cos(lat)[None, :] ** 2
        + 25.0 * np.exp(-(((np.degrees(lat)[None, :] - 40.0) / 12.0) ** 2))
    )
    v = 3.0 * np.sin(lon)[:, None] * np.cos(lat)[None, :]
    return u.astype(np.float64), v.astype(np.float64), lat, lon
