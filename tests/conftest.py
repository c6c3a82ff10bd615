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


# ---------------------------------------------------------------------------
# Slow-test gate. The default run (`pytest tests/ -x -q`, what CI and the
# driver use) deselects these via addopts `-m "not slow"` in pyproject.toml,
# keeping the gate under ~10 minutes on one CPU; the FULL suite (the release
# gate, ~33 min) is `pytest tests/ -m "slow or not slow"`. Every entry below
# is a node whose semantics are covered more cheaply elsewhere in the
# default gate (bitwise pairwise-equality/invariance tests at multi-day
# scale, example-script smoke runs, and the 30-day-horizon goldens); the
# 10-day golden reference matches, physics acceptance tests, unit tests,
# and the multi-chip dryrun stay in the default gate. Node ids regenerated
# from `pytest tests/ -m "slow or not slow" --durations=80` (the >= ~8.5 s
# band minus keepers; 2026-08-19 profile recorded in docs/STATUS.md).
# ---------------------------------------------------------------------------
SLOW_TESTS = {
    "test_autodiff.py::test_grad_through_full_pipeline_matches_fd",
    "test_autodiff.py::test_grad_wrt_source_position",
    "test_autodiff.py::test_optimize_seeds_reaches_target",
    "test_compact_dead.py::test_checkpoint_from_different_source_config_rejected",
    "test_compact_dead.py::test_compacted_bitwise_equals_uncompacted[rk45]",
    "test_compact_dead.py::test_compacted_bitwise_equals_uncompacted[rk4]",
    "test_compact_dead.py::test_compacted_dense_mode",
    "test_compact_dead.py::test_compacted_under_mesh",
    "test_compact_dead.py::test_rootless_lanes_survive_compaction",
    "test_dense.py::test_bucketed_dense_bitwise_equals_dense",
    "test_dense.py::test_dense_bucketed_chunked_mesh_equals_single",
    "test_dense.py::test_dense_kill_masks_exact",
    "test_dense.py::test_dense_matches_exact_at_tolerance",
    "test_dense.py::test_dense_time_varying",
    "test_dense.py::test_peel_bitwise_equals_dense_chunk",
    "test_dense.py::test_peel_through_chunked_driver",
    "test_diagnostics.py::test_ensemble_api",
    "test_ensemble_rk45.py::test_ensemble_rk45_matches_separate_runs[16]",
    "test_ensemble_rk45.py::test_ensemble_rk45_matches_separate_runs[1]",
    "test_ensemble_rk45.py::test_ensemble_rk45_sharded",
    "test_ensemble_rk45.py::test_time_varying_ensemble_rk45[16]",
    "test_ensemble_rk45.py::test_time_varying_ensemble_rk45[1]",
    "test_exact_peel.py::test_exact_peel_bitwise_equals_group_chunk",
    "test_exact_peel.py::test_exact_peel_equals_fused",
    "test_exact_peel.py::test_exact_peel_through_chunked_driver",
    "test_examples.py::test_flux_diagnostics_demo",
    "test_examples.py::test_great_circle_demo_and_plot",
    "test_io_main.py::test_run_ensemble_from_file_list",
    "test_io_main.py::test_run_time_varying_background_end_to_end",
    "test_io_main.py::test_wnmaps_time_varying_through_cli_surface",
    "test_mixed_precision.py::test_mixed_precision_chunked_equals_fused",
    "test_mixed_precision.py::test_mixed_precision_reduces_f32_drift[rk45]",
    "test_mixed_precision.py::test_mixed_precision_reduces_f32_drift[rk4]",
    "test_parallel.py::test_bucketed_scheduling_bitwise_equal",
    "test_parallel.py::test_checkpoint_resume",
    "test_parallel.py::test_chunked_equals_fused[rk45]",
    "test_parallel.py::test_sharded_equals_single_device[rk45]",
    "test_parallel.py::test_sharded_equals_single_device[rk4]",
    "test_precision.py::test_f32_trajectory_drift[rk45]",
    "test_precision.py::test_f32_trajectory_drift[rk4]",
    "test_precision.py::test_f32_trajectory_drift_30day",
    "test_review_r2.py::test_load_basic_state_time_varying_roundtrip",
    "test_review_r2.py::test_streamed_history_survives_rejected_resume",
    "test_robustness.py::test_nan_hole_background_matches_reference",
    "test_robustness.py::test_random_backgrounds_nan_discipline[0-exact]",
    "test_robustness.py::test_random_backgrounds_nan_discipline[2-exact]",
    "test_robustness.py::test_random_backgrounds_nan_discipline[0-pinned]",
    "test_robustness.py::test_random_backgrounds_nan_discipline[2-pinned]",
    "test_round2_fixes.py::test_all_dead_early_stop",
    "test_round2_fixes.py::test_checkpoint_resume_time_varying",
    "test_round2_fixes.py::test_rootless_compaction_invariance[rk45]",
    "test_round2_fixes.py::test_rootless_compaction_invariance[rk4]",
    "test_round2_fixes.py::test_single_interval_run",
    "test_round2_fixes.py::test_streamed_history_equals_in_memory",
    "test_round2_fixes.py::test_termination_classify_exact",
    "test_shardmap.py::test_checkpoint_resume_under_mesh",
    "test_shardmap.py::test_chunked_rk4_under_mesh",
    "test_shardmap.py::test_chunked_shardmap_equal_single",
    "test_shardmap.py::test_gspmd_barrier_loop_would_collectivize",
    "test_shardmap.py::test_per_shard_iteration_counts_differ",
    "test_shardmap.py::test_shardmap_equal_single[16]",
    "test_shardmap.py::test_shardmap_equal_single[1]",
    "test_shardmap.py::test_time_varying_under_mesh",
    "test_solvers.py::test_amp_nan_lane_group_equals_barrier",
    "test_solvers.py::test_bucketed_chunk_bitwise_equal_and_lane_attempts",
    "test_solvers.py::test_grouped_intervals_equal_barrier",
    "test_solvers.py::test_rk4_fourth_order_convergence",
    "test_termination_rate.py::test_classify_other_rate_adaptive",
    "test_time_varying.py::test_constant_frames_equal_static[rk45]",
    "test_time_varying.py::test_constant_frames_equal_static[rk4]",
    "test_time_varying.py::test_ensemble_vmap",
    "test_trajectories.py::test_interval_batch_invariance",
    "test_trajectories.py::test_xcyclic_false_end_to_end",
    # (test_rk45_30day_north_star_gate carries an in-file slow marker)
}


def pytest_collection_modifyitems(config, items):
    slow = pytest.mark.slow
    matched = set()
    collected_files = set()
    for item in items:
        collected_files.add(item.fspath.basename)
        rel = f"{item.fspath.basename}::{item.name}"
        if rel in SLOW_TESTS:
            item.add_marker(slow)
            matched.add(rel)
    # Staleness audit (VERDICT r3 weak #4): SLOW_TESTS is a hand-maintained
    # string set, so a renamed/removed test would silently leave a dead
    # entry behind (and a typo'd new entry would silently deselect
    # nothing). Fail collection loudly when an entry names a COLLECTED
    # file but matches no collected test in it. Entries whose file was not
    # collected at all are ignored so running a subset
    # (`pytest tests/test_dense.py`) stays possible.
    # Node-id or -k selections collect only a subset of a file's tests, so
    # unmatched entries there are not evidence of staleness -- skip the
    # audit for filtered invocations.
    filtered = (config.getoption("keyword", "")
                or any("::" in a for a in config.args))
    stale = sorted(
        e for e in SLOW_TESTS - matched
        if e.split("::", 1)[0] in collected_files
    )
    if stale and not filtered:
        raise pytest.UsageError(
            "conftest SLOW_TESTS entries match no collected test "
            f"(renamed or removed?): {stale}"
        )


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
