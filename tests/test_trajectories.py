"""End-to-end golden trajectory tests against the reference integrators.

The reference's root-slot ordering depends on its eigenvalue solver (see
ops/cubic.py docstring), so trajectories are compared per (source, zwn) after
matching root slots by their initial meridional wavenumber. The acceptance
gate from BASELINE.md is position RMSE < 0.1 deg; with both sides in float64
the agreement should be far tighter.
"""

import numpy as np
import pytest

import rwrt_tpu as rt
from rwrt_tpu.config import RunConfig

from refshim import run_reference_wr

HOUR = 3600.0
DAY = 86400.0

CASE = dict(
    zwn=(2.0, 4.0, 6.0),
    sw_lon=0.0, sw_lat=10.0, dlon=120.0, dlat=15.0, nnx=3, nny=3,
    tstep=2 * HOUR, ttotal=10 * DAY,
)


@pytest.fixture(scope="module")
def ours_bs(jet_field):
    u, v, lat, lon = jet_field
    return rt.prepare(u, v, lat, lon, xcyclic=True,
                      read_dtype="float32", cal_dtype="float64")


def _match_slots(ref_m0, our_m0):
    """Permutation p such that our slot p[i] pairs with ref slot i."""
    perm = [-1, -1, -1]
    used = set()
    for i in range(3):
        rv = ref_m0[i]
        best, best_d = -1, np.inf
        for j in range(3):
            if j in used:
                continue
            ov = our_m0[j]
            if np.isnan(rv) and np.isnan(ov):
                d = 0.0
            elif np.isnan(rv) or np.isnan(ov):
                d = np.inf
            else:
                d = abs(rv - ov)
            if d < best_d:
                best, best_d = j, d
        perm[i] = best
        used.add(best)
    return perm


def _per_sample_err(ref_wr, traj):
    """Slot-matched per-sample position error in degrees (small-separation
    equirectangular approximation sqrt(dlat^2 + (dlon*cos(ref_lat))^2), the
    same metric _compare uses -- not a true great-circle distance).

    Returns (err (nt, 3, nsource, nzwn) with NaN where either side is dead,
    mask_divergence fraction) — the decomposition inputs for chaos-dominated
    horizons (cf. test_precision.py::test_f32_trajectory_drift_30day)."""
    nt, _, nsource, nzwn = ref_wr.rlon.shape
    ref_lon, ref_lat = np.asarray(ref_wr.rlon), np.asarray(ref_wr.rlat)
    ref_m = np.asarray(ref_wr.rmwn)
    our_lon, our_lat = np.asarray(traj.lon), np.asarray(traj.lat)
    our_m = np.asarray(traj.ky)
    err = np.full((nt, 3, nsource, nzwn), np.nan)
    mism, total = 0, 0
    for s in range(nsource):
        for z in range(nzwn):
            perm = _match_slots(ref_m[0, :, s, z], our_m[0, :, s, z])
            for i in range(3):
                j = perm[i]
                rl, ro = ref_lat[:, i, s, z], our_lat[:, j, s, z]
                gl, go = ref_lon[:, i, s, z], our_lon[:, j, s, z]
                both = np.isfinite(rl) & np.isfinite(ro)
                mism += int(np.sum(np.isfinite(rl) != np.isfinite(ro)))
                total += nt
                dlat = rl - ro
                dlon = (gl - go + np.pi) % (2 * np.pi) - np.pi
                e = np.degrees(np.sqrt(dlat**2 + (dlon * np.cos(rl)) ** 2))
                err[:, i, s, z] = np.where(both, e, np.nan)
    return err, mism / total


def _compare(ref_wr, traj, rmse_deg_gate=1e-3, nan_mismatch_frac=0.02):
    nt, _, nsource, nzwn = ref_wr.rlon.shape
    ref_lon = np.asarray(ref_wr.rlon)
    ref_lat = np.asarray(ref_wr.rlat)
    ref_m = np.asarray(ref_wr.rmwn)
    our_lon = np.asarray(traj.lon)
    our_lat = np.asarray(traj.lat)
    our_m = np.asarray(traj.ky)

    sq_sum, n_pts, nan_mismatch, total = 0.0, 0, 0, 0
    for s in range(nsource):
        for z in range(nzwn):
            perm = _match_slots(ref_m[0, :, s, z], our_m[0, :, s, z])
            for i in range(3):
                j = perm[i]
                rl, ro = ref_lat[:, i, s, z], our_lat[:, j, s, z]
                gl, go = ref_lon[:, i, s, z], our_lon[:, j, s, z]
                both = np.isfinite(rl) & np.isfinite(ro)
                nan_mismatch += int(np.sum(np.isfinite(rl) != np.isfinite(ro)))
                total += nt
                if both.any():
                    dlat = rl[both] - ro[both]
                    dlon = (gl[both] - go[both] + np.pi) % (2 * np.pi) - np.pi
                    sq_sum += float(np.sum(dlat**2 + (dlon * np.cos(rl[both])) ** 2))
                    n_pts += int(both.sum())
    rmse_deg = np.degrees(np.sqrt(sq_sum / max(n_pts, 1)))
    frac = nan_mismatch / total
    assert n_pts > 0
    assert rmse_deg < rmse_deg_gate, f"trajectory RMSE {rmse_deg} deg"
    assert frac < nan_mismatch_frac, f"alive/dead mismatch fraction {frac}"
    return rmse_deg, frac


def test_rk4_trajectories_match_reference(jet_field, ours_bs):
    u, v, lat, lon = jet_field
    ref = run_reference_wr(u, v, lat, lon, inte_method="", **CASE)
    cfg = RunConfig(
        zwn=CASE["zwn"], sw_lon=CASE["sw_lon"], sw_lat=CASE["sw_lat"],
        dlon=CASE["dlon"], dlat=CASE["dlat"], nnx=CASE["nnx"], nny=CASE["nny"],
        tstep=CASE["tstep"], ttotal=CASE["ttotal"],
        integrator="rk4", cal_dtype="float64",
    )
    traj = rt.trace_rays(ours_bs, cfg)
    rmse, frac = _compare(ref, traj)
    print(f"RK4 RMSE {rmse:.2e} deg, nan mismatch {frac:.3%}")


def test_rk45_trajectories_match_reference(jet_field, ours_bs):
    u, v, lat, lon = jet_field
    ref = run_reference_wr(u, v, lat, lon, inte_method="rk45", **CASE)
    cfg = RunConfig(
        zwn=CASE["zwn"], sw_lon=CASE["sw_lon"], sw_lat=CASE["sw_lat"],
        dlon=CASE["dlon"], dlat=CASE["dlat"], nnx=CASE["nnx"], nny=CASE["nny"],
        tstep=CASE["tstep"], ttotal=CASE["ttotal"],
        integrator="rk45", cal_dtype="float64",
    )
    traj = rt.trace_rays(ours_bs, cfg)
    rmse, frac = _compare(ref, traj, rmse_deg_gate=0.01)
    print(f"RK45 RMSE {rmse:.2e} deg, nan mismatch {frac:.3%}")


def test_rk4_amp_and_wavenumbers_match(jet_field, ours_bs):
    u, v, lat, lon = jet_field
    ref = run_reference_wr(u, v, lat, lon, inte_method="", **CASE)
    cfg = RunConfig(
        zwn=CASE["zwn"], sw_lon=CASE["sw_lon"], sw_lat=CASE["sw_lat"],
        dlon=CASE["dlon"], dlat=CASE["dlat"], nnx=CASE["nnx"], nny=CASE["nny"],
        tstep=CASE["tstep"], ttotal=CASE["ttotal"],
        integrator="rk4", cal_dtype="float64",
    )
    traj = rt.trace_rays(ours_bs, cfg)
    ref_m = np.asarray(ref.rmwn)
    nt, _, ns, nz = ref_m.shape
    our = {k: np.asarray(getattr(traj, k)) for k in ("ky", "amp", "ug", "vg")}
    refd = {"ky": ref_m, "amp": np.asarray(ref.ramp),
            "ug": np.asarray(ref.rug), "vg": np.asarray(ref.rvg)}
    errs = []
    for s in range(ns):
        for z in range(nz):
            perm = _match_slots(ref_m[0, :, s, z], our["ky"][0, :, s, z])
            for i in range(3):
                j = perm[i]
                for k in our:
                    a, b = refd[k][:, i, s, z], our[k][:, j, s, z]
                    both = np.isfinite(a) & np.isfinite(b)
                    if both.any():
                        scale = np.max(np.abs(a[both])) + 1e-12
                        errs.append(np.max(np.abs(a[both] - b[both])) / scale)
    assert max(errs) < 1e-3, f"max relative field error {max(errs)}"


def test_nonstationary_rk4_matches_reference(jet_field, ours_bs):
    """freq != 0 (non-stationary waves): the ps = freq/k*R term enters the
    dispersion cubic and the RHS; golden comparison vs the reference."""
    freq = -1.0 / (5.0 * DAY)  # the commented reference example, main_wr.py:64
    case = dict(CASE)
    case["ttotal"] = 6 * DAY
    u, v, lat, lon = jet_field
    ref = run_reference_wr(u, v, lat, lon, inte_method="", freq=freq, **case)
    cfg = RunConfig(
        zwn=case["zwn"], sw_lon=case["sw_lon"], sw_lat=case["sw_lat"],
        dlon=case["dlon"], dlat=case["dlat"], nnx=case["nnx"], nny=case["nny"],
        tstep=case["tstep"], ttotal=case["ttotal"], freq=freq,
        integrator="rk4", cal_dtype="float64",
    )
    traj = rt.trace_rays(ours_bs, cfg)
    rmse, frac = _compare(ref, traj)
    print(f"nonstationary RK4 RMSE {rmse:.2e} deg, nan mismatch {frac:.3%}")


def test_xcyclic_false_end_to_end(jet_field):
    """Full pipeline with xcyclic=False: no wrap column on the field stack
    (reference bs.py:318, 370-372), so rays in the final longitude wedge
    [lon[-1], 360) sample the clipped-corner extrapolation instead of the
    periodic interpolation. Golden comparison vs the reference run with the
    same flag; sw_lon=-5 puts a source column at 355 deg E, inside the
    final dx=5 deg wedge, so the non-cyclic gather path is genuinely hit."""
    u, v, lat, lon = jet_field
    case = dict(CASE, ttotal=5 * DAY, sw_lon=-5.0)
    ref = run_reference_wr(u, v, lat, lon, inte_method="", xcyclic=False,
                           **case)
    bs = rt.prepare(u, v, lat, lon, xcyclic=False,
                    read_dtype="float32", cal_dtype="float64")
    cfg = RunConfig(
        zwn=case["zwn"], sw_lon=case["sw_lon"], sw_lat=case["sw_lat"],
        dlon=case["dlon"], dlat=case["dlat"], nnx=case["nnx"],
        nny=case["nny"], tstep=case["tstep"], ttotal=case["ttotal"],
        integrator="rk4", cal_dtype="float64", xcyclic=False,
    )
    traj = rt.trace_rays(bs, cfg)
    rmse, frac = _compare(ref, traj)
    print(f"xcyclic=False RK4 RMSE {rmse:.2e} deg, nan mismatch {frac:.3%}")

    # And the adaptive path through the same non-cyclic stack.
    ref45 = run_reference_wr(u, v, lat, lon, inte_method="rk45",
                             xcyclic=False, **case)
    cfg45 = RunConfig(
        zwn=case["zwn"], sw_lon=case["sw_lon"], sw_lat=case["sw_lat"],
        dlon=case["dlon"], dlat=case["dlat"], nnx=case["nnx"],
        nny=case["nny"], tstep=case["tstep"], ttotal=case["ttotal"],
        integrator="rk45", cal_dtype="float64", xcyclic=False,
    )
    traj45 = rt.trace_rays(bs, cfg45)
    rmse45, frac45 = _compare(ref45, traj45, rmse_deg_gate=0.01)
    print(f"xcyclic=False RK45 RMSE {rmse45:.2e} deg, "
          f"nan mismatch {frac45:.3%}")


def test_interval_batch_invariance(jet_field, ours_bs):
    """trace_rays results must be identical for any interval_batch (the
    grouped runner incl. its padded-tail bounds vs the barrier runner)."""
    base = dict(
        zwn=(2.0, 5.0), sw_lon=0.0, sw_lat=10.0, dlon=120.0, dlat=15.0,
        nnx=2, nny=2, tstep=2 * HOUR, ttotal=5 * DAY,  # 60 bounds
        integrator="rk45", cal_dtype="float64",
    )
    a = rt.trace_rays(ours_bs, RunConfig(interval_batch=1, **base))
    for batch in (7, 16, 60):
        b = rt.trace_rays(ours_bs, RunConfig(interval_batch=batch, **base))
        for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
            np.testing.assert_allclose(
                np.asarray(getattr(a, k)), np.asarray(getattr(b, k)),
                rtol=0, atol=0, equal_nan=True,
                err_msg=f"batch={batch} field={k}",
            )


@pytest.mark.slow
def test_rk45_30day_north_star_gate(jet_field, ours_bs):
    """The BASELINE.md north-star accuracy gate at its own horizon: 30
    model days, adaptive RK45, position RMSE vs the reference < 0.1 deg.

    Both sides run float64 — the gate is an integrator-parity statement
    and must be measured at matched precision; the f32 bench dtype's drift
    at this horizon is quantified separately
    (test_precision.py::test_f32_trajectory_drift_30day)."""
    u, v, lat, lon = jet_field
    case = dict(CASE, ttotal=30 * DAY)
    ref = run_reference_wr(u, v, lat, lon, inte_method="rk45", **case)
    cfg = RunConfig(
        zwn=case["zwn"], sw_lon=case["sw_lon"], sw_lat=case["sw_lat"],
        dlon=case["dlon"], dlat=case["dlat"], nnx=case["nnx"],
        nny=case["nny"], tstep=case["tstep"], ttotal=case["ttotal"],
        integrator="rk45", cal_dtype="float64",
    )
    traj = rt.trace_rays(ours_bs, cfg)
    rmse, frac = _compare(ref, traj, rmse_deg_gate=0.1)
    print(f"30-day RK45 RMSE {rmse:.2e} deg, nan mismatch {frac:.3%}")

    # The free-stepping dense-output mode (the bench's throughput path)
    # integrates to the REQUESTED tolerance instead of the exact path's
    # bound-clamped over-resolution, so its tolerance-level perturbation is
    # amplified by ray chaos at this horizon exactly like the f32 drift
    # (measured e-folding ~8 days; test_precision.py::
    # test_f32_trajectory_drift_30day establishes the decomposition): a
    # whole-horizon whole-batch RMSE gate is not meaningful. Gate the same
    # honest decomposition vs the SAME reference oracle (reused — it
    # dominates the cost): day-10 RMSE inside the acceptance gate before
    # chaos takes over, tiny median per-sample drift over the full 30 days,
    # bounded alive-mask divergence.
    cfg_dense = RunConfig(
        zwn=case["zwn"], sw_lon=case["sw_lon"], sw_lat=case["sw_lat"],
        dlon=case["dlon"], dlat=case["dlat"], nnx=case["nnx"],
        nny=case["nny"], tstep=case["tstep"], ttotal=case["ttotal"],
        integrator="rk45", cal_dtype="float64", bound_mode="dense",
        interval_batch=16,
    )
    traj_d = rt.trace_rays(ours_bs, cfg_dense)
    err, mask_div = _per_sample_err(ref, traj_d)
    it10 = int(round(10 * DAY / case["tstep"]))  # day 10 at the cadence
    e10 = err[: it10 + 1][np.isfinite(err[: it10 + 1])]
    rmse10 = float(np.sqrt(np.mean(e10**2)))
    med = float(np.nanmedian(err))
    print(f"30-day dense RK45: day-10 RMSE {rmse10:.2e} deg, 30-day "
          f"median {med:.2e} deg, mask divergence {mask_div:.3%}")
    assert rmse10 < 0.1, f"dense day-10 RMSE {rmse10} deg"
    assert med < 0.05, f"dense 30-day median drift {med} deg"
    assert mask_div < 0.05, f"alive-mask divergence {mask_div:.3%}"
