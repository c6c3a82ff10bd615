"""Typed run configuration.

Replaces the reference's plain parameter dict splatted into the entry function
(reference main_wr.py:5-30). Same knobs, validated, with TPU-relevant
additions (compute dtype, sharding mesh shape).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from rwrt_tpu.constants import day, hour


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """Configuration for a ray-tracing run (reference main_wr.py:5-30)."""

    # Wave frequency in rad/s; 0 = stationary Rossby waves.
    freq: float = 0.0
    # Initial zonal wavenumbers (dimensionless k*R).
    zwn: Sequence[float] = (1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0)
    # Source matrix: SW corner (degrees), spacing (degrees), counts.
    sw_lon: float = 70.0
    sw_lat: float = -4.0
    dlon: float = 4.0
    dlat: float = 2.0
    nnx: int = 21
    nny: int = 15
    # Time stepping.
    tstep: float = 2.0 * hour        # seconds
    ttotal: float = 90.0 * day       # seconds
    # Integrator: 'rk4' (fixed step) or 'rk45' (adaptive Dormand-Prince).
    integrator: str = "rk4"
    # Adaptive-solver controls (reference main_wr.py:27-29, wr.py:168-171).
    rtol: float = 1e-6
    atol: float = 1e-6
    min_step_factor: float = 1e-3
    # Output intervals advanced per device loop (solvers/rk45.py
    # integrate_group). >1 removes the per-interval straggler barrier;
    # results are bit-identical for any value (tests/test_solvers.py).
    interval_batch: int = 16
    # Output-bound handling for the grouped adaptive path:
    #   'exact': every step clamps at every output bound (the reference's
    #     semantics, wr.py:808-830; bit-reproducible against the barrier
    #     path). Because ~95% of lanes have an error-limited step LARGER
    #     than the 2 h output cadence (median 14 h on the north-star
    #     workload), the clamp makes them integrate far below the requested
    #     tolerance at ~4.5x the cost.
    #   'dense': steps fly past bounds (clamping only at chunk boundaries)
    #     and output states come from the Dormand-Prince quartic dense-
    #     output interpolant -- scipy's solve_ivp(t_eval=...) treatment.
    #     Delivers the REQUESTED tolerance (measured 3e-3 deg at rtol=1e-6
    #     over 10 days vs the 0.1 deg acceptance gate; the exact mode's
    #     over-resolved 1e-4 deg is recovered by tightening rtol).
    #     Termination masks are applied per bound over the emitted history
    #     (identical semantics; kill timing can differ at tolerance level).
    bound_mode: str = "exact"
    # Peel scheduling (chunked driver, single device): run the whole batch
    # for a capped number of while-iterations, compact the lanes that
    # actually did not finish into a power-of-two sub-batch, continue (next
    # cap), and finish the last survivors uncapped. Bitwise equal to the
    # unpeeled chunk in BOTH bound modes; the straggler tail stops taxing
    # the full batch width (~3x fewer lane-iteration units in dense mode,
    # and in exact mode it removes a >10x cost cliff when late-run lanes
    # pin near the step floor). peel_caps applies to dense mode (caps are
    # while-iterations per chunk of free stepping); peel_caps_exact applies
    # to exact mode, whose iteration counts scale with the chunk length --
    # None (the default) derives (4g, 16g, 64g) from the chunk's bound
    # count g (see tracer._rk45_group_chunk_peeled). Any caps value is
    # bitwise-equal; these knobs are cost tuning only.
    peel: bool = True
    peel_caps: Sequence[int] = (24, 96)
    peel_caps_exact: Optional[Sequence[int]] = None
    # Straggler PHYSICAL retirement for bound_mode='dense' (the schedulers
    # above only work AROUND a pinned lane; this retires it). A lane
    # grinding toward a critical layer (Ks -> zwn, u -> 0) has |l| -> inf
    # and group speed -> 0: the reference kills it only at |l| >= 100
    # (wr.py:509) after thousands of error-controlled near-floor steps
    # (measured ~7000 step attempts per 60-bound chunk vs a lane-median of
    # ~10 -- the late-run straggler tail). pin_limit (int) NaN-retires a
    # lane once its per-chunk step-attempt count (lane_att, the cost
    # signal the peel/bucketed schedulers already track) reaches that
    # budget, but only while |l| >= pin_mwn, i.e. well past any
    # recoverable excursion and already on the one-way grind to the |l|
    # cap; the kill reuses the ordinary NaN death path, so emitted samples
    # before retirement are untouched. None (the default) disables the
    # knob entirely and the dense path is bitwise-identical to earlier
    # releases. Changes OUTPUT only by ending a doomed lane's trajectory a
    # few output intervals before the |l| cap would (gated in
    # tests/test_pin_kill.py); flux/wavenumber diagnostics at default
    # thresholds are unaffected (that lane's group speed is below any Fun1
    # threshold long before pinning). Calibrate with
    # benchmarks/straggler_probe.py; note the budget scales with the
    # chunk's bound count (the counter resets at chunk entry).
    pin_limit: Optional[int] = None
    pin_mwn: float = 50.0
    # Difficulty-bucketed lane scheduling for the grouped adaptive path
    # (tracer._rk45_group_chunk_bucketed): lanes sorted by the previous
    # chunk's per-lane attempt count run as this many equal slices, each its
    # own while_loop, so easy lanes stop paying the straggler's iterations.
    # Bit-identical per lane for any value; 1 disables. Applied when the
    # device batch has at least 8 * difficulty_buckets lanes.
    difficulty_buckets: int = 1
    # Displacement kill threshold, radians per tstep-hour (wr.py:170).
    cut_off: float = 0.1
    # Root-slot layout of the output arrays: 'canonical' sorts the initial
    # meridional-wavenumber roots (non-negative first, by |m|; stable and
    # backend-independent) while 'fortran' applies the reference's
    # change_roots_order shuffle + reversal on top (reference bs.py:942-982)
    # so output files are slot-comparable with reference runs.
    root_order: str = "canonical"
    # Drop never-born (rootless) lanes from the device batch at
    # initialization. Typically ~40% of the 3*nsource*nzwn lanes have no
    # real dispersion root; the integrators freeze them anyway (their
    # history rows are their seed state + NaN wavenumber/amp/ug/vg forever),
    # so their trajectories are reconstructed on host for free while the hot
    # loop shrinks by the rootless fraction.
    compact_rootless: bool = True
    # Drop dead lanes from the device batch at chunk boundaries of the
    # chunked driver (trace_rays_chunked). A lane whose EMITTED position has
    # gone NaN was killed (|lat|, displacement, or wavenumber-runaway mask)
    # and emits NaN at every remaining output bound in both integrators
    # (reference terminate_ray semantics, bs.py:456-459), so dropping it is
    # exact: its history rows are already the NaN prefill. The batch width
    # shrinks along a power-of-two ladder (dead lanes pad to the next rung,
    # so recompiles stay logarithmic in the death count); lanes frozen at a
    # FINITE state (rootless lanes, amp-only NaN overflow) keep emitting
    # that state and are never dropped. In a 90-day default run most rays
    # die well before the end, so the late chunks run at a fraction of the
    # seed width.
    compact_dead: bool = True
    # Background handling.
    xcyclic: bool = True
    # Time-varying background (BASELINE.json config 4): when the input wind
    # is 3-D (time, lat, lon), these give the model time of frame 0 and the
    # frame spacing in seconds. bg_dt=0 means "take frame times from the
    # input file's time variable" (which must then exist and be uniform,
    # in seconds). Ignored for 2-D (static) inputs.
    bg_t0: float = 0.0
    bg_dt: float = 0.0
    # Optional spherical-harmonic smoothing of the input wind at ingest
    # (the reference's offline SHSF preprocessing step, SHSF.py:10-33 /
    # manual section 7: triangular truncation at this degree; the manual's
    # example uses 180/dlat_deg - 1). None = no smoothing.
    # shsf_mode: 'projection' (any uniform grid) or 'dh' (exact Driscoll &
    # Healy quadrature, pyshtools SHExpandDH semantics, DH grids only).
    shsf_truncation: Optional[int] = None
    shsf_mode: str = "projection"
    # Bilinearly regrid the input wind onto the uniform global grid at
    # ingest (models.basic_state.regrid_to_uniform) — for Gaussian/regional
    # grids that `prepare` refuses. Applied before shsf smoothing.
    regrid: bool = False
    # dtypes: read (ingest) and compute.
    read_dtype: str = "float32"
    cal_dtype: str = "float32"
    # Integrated-state dtype: 'compute' (= cal_dtype, the default) or
    # 'float64' for mixed precision -- the background sample and RHS algebra
    # stay in cal_dtype (the throughput path), while the state accumulation
    # y + h*sum(b_i k_i) and the controller's (t, h) run in float64,
    # removing the dominant f32 error source (per-step state rounding
    # compounding through chaotic dynamics; docs/DESIGN.md section 7).
    # Requires jax_enable_x64 when 'float64'.
    state_dtype: str = "compute"
    # Devices along the ray-sharding mesh axis; None = all local devices.
    mesh_devices: Optional[int] = None

    @property
    def nt(self) -> int:
        # reference wr.py:157
        return int(self.ttotal / self.tstep) + 1

    @property
    def nsource(self) -> int:
        return self.nnx * self.nny

    @property
    def nzwn(self) -> int:
        return len(self.zwn)

    @property
    def cut_off_rad(self) -> float:
        # reference wr.py:170: cut_off * tstep / 3600
        return self.cut_off * self.tstep / 3600.0

    def zwn_array(self) -> np.ndarray:
        return np.asarray(self.zwn, dtype=self.cal_dtype)

    def validate(self) -> "RunConfig":
        if self.integrator not in ("rk4", "rk45"):
            raise ValueError(f"unknown integrator {self.integrator!r}")
        if self.root_order not in ("canonical", "fortran"):
            raise ValueError(f"unknown root_order {self.root_order!r}")
        if self.state_dtype not in ("compute", "float64"):
            raise ValueError(f"unknown state_dtype {self.state_dtype!r}")
        if self.nnx * self.nny < 1:
            raise ValueError("empty source matrix")
        lat_ends = (self.sw_lat, self.sw_lat + (self.nny - 1) * self.dlat)
        # reference wr.py:246-247 checks only the northern end; negative
        # dlat / deep-south sw_lat must not slip sources past the pole.
        if max(lat_ends) > 89.0 or min(lat_ends) < -89.0:
            raise ValueError("source latitude out of -90~90 range!")
        if self.tstep <= 0 or self.ttotal <= 0:
            raise ValueError("tstep and ttotal must be positive")
        if len(self.zwn) == 0:
            raise ValueError("zwn must name at least one zonal wavenumber")
        if self.rtol <= 0 or self.atol <= 0:
            raise ValueError("rtol and atol must be positive")
        if self.interval_batch < 1:
            raise ValueError("interval_batch must be >= 1")
        if self.min_step_factor < 0 or self.cut_off < 0:
            raise ValueError("min_step_factor and cut_off must be >= 0")
        if self.difficulty_buckets < 1:
            raise ValueError("difficulty_buckets must be >= 1")
        for name in ("peel_caps", "peel_caps_exact"):
            caps = getattr(self, name)
            if caps is None:
                continue
            caps = tuple(int(c) for c in caps)
            if any(c < 1 for c in caps) or list(caps) != sorted(set(caps)):
                raise ValueError(
                    f"{name} must be strictly increasing positive ints, "
                    f"got {tuple(getattr(self, name))!r}")
        if self.bg_dt < 0:
            raise ValueError("bg_dt must be >= 0 (seconds between frames)")
        if self.shsf_truncation is not None and self.shsf_truncation < 1:
            raise ValueError("shsf_truncation must be >= 1 (or None)")
        if self.shsf_mode not in ("projection", "dh"):
            raise ValueError(f"unknown shsf_mode {self.shsf_mode!r}")
        if self.bound_mode not in ("exact", "dense"):
            raise ValueError(f"unknown bound_mode {self.bound_mode!r}")
        if self.bound_mode == "dense":
            # Dense output exists only on the grouped adaptive path; every
            # other route clamps at each bound (exact semantics). Reject the
            # combination instead of silently running exact mode at exact-
            # mode cost while the user expects dense.
            if self.integrator != "rk45":
                raise ValueError(
                    "bound_mode='dense' requires integrator='rk45'")
            if self.interval_batch <= 1 or self.nt <= 2:
                raise ValueError(
                    "bound_mode='dense' runs on the grouped adaptive path, "
                    "which needs interval_batch > 1 and nt > 2 (got "
                    f"interval_batch={self.interval_batch}, nt={self.nt}); "
                    "use bound_mode='exact' for these settings")
        if self.pin_limit is not None:
            if self.bound_mode != "dense":
                # Implemented on the dense integrator only (the headline
                # mode; exact mode's grind is the same physics but its
                # integrator does not carry the floor counter). Reject
                # rather than silently ignore.
                raise ValueError(
                    "pin_limit is implemented for bound_mode='dense' only")
            if int(self.pin_limit) < 1:
                raise ValueError("pin_limit must be a positive int")
            from rwrt_tpu.constants import mwn_cap

            # 0 is allowed and is the MEASURED production recommendation
            # (attempts-only gating): round 4's skew probe showed real
            # grinders hold |l| ~ 0.001-6.5 through their entire grind --
            # an |l| threshold >= 1 never fires on them (two chunks ground
            # 1M+ loop trips bit-identically to unpinned with the gate at
            # 1.0), so the attempt budget alone is the effective gate
            # (benchmarks/MEASUREMENTS.md, multichip_skew_* artifacts).
            if not (0 <= float(self.pin_mwn) <= mwn_cap):
                raise ValueError(
                    f"pin_mwn must be in [0, {mwn_cap}] (the reference's "
                    f"|m| kill cap; 0 = attempts-only gating), "
                    f"got {self.pin_mwn}")
        return self
