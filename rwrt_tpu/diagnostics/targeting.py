"""Differentiable source targeting: which seeds reach a target point?

The WRF postprocessor answers this question retrospectively — its region
statistics report the wave sources of rays that reached the target region
(manual section 4 "Fun3" extras; ``diagnostics.flux.region_statistics``).
End-to-end differentiability (docs/DESIGN.md section 6f) answers it
prospectively: every step of prepare -> initialize -> RK4 trace is pure jnp,
so the great-circle miss distance of a ray to a target is a differentiable
function of its seed position, and seed positions can be gradient-descended
until their rays hit the target. One reverse pass replaces a
finite-difference sweep per seed coordinate.

No reference counterpart: the reference's host eigenvalue solvers and numba
kernels are opaque to autodiff (reference bs.py:38-66, wr.py:44-95), so this
capability only exists because the rebuild is differentiable end to end.

The forward model here is the fixed-step RK4 path (solvers/rk4.py): smooth,
fixed trip count, exactly the reference integrator's semantics. (The
adaptive controller's accept/reject branches make its derivative piecewise
and are not worth differentiating through for an optimization loop.)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rwrt_tpu import tracer
from rwrt_tpu.constants import pi
from rwrt_tpu.models.basic_state import BasicState
from rwrt_tpu.solvers import rk4


def _great_circle(lon, lat, lon0, lat0):
    """Central angle (radians) between (lon, lat) and the fixed point
    (lon0, lat0) — the haversine form, stable for small separations."""
    sdlat = jnp.sin(0.5 * (lat - lat0))
    sdlon = jnp.sin(0.5 * (lon - lon0))
    h = sdlat * sdlat + jnp.cos(lat) * jnp.cos(lat0) * sdlon * sdlon
    return 2.0 * jnp.arcsin(jnp.sqrt(jnp.clip(h, 0.0, 1.0)))


def miss_distance(
    bg,
    source_lon,
    source_lat,
    zwn,
    target_lon,
    target_lat,
    *,
    nt: int,
    dt,
    cut_off,
    tau: Optional[float] = None,
):
    """Per-seed miss distance (radians) to the target, differentiable.

    Traces all 3*nsource*nzwn rays with fixed-step RK4 and returns, for each
    of the nsource seeds, the minimum great-circle distance to
    (target_lon, target_lat) over every saved time, root slot, and zonal
    wavenumber. Rays dead (NaN) at a time contribute the maximum distance pi
    there, via the double-where pattern so reverse-mode gradients stay
    finite.

    tau: optional softmin temperature (radians). None = hard min (the
    gradient follows the single closest point); a small tau (~0.05) smooths
    the objective across nearby times/roots, which helps the optimizer when
    several rays are competitive.
    """
    zwn = jnp.asarray(zwn, source_lon.dtype)
    y0, _, _ = tracer.initialize(bg, source_lon, source_lat, zwn)
    ys, _, _ = rk4.trace(bg, y0, dt, nt, cut_off)
    lon_t, lat_t = ys[:, 0], ys[:, 1]  # (nt, R)
    fin = jnp.isfinite(lon_t) & jnp.isfinite(lat_t)
    lon_s = jnp.where(fin, lon_t, 0.0)
    lat_s = jnp.where(fin, lat_t, 0.0)
    d = _great_circle(lon_s, lat_s,
                      jnp.asarray(target_lon, lon_s.dtype),
                      jnp.asarray(target_lat, lon_s.dtype))
    d = jnp.where(fin, d, pi)
    nsource = source_lon.shape[0]
    d = d.reshape(nt, 3, nsource, zwn.shape[0])
    d = jnp.moveaxis(d, 2, 0).reshape(nsource, -1)  # (nsource, nt*3*nzwn)
    if tau is None:
        return d.min(axis=1)
    return -tau * jax.nn.logsumexp(-d / tau, axis=1)


class TargetingResult(NamedTuple):
    source_lon: jnp.ndarray   # (nsource,) optimized seed longitudes (rad)
    source_lat: jnp.ndarray   # (nsource,) optimized seed latitudes (rad)
    miss: jnp.ndarray         # (nsource,) final hard-min miss distance (rad)
    history: np.ndarray       # (steps+1,) mean softmin objective per step


def optimize_seeds(
    bs: BasicState,
    source_lon,
    source_lat,
    zwn,
    target_lon,
    target_lat,
    *,
    nt: int,
    dt: float = 7200.0,
    cut_off: float = 0.2,
    freq: float = 0.0,
    steps: int = 80,
    learning_rate: float = 0.02,
    tau: float = 0.05,
    lat_bound: float = 1.4,
) -> TargetingResult:
    """Gradient-descend seed positions until their rays pass the target.

    Args:
      bs: prepared (static) basic state.
      source_lon, source_lat: initial seed positions (radians).
      zwn: zonal wavenumbers to seed (each seed traces 3 roots x nzwn rays;
        a seed scores by its best ray).
      target_lon, target_lat: target point (radians).
      nt, dt, cut_off: forward-trace settings (fixed-step RK4).
      steps, learning_rate: Adam steps on the mean softmin miss distance.
      tau: softmin temperature (radians); see miss_distance.
      lat_bound: seeds are clamped to |lat| <= lat_bound after each update
        (stay off the polar cap where the background sample is masked).

    Returns TargetingResult with optimized positions, the final per-seed
    hard-min miss, and the objective history.
    """
    import optax

    if bs.fields.ndim == 4:
        raise ValueError("optimize_seeds expects a static background; take "
                         "one frame of a time-varying BasicState")
    dtype = bs.fields.dtype
    bg = tracer.make_background(bs, freq)
    slon = jnp.asarray(source_lon, dtype)
    slat = jnp.asarray(source_lat, dtype)
    kw = dict(nt=nt, dt=jnp.asarray(dt, dtype),
              cut_off=jnp.asarray(cut_off, dtype))

    def objective(params):
        d = miss_distance(bg, params["lon"], params["lat"], zwn,
                          target_lon, target_lat, tau=tau, **kw)
        return d.mean()

    opt = optax.adam(learning_rate)
    params = {"lon": slon, "lat": slat}
    state = opt.init(params)
    val_grad = jax.jit(jax.value_and_grad(objective))

    @jax.jit
    def update(params, state):
        val, g = val_grad(params)
        # A seed whose every ray is dead/rootless has zero gradient through
        # the double-where; keep NaN out of Adam regardless.
        g = jax.tree.map(jnp.nan_to_num, g)
        upd, state = opt.update(g, state, params)
        params = optax.apply_updates(params, upd)
        params["lon"] = params["lon"] % (2.0 * pi)
        params["lat"] = jnp.clip(params["lat"], -lat_bound, lat_bound)
        return params, state, val

    history = []
    for _ in range(steps):
        params, state, val = update(params, state)
        history.append(float(val))  # objective BEFORE this step's update
    # Final entry: value only (no gradient), forward pass alone.
    history.append(float(jax.jit(objective)(params)))

    final = miss_distance(bg, params["lon"], params["lat"], zwn,
                          target_lon, target_lat, tau=None, **kw)
    return TargetingResult(
        source_lon=params["lon"], source_lat=params["lat"], miss=final,
        history=np.asarray(history),
    )
