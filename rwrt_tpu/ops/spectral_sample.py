"""Tensor-product spectral background sampling: gather -> matmul (MXU).

The hot loop's background sample is a bilinear gather, and on TPU gathers
lower to per-row scalar-core work (docs/DESIGN.md section 4): cost tracks row
count, not FLOPs. This module implements the alternative the round-1 review
asked for — "replace gather with MXU work by evaluating the background from a
tensor-product basis ... sampling becomes batched matmuls" — as an opt-in
sampler with the same calling convention as ``ops.interp.sample_raw``.

Representation.  Each field channel of the basic-state stack (reference
bs.py:349-372; models/basic_state.py FIELD_NAMES order) is expanded in a
tensor-product basis that is EXACT on the stack's own uniform grid at full
truncation:

    f(lon, lat) = sum_{m=0}^{M} sum_{l=0}^{L-1}
        [a_{ml} cos(m lon) + b_{ml} sin(m lon)] * cos(l * (lat - lat0))

- longitude: real Fourier series (the grid is periodic; the reference's wrap
  column, bs.py:370-372, becomes unnecessary — the basis is periodic by
  construction, so no index clamping or lon wrapping exists in this sampler);
- latitude: cosine series in theta = lat - lat0 in [0, pi] (a DCT-I basis on
  the pole-to-pole grid; the pyshtools-equivalent spherical-harmonic path of
  ``diagnostics.spectral`` shares the latitude quadrature idea, SHSF.py:10-33).

The fit is transform + truncate (rFFT in lon, DCT-I in lat), so full
truncation (m_max = nlon//2, l_max = nlat) reproduces every grid value to
round-off — pinned by tests — and truncation is the usual spectral smoothing
(the same operation the reference applies offline via SHSF, manual section 7).

Evaluation at R ray positions is two dense contractions:

    B_lon (R, Mp) @ coeffs (Mp, L*C)  -> W (R, L*C)      [MXU]
    sum_l B_lat[:, l] * W[:, l, :]    -> out (R, C)      [VPU]

plus pure elementwise trig for the basis rows — no gather anywhere.
``sample_spectral_pallas`` fuses basis generation, the matmul, and the
latitude contraction into one Pallas kernel that builds basis tiles in VMEM
and never materializes (R, Mp) or (R, L*C) in HBM (the XLA einsum path below
does, which is why the fused kernel exists; see DESIGN.md section 4 for the
measured cost model).

Honesty note (why this is OPT-IN, not the default): a truncated — or even
full — trigonometric interpolant is NOT bilinear interpolation of the FD
stack; trajectories near critical layers (exponential sensitivity) drift
relative to the reference, so the golden-parity gate that defines this
system's correctness only holds for the gather path. Tests gate this module
against the bilinear sampler on smooth backgrounds (where it is MORE accurate
than bilinear, not just close to it) and pin exactness at grid points.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rwrt_tpu.constants import pi
from rwrt_tpu.ops.interp import mercator_transform


class SpectralBackground(NamedTuple):
    """Spectral coefficients of the background-field stack.

    Attributes:
      coeffs: (Mp, L, C) real coefficient tensor. Row order along Mp is
        [cos 0, cos 1..cos m_max, sin 1..sin m_max] (grouped, not
        interleaved, so evaluation basis rows are two contiguous blocks).
      lat0: scalar array, latitude of the first grid row (radians); the
        latitude basis argument is (lat - lat0).
    """

    coeffs: jnp.ndarray
    lat0: jnp.ndarray

    @property
    def m_max(self) -> int:
        # Trailing axes so the properties stay correct on the (T, Mp, L, C)
        # stacks returned by fit_spectral_time.
        return (self.coeffs.shape[-3] - 1) // 2

    @property
    def l_max(self) -> int:
        return self.coeffs.shape[-2]

    @property
    def num_fields(self) -> int:
        return self.coeffs.shape[-1]


def fit_spectral(bs_or_fields, *, m_max=None, l_max=None, lon=None, lat=None,
                 xcyclic=None, dtype=None) -> SpectralBackground:
    """Fit the tensor-product spectral representation of a field stack.

    Args:
      bs_or_fields: a ``BasicState`` (its ``fields`` stack is fitted and the
        wrap column dropped when ``xcyclic``) or a raw (nlon, nlat, C) array.
      m_max: zonal truncation, default nlon//2 (exact).
      l_max: latitude truncation (number of cosine modes), default nlat
        (exact).
      lon, lat: grid coordinates in radians; required only for a raw array
        whose lon[0] != 0 / to take lat0 from (BasicState provides them).
      xcyclic: whether the last lon column is a cyclic wrap duplicate; taken
        from the BasicState when given one.
      dtype: coefficient dtype; defaults to the stack's dtype.

    The fit runs on host in float64 (it is a once-per-run precompute, like
    ``prepare`` itself); coefficients are returned as device arrays.
    """
    if hasattr(bs_or_fields, "fields"):
        bs = bs_or_fields
        fields = np.asarray(bs.fields, dtype=np.float64)
        if xcyclic is None:
            xcyclic = bool(bs.xcyclic)
        lon = np.asarray(bs.lon, dtype=np.float64)
        lat = np.asarray(bs.lat, dtype=np.float64)
        if dtype is None:
            dtype = bs.fields.dtype
        if fields.ndim == 4:
            # Time-varying BasicState (prepare_time_varying): (T, W, H, C)
            # frames — fit each frame (the wrap column is per-frame).
            return fit_spectral_time(fields, m_max=m_max, l_max=l_max,
                                     lon=lon, lat=lat, xcyclic=xcyclic,
                                     dtype=dtype)
    else:
        fields = np.asarray(bs_or_fields, dtype=np.float64)
        if dtype is None:
            dtype = np.asarray(bs_or_fields).dtype
        xcyclic = bool(xcyclic) if xcyclic is not None else False
        if fields.ndim == 4:
            raise ValueError("4-D stacks are time-varying; use "
                             "fit_spectral_time (or pass a BasicState)")
    if fields.ndim == 2:
        fields = fields[..., None]
    if xcyclic:
        fields = fields[:-1]
    n, nlat = fields.shape[0], fields.shape[1]
    lon0 = 0.0 if lon is None else float(lon[0])
    lat0 = -0.5 * pi if lat is None else float(lat[0])

    if m_max is None:
        m_max = n // 2
    if l_max is None:
        l_max = nlat
    if not (0 <= m_max <= n // 2):
        raise ValueError(f"m_max must be in [0, nlon//2={n // 2}]; got {m_max}")
    if not (1 <= l_max <= nlat):
        raise ValueError(f"l_max must be in [1, nlat={nlat}]; got {l_max}")

    # Longitude: complex coefficients c_m of sum_m c_m exp(i m lon), with the
    # grid-origin phase folded in (lon_i = lon0 + i*dx).
    X = np.fft.rfft(fields, axis=0) / n  # (n//2+1, nlat, C)
    marr = np.arange(X.shape[0])
    X = X * np.exp(-1j * marr * lon0)[:, None, None]
    a = 2.0 * X.real
    b = -2.0 * X.imag
    a[0] *= 0.5
    if n % 2 == 0:
        # Nyquist column: no doubling (its conjugate pair is itself). The
        # phase fold by lon0 rotates the (real) raw Nyquist coefficient into
        # the sin component, so b keeps its (halved) imaginary part too —
        # zeroing it breaks grid-point exactness on cell-centered grids.
        a[n // 2] *= 0.5
        b[n // 2] *= 0.5

    rows = np.concatenate([a[: m_max + 1], b[1: m_max + 1]], axis=0)

    # Latitude: DCT-I analysis (theta_j = j*pi/(nlat-1), endpoints included).
    try:
        from scipy.fft import dct
        G = dct(rows, type=1, axis=1) / (nlat - 1)
    except ImportError:  # pragma: no cover - scipy is baked into this image
        theta = np.arange(nlat) * (pi / (nlat - 1))
        B = np.cos(np.outer(theta, np.arange(nlat)))  # (nlat, L_full)
        w = np.ones(nlat)
        w[0] = w[-1] = 0.5
        G = 2.0 * np.einsum("mjc,j,jl->mlc", rows, w, B) / (nlat - 1)
    G[:, 0] *= 0.5
    G[:, -1] *= 0.5
    coeffs = G[:, :l_max]

    return SpectralBackground(
        coeffs=jnp.asarray(coeffs, dtype=dtype),
        lat0=jnp.asarray(lat0, dtype=dtype),
    )


def fit_spectral_time(frames, *, m_max=None, l_max=None, lon=None, lat=None,
                      xcyclic=False, dtype=None) -> SpectralBackground:
    """Fit a time-varying stack: frames (T, nlon, nlat, C) -> coeffs
    (T, Mp, L, C).

    The transform is linear, so linear interpolation of coefficient frames
    equals fitting linearly-interpolated fields — the same exactness argument
    as the production time lerp (DESIGN.md section 4: every derived field is
    linear in u, v). Use ``lerp_coeffs`` + ``sample_spectral`` to evaluate at
    a model time shared by the batch (the fixed-step path); per-lane times
    (the adaptive path) would need two evaluations and a per-lane blend.
    """
    if dtype is None:
        dtype = np.asarray(frames).dtype
    frames = np.asarray(frames, dtype=np.float64)
    if frames.ndim != 4:
        raise ValueError(f"frames must be (T, nlon, nlat, C); got "
                         f"{frames.shape}")
    fitted = [fit_spectral(frames[t], m_max=m_max, l_max=l_max, lon=lon,
                           lat=lat, xcyclic=xcyclic, dtype=dtype)
              for t in range(frames.shape[0])]
    return SpectralBackground(
        coeffs=jnp.stack([f.coeffs for f in fitted]),
        lat0=fitted[0].lat0,
    )


def lerp_coeffs(sbg: SpectralBackground, tfrac) -> SpectralBackground:
    """Linear time interpolation of a (T, Mp, L, C) coefficient stack at
    fractional frame index ``tfrac`` (clamped to the frame range, matching
    the production sampler's edge hold)."""
    coeffs = sbg.coeffs
    if coeffs.ndim != 4:
        raise ValueError("lerp_coeffs needs a time-varying fit "
                         "(fit_spectral_time)")
    nt = coeffs.shape[0]
    tfrac = jnp.clip(jnp.asarray(tfrac, coeffs.dtype), 0.0, nt - 1.0)
    t0 = jnp.clip(jnp.floor(tfrac).astype(jnp.int32), 0, nt - 2)
    w = tfrac - t0.astype(coeffs.dtype)
    c = (1.0 - w) * coeffs[t0] + w * coeffs[t0 + 1]
    return SpectralBackground(coeffs=c, lat0=sbg.lat0)


def _basis_lon(lon: jnp.ndarray, m_max: int) -> jnp.ndarray:
    """(R, 2*m_max+1) rows [1, cos(1..M * lon), sin(1..M * lon)]."""
    one = jnp.ones_like(lon)[:, None]
    if m_max == 0:
        return one
    marr = jnp.arange(1, m_max + 1, dtype=lon.dtype)
    ang = lon[:, None] * marr[None, :]
    return jnp.concatenate([one, jnp.cos(ang), jnp.sin(ang)], axis=1)


def _basis_lat(lat: jnp.ndarray, lat0, l_max: int) -> jnp.ndarray:
    """(R, l_max) rows cos(l * (lat - lat0))."""
    larr = jnp.arange(l_max, dtype=lat.dtype)
    return jnp.cos((lat - lat0)[:, None] * larr[None, :])


def sample_spectral(sbg: SpectralBackground, lon, lat, *,
                    matmul_dtype=None) -> jnp.ndarray:
    """Evaluate the spectral background at (lon, lat) points; returns (R, C).

    Same contract as ``ops.interp.sample_raw``: rows with |lat| > pi/2 are
    NaN (reference bs.py:787, 822-836); NaN positions (dead rays) propagate
    through the trig basis naturally. No lon wrap is needed — the basis is
    2*pi-periodic.

    Args:
      matmul_dtype: run the big lon-contraction in this dtype (bfloat16 for
        full MXU rate on TPU) with accumulation in the coefficient dtype.
        None = match the coefficient dtype. NaN lanes still propagate (bf16
        keeps NaN through the cast).
    """
    coeffs = sbg.coeffs
    mp, l_max, c = coeffs.shape
    acc_dtype = coeffs.dtype
    blon = _basis_lon(jnp.asarray(lon, acc_dtype), (mp - 1) // 2)  # (R, Mp)
    blat = _basis_lat(jnp.asarray(lat, acc_dtype), sbg.lat0, l_max)  # (R, L)
    dflat = coeffs.reshape(mp, l_max * c)
    if matmul_dtype is not None:
        blon = blon.astype(matmul_dtype)
        dflat = dflat.astype(matmul_dtype)
    w = jax.lax.dot_general(
        blon, dflat, (((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype)  # (R, L*C)  [MXU]
    out = jnp.einsum("rl,rlc->rc", blat, w.reshape(-1, l_max, c))
    in_range = jnp.abs(jnp.asarray(lat, acc_dtype)) <= 0.5 * pi
    return jnp.where(in_range[:, None], out, jnp.nan)


def sample_mercator_spectral(sbg: SpectralBackground, lon, lat) -> jnp.ndarray:
    """Spectral sample + Mercator transform; returns (C, R).

    Drop-in for ``ops.interp.sample_mercator`` (same transform block,
    reference bs.py:856-887) with the gather replaced by basis contractions.
    """
    return mercator_transform(sample_spectral(sbg, lon, lat), lat)


# ---------------------------------------------------------------------------
# Fused Pallas kernel: basis tiles generated in VMEM, contraction on the MXU.
# ---------------------------------------------------------------------------

def _spectral_kernel(lon_ref, lat_ref, tht_ref, dflat_ref, out_ref, *, m_max,
                     l_max, num_fields, acc_dtype):
    """One block of rays: build (BLK, Mp) / (BLK, L) basis tiles on the VPU,
    contract with the (Mp, L*C) coefficient matrix on the MXU, reduce the
    latitude axis with a static slice loop. Nothing touches HBM except the
    block inputs/outputs that pallas_call streams. tht is the precomputed
    latitude basis argument lat - lat0 (lat0 may be a traced value, so it is
    folded in outside the kernel rather than baked in as a constant). dflat
    may be bfloat16 (matmul_dtype); accumulation is always acc_dtype."""
    lon = lon_ref[:]  # (BLK, 1)
    lat = lat_ref[:]  # (BLK, 1)
    tht = tht_ref[:]  # (BLK, 1)
    dtype = acc_dtype
    one = jnp.ones_like(lon)
    if m_max > 0:
        marr = jax.lax.broadcasted_iota(dtype, (1, m_max), 1) + 1.0
        ang = lon * marr  # (BLK, m_max)
        blon = jnp.concatenate([one, jnp.cos(ang), jnp.sin(ang)], axis=1)
    else:
        blon = one
    w = jnp.dot(blon.astype(dflat_ref.dtype), dflat_ref[:],
                preferred_element_type=dtype)  # (BLK, L*C)
    larr = jax.lax.broadcasted_iota(dtype, (1, l_max), 1)
    blat = jnp.cos(tht * larr)  # (BLK, L)
    acc = blat[:, 0:1] * w[:, 0:num_fields]
    for l in range(1, l_max):
        acc = acc + blat[:, l:l + 1] * w[:, l * num_fields:(l + 1) * num_fields]
    nan = jnp.asarray(jnp.nan, dtype)
    out_ref[:] = jnp.where(jnp.abs(lat) <= 0.5 * pi, acc, nan)


def sample_spectral_pallas(sbg: SpectralBackground, lon, lat, *,
                           block_r: int = 256,
                           matmul_dtype=None,
                           interpret: bool | None = None) -> jnp.ndarray:
    """Fused-kernel evaluation; numerically equal to ``sample_spectral`` up
    to contraction-order round-off (tests pin 1e-5 relative in f32, 1e-12 in
    f64).

    Args:
      block_r: rays per kernel program (padded up; 256 keeps the basis tile
        (256, Mp) and W tile (256, L*C) comfortably inside VMEM for T85-ish
        truncations).
      interpret: force Pallas interpreter mode; defaults to True off-TPU so
        the same code path is testable on CPU.
    """
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    coeffs = sbg.coeffs
    mp, l_max, c = coeffs.shape
    m_max = (mp - 1) // 2
    dtype = coeffs.dtype
    lon = jnp.asarray(lon, dtype)
    lat = jnp.asarray(lat, dtype)
    r = lon.shape[0]
    n_blk = -(-r // block_r)
    r_pad = n_blk * block_r
    lon_p = jnp.zeros((r_pad, 1), dtype).at[:r, 0].set(lon)
    lat_p = jnp.zeros((r_pad, 1), dtype).at[:r, 0].set(lat)
    tht_p = lat_p - jnp.asarray(sbg.lat0, dtype)
    dflat = coeffs.reshape(mp, l_max * c)
    if matmul_dtype is not None:
        dflat = dflat.astype(matmul_dtype)

    kernel = lambda lo, la, th, d, o: _spectral_kernel(
        lo, la, th, d, o, m_max=m_max, l_max=l_max, num_fields=c,
        acc_dtype=dtype)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r_pad, c), dtype),
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((block_r, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_r, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_r, 1), lambda i: (i, 0)),
            pl.BlockSpec((mp, l_max * c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_r, c), lambda i: (i, 0)),
        interpret=interpret,
    )(lon_p, lat_p, tht_p, dflat)
    return out[:r]
