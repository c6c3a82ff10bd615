"""Diagnostics: grid-wide wavenumber maps, spectral filtering, wave-ray flux,
termination accounting."""

from rwrt_tpu.diagnostics.flux import (
    RegionStatistics,
    WaveRayFlux,
    ensemble_flux_statistics,
    region_mask,
    region_statistics,
    threshold_filter,
    wave_ray_flux,
    wave_ray_flux_chunked,
)
from rwrt_tpu.diagnostics.spectral import shsf, spectral_filter
from rwrt_tpu.diagnostics.termination import (
    TerminationReport,
    analyze,
    classify,
)
from rwrt_tpu.diagnostics.targeting import optimize_seeds
from rwrt_tpu.diagnostics.wavenumber import (
    WavenumberMaps,
    compute_wavenumber_maps,
    fill_nan_neighborhood_mean,
    postprocess_maps,
    turning_critical_masks,
)

__all__ = [
    "WaveRayFlux", "RegionStatistics", "region_mask", "region_statistics",
    "threshold_filter", "wave_ray_flux", "wave_ray_flux_chunked",
    "ensemble_flux_statistics",
    "shsf", "spectral_filter",
    "TerminationReport", "analyze", "classify",
    "WavenumberMaps", "compute_wavenumber_maps", "postprocess_maps",
    "fill_nan_neighborhood_mean", "turning_critical_masks",
    "optimize_seeds",
]
