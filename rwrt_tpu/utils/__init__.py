"""Utilities: observability (banner/progress/profiling) and the chunked
checkpoint/resume driver."""

from rwrt_tpu.utils.checkpoint import trace_rays_chunked
from rwrt_tpu.utils.observability import Progress, profile, run_banner

__all__ = ["trace_rays_chunked", "Progress", "profile", "run_banner"]
