"""rwrt_tpu: TPU-native barotropic Rossby-wave ray tracing.

A ground-up JAX/XLA re-design of the Li-Yang wave-ray tracing system (see
SURVEY.md for the reference analysis): device-resident basic-state precompute,
analytic dispersion-root solve, fused bilinear background sampling, and
fixed-shape masked RK4 / adaptive Dormand-Prince integration over a sharded
ray batch.
"""

from rwrt_tpu.config import RunConfig
from rwrt_tpu.models.basic_state import (
    BasicState,
    prepare,
    prepare_time_varying,
    regrid_to_uniform,
)
from rwrt_tpu.tracer import (
    RayTrajectories,
    source_matrix,
    trace_rays,
    trace_rays_ensemble,
)
from rwrt_tpu.utils.checkpoint import trace_rays_chunked

__all__ = [
    "RunConfig",
    "BasicState",
    "prepare",
    "prepare_time_varying",
    "regrid_to_uniform",
    "RayTrajectories",
    "source_matrix",
    "trace_rays",
    "trace_rays_ensemble",
    "trace_rays_chunked",
]

__version__ = "0.1.0"
