"""Import shim for the reference implementation at /root/reference.

The reference imports numba, netCDF4 and matplotlib at module scope; none are
needed for the numerical paths the golden tests exercise, and none are
installed in this environment. This shim installs minimal stand-ins into
sys.modules (numba.jit -> identity decorator, netCDF4.Dataset -> unused
placeholder) and puts /root/reference on sys.path so `import bs`, `import wr`
etc. resolve to the reference modules.

The reference code is used strictly as a black-box oracle for differential
testing; nothing from it is copied into rwrt_tpu.
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def _install_stubs():
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def jit(*args, **kwargs):
            # Supports @jit, @jit(signature), @jit([sigs], **opts).
            if len(args) == 1 and callable(args[0]) and not isinstance(args[0], (list, str)):
                return args[0]

            def deco(fn):
                return fn

            return deco

        numba.jit = jit
        numba.njit = jit
        sys.modules["numba"] = numba

    if "netCDF4" not in sys.modules:
        netcdf4 = types.ModuleType("netCDF4")

        class Dataset:  # pragma: no cover - never constructed in tests
            def __init__(self, *a, **k):
                raise RuntimeError("netCDF4 stub: file IO unavailable in tests")

        netcdf4.Dataset = Dataset
        sys.modules["netCDF4"] = netcdf4

    if "matplotlib" not in sys.modules:
        try:
            import matplotlib  # noqa: F401
        except ImportError:
            mpl = types.ModuleType("matplotlib")
            plt = types.ModuleType("matplotlib.pyplot")
            mpl.pyplot = plt
            sys.modules["matplotlib"] = mpl
            sys.modules["matplotlib.pyplot"] = plt


def load_reference():
    """Make the reference modules importable; returns (bs, wn, wr) modules."""
    _install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import bs  # noqa: F401
    import wn  # noqa: F401
    import wr  # noqa: F401

    return bs, wn, wr


def make_reference_bs(u, v, lat, lon, xcyclic=True):
    """Build a reference BS object directly from arrays (bypassing NetCDF)."""
    bs_mod, _, _ = load_reference()
    nlon, nlat = u.shape
    b = bs_mod.BS(nlon, nlat)
    b.u = u.astype("float32")
    b.v = v.astype("float32")
    b.lat = lat.astype("float64")
    b.lon = lon.astype("float64")
    b.ready(xcyclic=xcyclic)
    return b


def run_reference_wr(
    u, v, lat, lon, *, zwn, sw_lon, sw_lat, dlon, dlat, nnx, nny,
    tstep, ttotal, freq=0.0, inte_method="", rtol=1e-6, atol=1e-6,
    min_step_factor=1e-3, cut_off=0.1, xcyclic=True,
):
    """Run the reference end-to-end from in-memory arrays (no NetCDF).

    Returns the WR object with rlon/rlat/rzwn/rmwn/ramp/rug/rvg filled,
    shapes (nt, 3, nsource, nzwn), radians.
    """
    _, _, wr_mod = load_reference()
    nlon, nlat = u.shape
    w = wr_mod.WR(
        len(zwn), nnx * nny, tstep, ttotal, freq,
        nx=nlon, ny=nlat, rtol=rtol, atol=atol, cut_off=cut_off,
        MinStepFactor=min_step_factor,
    )
    w.bs.u = u.astype("float32")
    w.bs.v = v.astype("float32")
    w.bs.lat = lat.astype("float64")
    w.bs.lon = lon.astype("float64")
    w.bs.ready(xcyclic=xcyclic)
    w.set_zwn(list(zwn))
    w.set_source_matrix(sw_lon, sw_lat, dlon, dlat, nnx, nny)
    w.ray_run(mode="numpy", root_method="numpy", inte_method=inte_method)
    return w
