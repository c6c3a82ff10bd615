"""Tests for utils/observability.py (reference wr.py:28-35, 260-279).

The reference's observability surface is a text progress bar and a config
banner printed by ``ray_info``; these tests pin our equivalents' content so
refactors keep the user-facing run summary intact.
"""

import io

from rwrt_tpu.config import RunConfig
from rwrt_tpu.utils.observability import Progress, run_banner


def test_run_banner_content():
    cfg = RunConfig(zwn=(1.0, 2.0, 3.0), nnx=4, nny=3, sw_lon=10.0,
                    sw_lat=-5.0, dlon=2.5, dlat=1.5)
    buf = io.StringIO()
    run_banner(cfg, nlon=144, nlat=73, file=buf)
    text = buf.getvalue()
    # Grid dims, wavenumber list, source-matrix geometry, and the solver
    # switches must all appear (reference ray_info prints each of these).
    assert "144 x 73" in text
    assert "1.0 2.0 3.0" in text
    assert "12 points" in text            # nsource = nnx * nny
    assert "(10.00E, -5.00N)" in text
    assert "4 x 3" in text
    assert "rk4" in text
    assert f"{cfg.tstep:.1f}" in text


def test_progress_bar_reaches_completion():
    buf = io.StringIO()
    p = Progress(total=10, bar_length=20, file=buf)
    for i in range(1, 11):
        p.update(i, ray_steps=100)
    text = buf.getvalue()
    assert "100.0%" in text
    assert "ray-steps/s" in text
    # Completion writes the terminating newline exactly once.
    assert text.endswith("\n")
    assert text.count("\n") == 1


def test_progress_alive_fraction_and_zero_total():
    buf = io.StringIO()
    p = Progress(total=0, file=buf)        # degenerate total: no crash
    p.update(0, alive_frac=0.25)
    assert "alive" in buf.getvalue()
    assert "25.0%" in buf.getvalue()


def test_progress_accumulates_ray_steps():
    buf = io.StringIO()
    p = Progress(total=2, file=buf)
    p.update(1, ray_steps=50)
    p.update(2, ray_steps=50)
    assert p.ray_steps == 100
