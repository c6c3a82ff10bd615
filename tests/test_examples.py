"""Smoke tests: every example script runs end to end.

The examples are the user-facing counterpart of the reference manual's
walkthroughs (great-circle demo = manual section 2; plot script = the
manual's absent "plot.py"); these tests keep them from bitrotting.
RWRT_SMOKE=1 shrinks the heavy demos to CI size.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *argv, cwd, timeout=600):
    env = dict(os.environ, JAX_PLATFORMS="cpu", RWRT_SMOKE="1",
               PYTHONPATH=REPO)
    # Examples run single-device; drop any test-harness device forcing.
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *argv],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{script} failed\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    return proc.stdout


def test_great_circle_demo_and_plot(tmp_path):
    out = _run("great_circle_demo.py", cwd=tmp_path)
    assert "integrated" in out
    traj = tmp_path / "rays_great_circle.npz"
    assert traj.exists()
    # Chain the plotting script on the demo's output file.
    png = tmp_path / "rays.png"
    out = _run("plot_trajectories.py", str(traj), str(png), cwd=tmp_path)
    assert png.exists() and png.stat().st_size > 0


def test_flux_diagnostics_demo(tmp_path):
    out = _run("flux_diagnostics_demo.py", cwd=tmp_path)
    assert "trajectory points binned" in out
    assert "termination counts" in out


@pytest.mark.slow
def test_adjoint_sensitivity_demo(tmp_path):
    out = _run("adjoint_sensitivity.py", cwd=tmp_path)
    # The demo prints grad vs finite-difference pairs; both lines present.
    assert "d(final lat)/d(jet scale)" in out
    assert "d(final lat)/d(seed lat)" in out


@pytest.mark.slow
def test_source_targeting_demo(tmp_path):
    out = _run("source_targeting.py", cwd=tmp_path)
    assert "objective:" in out
    assert "miss" in out
