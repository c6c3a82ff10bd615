"""Golden differential tests: basic-state precompute vs the reference BS.ready."""

import numpy as np
import pytest

import rwrt_tpu as rt
from rwrt_tpu.models.basic_state import FIELD_NAMES

from refshim import make_reference_bs


@pytest.fixture(scope="module")
def pair(jet_field):
    u, v, lat, lon = jet_field
    ref = make_reference_bs(u, v, lat, lon, xcyclic=True)
    ours = rt.prepare(u, v, lat, lon, xcyclic=True,
                      read_dtype="float32", cal_dtype="float64")
    return ref, ours


def test_field_stack_matches_reference(pair):
    ref, ours = pair
    ours_fields = np.asarray(ours.fields)
    assert ours_fields.shape == ref.fields.shape
    # XLA fuses multiply-adds (FMA), so agreement is ulp-level relative to
    # each field's dynamic range rather than bitwise; 1e-9 of the field scale
    # is ~1e6 times tighter than any stencil mistake would produce.
    for i, name in enumerate(FIELD_NAMES):
        scale = np.max(np.abs(ref.fields[..., i])) + 1e-30
        np.testing.assert_allclose(
            ours_fields[..., i], ref.fields[..., i],
            rtol=1e-9, atol=1e-9 * scale, err_msg=f"field {name}",
        )


def test_q_betam_ks_match_reference(pair):
    ref, ours = pair
    np.testing.assert_allclose(np.asarray(ours.q), ref.q, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(ours.betam), ref.betam, rtol=1e-9, atol=1e-20, equal_nan=True
    )
    np.testing.assert_allclose(
        np.asarray(ours.ks), ref.KS, rtol=1e-10, atol=1e-10, equal_nan=True
    )


def test_qyx_is_unsmoothed_qxy(pair):
    """qyx must be the pre-smth9 copy of qxy (reference bs.py:337)."""
    ref, ours = pair
    i_qxy = FIELD_NAMES.index("qxy")
    i_qyx = FIELD_NAMES.index("qyx")
    f = np.asarray(ours.fields)
    # They must differ in the interior (qxy smoothed, qyx not).
    assert not np.allclose(f[..., i_qxy], f[..., i_qyx])
    scale = np.max(np.abs(ref.qyx))
    # f includes the cyclic wrap column; ref.qyx is the raw (nlon, nlat) grid.
    np.testing.assert_allclose(
        f[: ref.qyx.shape[0], :, i_qyx], ref.qyx, rtol=1e-9, atol=1e-9 * scale
    )
