"""Ionosphere model smoke/plausibility tests (reference: src/iono.cpp).

These are intentionally loose invariants (bounds, stability, fallback
routing).  PARITY evidence lives in tests/test_iono_ref_ab.py: a
655-case A/B against the *compiled reference* iono.cpp, equal to
<= 1e-9 relative (measured 2e-14), with the physical-units mode pinned
as an exact rescale of that validated TEC chain."""

import numpy as np
import pytest

from galileo_sdr_sim_tpu import iono
from galileo_sdr_sim_tpu.gnss_time import GalTime
from galileo_sdr_sim_tpu.rinex import IonoUtc


def test_obliquity_bounds():
    # zenith: F -> small; horizon: F larger
    d_zenith = iono.obliquity_delay(np.pi / 2)
    d_horizon = iono.obliquity_delay(0.0)
    assert 0 < d_zenith < d_horizon
    assert d_horizon / d_zenith > 2.0


def test_disabled_and_no_params():
    g = GalTime(2198, 28801.0)
    off = IonoUtc(enable=False)
    assert iono.ionospheric_delay(off, g, [0.7, -1.2, 100], [0.8, -1, 2.3e7], [1, 0.7], 1.57542e9) == 0.0
    no_ai = IonoUtc(enable=True, vflg=False)
    d = iono.ionospheric_delay(no_ai, g, [0.7, -1.2, 100], [0.8, -1, 2.3e7], [1, 0.7], 1.57542e9)
    assert d == iono.obliquity_delay(0.7)


def test_modip_grid():
    # MODIP is bounded and increases with latitude
    lats = np.radians([-80, -40, 0, 40, 80])
    vals = [iono.calc_modip(lat, 0.3) for lat in lats]
    assert all(-90 <= v <= 90 for v in vals)
    assert vals[0] < vals[2] < vals[4]
    assert iono.calc_modip(np.radians(91), 0) == 90.0


def test_az_polynomial():
    assert iono.calc_az((0.0, 0.0, 0.0), 50.0) == 63.7
    assert iono.calc_az((100.0, 1.0, 0.0), 50.0) == 150.0
    assert iono.calc_az((500.0, 0.0, 0.0), 0.0) == 400.0  # clamped
    assert iono.calc_az((-500.0, 0.0, 0.0), 0.0) == 0.0


@pytest.fixture(scope="module")
def iono_params(nav):
    return nav.iono


def test_nequick_physical_delay_plausible(iono_params):
    """Dimensionally-correct NeQuick slant delay: 0.1 .. 50 m at E1."""
    g = GalTime(2198, 28801.0)
    d = iono.ionospheric_delay(
        iono_params, g,
        [np.radians(42.36), np.radians(-71.06), 100.0],
        [np.radians(45.0), np.radians(-60.0), 2.3222e7],
        [1.0, np.radians(45)], 1.57542e9,
        physical_units=True,
    )
    assert 0.05 < d < 50.0


def test_reference_quirk_path_is_noop(iono_params):
    """Reference-parity NeQuick delay is a float64 no-op on the pseudorange;
    the fast path must return exactly 0 and the full path must agree."""
    g = GalTime(2198, 28801.0)
    args = (
        iono_params, g,
        [np.radians(42.36), np.radians(-71.06), 100.0],
        [np.radians(45.0), np.radians(-60.0), 2.3222e7],
        [1.0, np.radians(45)], 1.57542e9,
    )
    fast = iono.ionospheric_delay(*args)
    assert fast == 0.0
    slow = iono.ionospheric_delay(*args, quirk_fast_path=False)
    assert abs(slow) < 1e-20
    assert 2.3e7 + slow == 2.3e7  # provably identical effect on pseudorange


def test_tec_integration_stability(iono_params):
    """TEC varies smoothly with elevation (no recursion blow-ups)."""
    g = GalTime(2198, 28801.0)
    ds = []
    for el_deg in (15, 35, 55, 75):
        d = iono.ionospheric_delay(
            iono_params, g,
            [np.radians(42.36), np.radians(-71.06), 100.0],
            [np.radians(42.36 + (90 - el_deg) * 0.7), np.radians(-71.06), 2.3222e7],
            [1.0, np.radians(el_deg)], 1.57542e9,
            physical_units=True,
        )
        ds.append(d)
    assert all(d > 0 for d in ds)
    # slant delay decreases toward zenith
    assert ds[0] > ds[-1]
