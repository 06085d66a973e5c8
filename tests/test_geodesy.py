"""Geodesy/orbit tests (reference: src/geodesy.cpp)."""

import numpy as np

from galileo_sdr_sim_tpu import geodesy
from galileo_sdr_sim_tpu.rinex import EphArrays


def test_llh_xyz_roundtrip():
    rng = np.random.default_rng(0)
    llh = np.stack(
        [
            rng.uniform(-1.4, 1.4, 50),
            rng.uniform(-np.pi, np.pi, 50),
            rng.uniform(-100, 9000, 50),
        ],
        axis=-1,
    )
    xyz = geodesy.llh2xyz(llh)
    back = geodesy.xyz2llh(xyz)
    assert np.allclose(back[..., :2], llh[..., :2], atol=1e-9)
    assert np.allclose(back[..., 2], llh[..., 2], atol=1e-2)


def test_neu_azel():
    # Satellite due-east on the horizon from the equator/prime meridian.
    llh = np.array([0.0, 0.0, 0.0])
    t = geodesy.ltcmat(llh)
    neu = geodesy.ecef2neu(np.array([0.0, 1000.0, 0.0]), t)
    azel = geodesy.neu2azel(neu)
    assert np.isclose(azel[0], np.pi / 2)  # east
    assert np.isclose(azel[1], 0.0)

    # Straight up.
    neu = geodesy.ecef2neu(np.array([1000.0, 0.0, 0.0]), t)
    azel = geodesy.neu2azel(neu)
    assert np.isclose(azel[1], np.pi / 2)


def _first_eph(nav):
    for recs in nav.eph:
        if recs:
            return recs[0]
    raise AssertionError


def test_satpos_orbit_radius(nav):
    """|r| must equal A(1 - e cos E) + harmonic corrections ~ 29600 km."""
    eph = _first_eph(nav)
    t = eph.toe.sec + np.linspace(-3600, 3600, 32)
    arr = EphArrays.from_records([eph])
    pos, vel, clk = geodesy.satpos(arr, t[:, None])
    r = np.linalg.norm(pos, axis=-1)
    assert np.all(np.abs(r - eph.A) < 0.02 * eph.A)
    speed = np.linalg.norm(vel, axis=-1)
    # ECEF-frame speed of a Galileo MEO satellite.
    assert np.all((speed > 2.0e3) & (speed < 4.5e3))
    assert np.all(np.abs(clk[..., 0]) < 1e-2)


def test_satpos_velocity_consistency(nav):
    """Analytic velocity must match finite-differenced position (with the
    Earth-rotation frame term)."""
    eph = _first_eph(nav)
    arr = EphArrays.from_records([eph])
    t0 = eph.toe.sec + 500.0
    dt = 1e-3
    p0, v0, _ = geodesy.satpos(arr, np.array([t0]))
    p1, _, _ = geodesy.satpos(arr, np.array([t0 + dt]))
    fd = (p1 - p0) / dt
    assert np.allclose(fd, v0, rtol=1e-4, atol=1e-2)


def test_satpos_vectorization_matches_scalar(nav):
    eph = _first_eph(nav)
    arr = EphArrays.from_records([eph])
    times = eph.toe.sec + np.array([0.0, 100.0, 1000.0])
    pos_v, vel_v, clk_v = geodesy.satpos(arr, times[:, None])
    for i, t in enumerate(times):
        p, v, c = geodesy.satpos(arr, np.array([t]))
        assert np.array_equal(p[0], pos_v[i, 0])
        assert np.array_equal(v[0], vel_v[i, 0])
        assert np.array_equal(c[0], clk_v[i, 0])
