"""Observables tests (reference: src/gal-sig.cpp:242-347)."""

import numpy as np

from galileo_sdr_sim_tpu.constants import (
    CA_SEQ_LEN_E1,
    CODE_FREQ_E1,
    EPOCH_DT,
    SPEED_OF_LIGHT,
)
from galileo_sdr_sim_tpu.observables import (
    code_phase_state,
    compute_range,
    initial_carrier_phase,
)
from galileo_sdr_sim_tpu.rinex import EphArrays
from galileo_sdr_sim_tpu import geodesy


def _visible_eph(nav, g0, xyz):
    out = []
    for sv in range(36):
        idx = nav.epoch_match(sv, g0)
        if idx < 0:
            continue
        eph = nav.eph[sv][idx]
        arr = EphArrays.from_records([eph])
        pos, _, _ = geodesy.satpos(arr, g0.sec)
        azel = geodesy.azel_from(xyz, pos[0])
        if azel[1] > 0.15:
            out.append(eph)
    return out


def test_pseudorange_plausible(nav, g0):
    xyz = geodesy.llh2xyz(np.array([42.3601 / 57.29578, -71.0589 / 57.29578, 100.0]))
    ephs = _visible_eph(nav, g0, xyz)
    assert len(ephs) >= 4
    arr = EphArrays.from_records(ephs)
    rho = compute_range(arr, nav.iono, g0.week, g0.sec, xyz)
    # Galileo MEO: 23222 km altitude -> slant range 23000-29000 km
    assert np.all(rho.d > 2.2e7) and np.all(rho.d < 3.0e7)
    # clock+iono corrections: |c*af0| can reach a few ms for some SVs
    assert np.all(np.abs(rho.range - rho.d) < 3e6)


def test_code_phase_state_bounds(nav, g0):
    xyz = geodesy.llh2xyz(np.array([42.3601 / 57.29578, -71.0589 / 57.29578, 100.0]))
    ephs = _visible_eph(nav, g0, xyz)
    arr = EphArrays.from_records(ephs)
    r0 = compute_range(arr, nav.iono, g0.week, g0.sec, xyz)
    r1 = compute_range(arr, nav.iono, g0.week, g0.sec + EPOCH_DT, xyz)
    st = code_phase_state(r0.range, r1.range, EPOCH_DT, g0.sec + EPOCH_DT)
    assert np.all(np.abs(st.f_carr) < 5000)  # Doppler bound for static user
    assert np.all(np.abs(st.f_code - CODE_FREQ_E1) < 5)
    assert np.all((st.code_phase >= 0) & (st.code_phase < CA_SEQ_LEN_E1))
    assert np.all((st.ibit >= 0) & (st.ibit < 500))
    assert np.all((st.ipage >= 0) & (st.ipage < 360))


def test_doppler_sign_matches_range_rate(nav, g0):
    xyz = geodesy.llh2xyz(np.array([42.3601 / 57.29578, -71.0589 / 57.29578, 100.0]))
    ephs = _visible_eph(nav, g0, xyz)
    arr = EphArrays.from_records(ephs)
    r0 = compute_range(arr, nav.iono, g0.week, g0.sec, xyz)
    r1 = compute_range(arr, nav.iono, g0.week, g0.sec + EPOCH_DT, xyz)
    st = code_phase_state(r0.range, r1.range, EPOCH_DT, g0.sec + EPOCH_DT)
    rate = (r1.range - r0.range) / EPOCH_DT
    # approaching (rate < 0) -> positive Doppler
    assert np.all(np.sign(st.f_carr) == -np.sign(rate))


def test_transmit_time_consistency(nav, g0):
    """ibit/code_phase encode the transmit time modulo the page length."""
    xyz = geodesy.llh2xyz(np.array([42.3601 / 57.29578, -71.0589 / 57.29578, 100.0]))
    ephs = _visible_eph(nav, g0, xyz)[:1]
    arr = EphArrays.from_records(ephs)
    r0 = compute_range(arr, nav.iono, g0.week, g0.sec, xyz)
    r1 = compute_range(arr, nav.iono, g0.week, g0.sec + EPOCH_DT, xyz)
    grx = g0.sec + EPOCH_DT
    st = code_phase_state(r0.range, r1.range, EPOCH_DT, grx)
    t_tx_ms = (grx - r1.range[0] / SPEED_OF_LIGHT) * 1000.0
    ms_in_pair = t_tx_ms % 2000.0
    sym = int(ms_in_pair // 4)
    assert st.ibit[0] == (sym + 250) % 500


def test_initial_carrier_phase_fraction():
    p = initial_carrier_phase(2.4e7, 2.1e7)
    assert 0.0 <= p < 1.0
