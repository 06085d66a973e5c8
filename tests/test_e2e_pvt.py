"""End-to-end PVT acceptance: a full software receiver (acquisition,
tracking, frame sync, Viterbi/CRC decode, ephemeris recovery,
pseudoranges, least-squares solve) run on the emitted int16 stream must
produce a position fix within meters of the simulated location.

This is the reference's actual acceptance bar — GNSS-SDR + RTKLIB PVT at
the simulated location (reference gnss-sdr_Galileo_E1_ishort.conf:77-100,
README.md:72-78) — reproduced fully in-repo.  The receiver uses ONLY the
samples: no transmitter metadata, no RINEX, no scenario state.

Scene: 18.4 s starting at 2022-02-20 08:00:18 (tow 28818).  The I/NAV
schedule (constants.WORD_ALLOCATION_E1) delivers words 0,1,3,5,0 at
transmit seconds 28819-28827 and words 2,4 at 28831-28835, so every
ephemeris word type lands inside the stream.
"""

import numpy as np
import pytest

from galileo_sdr_sim_tpu import geodesy
from galileo_sdr_sim_tpu.constants import R2D, SAMP_RATE
from galileo_sdr_sim_tpu.rx_pvt import receiver_fix
from galileo_sdr_sim_tpu.rx_track import iq_to_complex

from conftest import PVT_STATIC as STATIC

# the shared 18.4 s scene now lives in conftest.pvt_scene (also consumed
# by test_e2e_noise's AWGN margin tests)


@pytest.fixture(scope="module")
def fix(pvt_scene):
    _, x16 = pvt_scene
    return receiver_fix(iq_to_complex(x16))


def test_position_fix_within_meters(fix):
    """The solved position lands within 15 m of the simulated location
    (typical observed error ~3 m; the bound allows DOP variation)."""
    assert fix is not None, "receiver did not produce a fix"
    sol = fix.solution
    truth = geodesy.llh2xyz(
        np.array([STATIC[0] / R2D, STATIC[1] / R2D, STATIC[2]])
    )
    err = np.linalg.norm(sol.xyz - truth)
    assert err < 15.0, f"position error {err:.2f} m (prns {sol.prns})"


def test_solution_is_overdetermined_and_consistent(fix):
    """>= 5 satellites decoded through to measurements; post-fit
    residuals bounded (common-mode tracking lag is absorbed by the
    clock term, the differential part must stay small)."""
    sol = fix.solution
    assert sol.n_sats >= 5, sol.prns
    assert np.max(np.abs(sol.residuals)) < 8.0, sol.residuals


def test_receive_time_recovered(pvt_scene, fix):
    """The solved receive time matches the transmitter's epoch clock at
    the measurement sample (g0 + 2 dt + n/fs) to microseconds."""
    g0, x16 = pvt_scene
    n_meas = 0.5 * (len(x16) // 2)
    from galileo_sdr_sim_tpu.constants import EPOCH_DT

    t_true = g0.sec + 2 * EPOCH_DT + n_meas / SAMP_RATE
    assert abs(fix.solution.t_rx - t_true) < 1e-5


def test_recovered_ephemeris_matches_broadcast(nav, pvt_scene, fix):
    """Decoded word fields reproduce the RINEX broadcast values to ICD
    quantization (the transmit chain's own fixed-point rounding)."""
    from galileo_sdr_sim_tpu.rx_pvt import assemble_ephemeris

    g0, _ = pvt_scene
    dec = fix.channels[0]
    week = dec.words[5]["wn"] + 1024
    rec = assemble_ephemeris(dec.words, week, dec.prn)
    truth = nav.eph[dec.prn - 1][nav.epoch_match(dec.prn - 1, g0)]
    assert rec.svid == truth.svid
    assert abs(rec.sqrta - truth.sqrta) <= 2.0**-19
    assert abs(rec.ecc - truth.ecc) <= 2.0**-33
    assert abs(rec.m0 - truth.m0) <= 2.0**-31 * np.pi
    assert abs(rec.af0 - truth.af0) <= 2.0**-34
    assert abs(rec.bgde5b - truth.bgde5b) <= 2.0**-32
    assert rec.toe.sec == truth.toe.sec  # multiple of 60 s -> exact
    assert rec.iode == truth.iode


def test_receiver_recovers_reduced_ced(nav, pvt_scene, fix):
    """The 16-slot inside the scene (transmit sec 28828) carries real
    reduced CED (beyond the reference, which sends dummy 63 there): the
    receiver's decoded word 16 must reconstruct each satellite's orbit
    to reduced-CED quantization (<= 400 m at t0r) using ONLY the samples."""
    from galileo_sdr_sim_tpu.inav import reduced_ced_representable
    from galileo_sdr_sim_tpu.rx import reduced_ced_record

    g0, _ = pvt_scene
    t0r = 28828.0
    checked = 0
    for dec in fix.channels:
        truth = nav.eph[dec.prn - 1][nav.epoch_match(dec.prn - 1, g0)]
        if not reduced_ced_representable(truth, t0r):
            continue
        assert 16 in dec.words, f"PRN {dec.prn}: word 16 not decoded"
        red = reduced_ced_record(dec.words[16], t0r, g0.week)
        pos_r, _, _ = geodesy.satpos(red, t0r)
        pos_f, _, _ = geodesy.satpos(truth, t0r)
        err = np.linalg.norm(pos_r - pos_f)
        assert err < 400.0, (dec.prn, err)
        checked += 1
    assert checked >= 4
