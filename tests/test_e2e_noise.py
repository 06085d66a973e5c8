"""Receiver-chain validation under calibrated AWGN.

The reference's validation bar is a real receiver acquiring the signal
over the air (reference README.md:72-78) — i.e. through thermal noise at
a received C/N0 around 40-50 dB-Hz.  A noise-free self-loop cannot show
the chain has any margin, so these tests add complex AWGN calibrated to
a per-component C/N0 (noise.py) and require the full in-repo receiver
(PCPS acquisition with non-coherent accumulation -> tracking -> frame
sync -> Viterbi/CRC -> ephemeris recovery -> PVT) to still fix within
tens of meters of the simulated location.

Measured margin (tools/probe_noise_rx.py, M=8 non-coherent windows):
fix at 45 / 42 / 40 dB-Hz with ~7-8 m error and all 6 satellites; the
acquisition floor is ~39 dB-Hz at M=8 (below that, present-satellite
metrics drop under the false-alarm threshold).  A real open-sky Galileo
E1 receiver sees ~40-50 dB-Hz, so the chain holds realistic and ~5 dB
degraded conditions.  CI runs 45 dB-Hz; the deeper sweep runs when
GALILEO_NOISE_SWEEP=1 (like the soak gate).
"""

import os

import numpy as np
import pytest

from galileo_sdr_sim_tpu import geodesy
from galileo_sdr_sim_tpu.constants import R2D
from galileo_sdr_sim_tpu.noise import add_awgn, awgn_sigma
from galileo_sdr_sim_tpu.rx_pvt import receiver_fix
from galileo_sdr_sim_tpu.rx_track import acquire, iq_to_complex

from conftest import PVT_STATIC

TRUTH = geodesy.llh2xyz(
    np.array([PVT_STATIC[0] / R2D, PVT_STATIC[1] / R2D, PVT_STATIC[2]])
)


def _noisy(x16, cn0):
    return iq_to_complex(add_awgn(x16, cn0, rng=1234))


def test_sigma_calibration():
    # 45 dB-Hz at amplitude 250 / 2.6 Msps: sigma^2 = 250^2 * fs / 10^4.5
    s = awgn_sigma(45.0)
    assert abs(s - np.sqrt(62500.0 * 2.6e6 / 10**4.5)) < 1e-6


def test_fix_at_45_dbhz(pvt_scene):
    """Realistic received C/N0: the receiver must still produce an
    overdetermined fix within tens of meters, and absent PRNs must not
    false-alarm through the acquisition threshold."""
    _, x16 = pvt_scene
    x = _noisy(x16, 45.0)
    for prn in (6, 17):  # not in the scene
        assert acquire(x, prn, n_noncoh=8).metric < 8.0
    fix = receiver_fix(x, n_noncoh=8)
    assert fix is not None, "no fix at 45 dB-Hz"
    err = np.linalg.norm(fix.solution.xyz - TRUTH)
    assert err < 30.0, f"position error {err:.2f} m"
    assert fix.solution.n_sats >= 5, fix.solution.prns


@pytest.mark.skipif(
    os.environ.get("GALILEO_NOISE_SWEEP") != "1",
    reason="C/N0 margin sweep (set GALILEO_NOISE_SWEEP=1); last recorded "
    "run in docs/noise_margin.md",
)
@pytest.mark.parametrize("cn0", [42.0, 40.0])
def test_fix_margin_sweep(pvt_scene, cn0):
    _, x16 = pvt_scene
    fix = receiver_fix(_noisy(x16, cn0), n_noncoh=8)
    assert fix is not None, f"no fix at {cn0} dB-Hz"
    err = np.linalg.norm(fix.solution.xyz - TRUTH)
    assert err < 30.0, f"position error {err:.2f} m at {cn0} dB-Hz"
