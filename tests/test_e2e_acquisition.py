"""End-to-end acceptance: a receiver-style PCPS acquisition must detect
exactly the simulated satellites, at the right Doppler, in the emitted
int16 stream.

This mirrors the reference's receiver-in-the-loop validation strategy
(SURVEY §4: GNSS-SDR acquisition is the real test) with an in-repo
FFT acquisition engine so it runs in CI without gnss-sdr.
"""

import numpy as np
import pytest

from galileo_sdr_sim_tpu.codes import boc_chips
from galileo_sdr_sim_tpu.constants import SAMP_RATE
from galileo_sdr_sim_tpu.ops.synth import prepare_device_inputs, synth_block

NS = 26000  # 10 ms of signal (2.5 code periods)
TILE = 512
N_CORR = 10400  # one 4 ms code period at 2.6 Msps


def _acquire(x, prn, dopplers):
    """PCPS: max |circular correlation| over Doppler grid.

    Returns (peak/median metric, best doppler)."""
    t = np.arange(N_CORR) / SAMP_RATE
    idx = (np.floor(t * 2 * 1.023e6).astype(int)) % 8184
    replica = boc_chips("E1B")[prn - 1][idx].astype(np.float64)
    Rf = np.conj(np.fft.fft(replica))
    best = (0.0, 0.0)
    for dopp in dopplers:
        xc = x[:N_CORR] * np.exp(-2j * np.pi * dopp * t)
        corr = np.abs(np.fft.ifft(np.fft.fft(xc) * Rf))
        metric = corr.max() / np.median(corr)
        if metric > best[0]:
            best = (metric, dopp)
    return best


@pytest.fixture(scope="module")
def signal(batch_1s):
    inp = prepare_device_inputs(batch_1s, tile=TILE, nsamples=NS)
    iq = np.asarray(synth_block(inp, tile=TILE, mode="float"))[0, : 2 * NS]
    x = iq[0::2].astype(np.float64) + 1j * iq[1::2].astype(np.float64)
    return x


def test_present_satellites_acquire(batch_1s, signal):
    active = {
        int(batch_1s.prn[c]): float(batch_1s.f_carr[0, c])
        for c in range(len(batch_1s.prn))
        if batch_1s.prn[c] > 0
    }
    assert len(active) >= 4
    for prn, f_carr in active.items():
        dopplers = np.arange(f_carr - 600, f_carr + 601, 200)
        metric, dopp = _acquire(signal, prn, dopplers)
        assert metric > 8.0, f"PRN {prn} not acquired (metric {metric:.1f})"
        assert abs(dopp - f_carr) <= 200, (prn, dopp, f_carr)


def test_absent_satellites_do_not_acquire(batch_1s, signal):
    present = set(int(p) for p in batch_1s.prn if p > 0)
    controls = [p for p in (7, 13, 22, 30) if p not in present][:2]
    for prn in controls:
        metric, _ = _acquire(signal, prn, np.arange(-4000, 4001, 500))
        assert metric < 8.0, f"false acquisition of absent PRN {prn}: {metric:.1f}"


def test_pilot_component_present(batch_1s, signal):
    """The E1C pilot (with secondary code) must also correlate."""
    active = [
        (int(batch_1s.prn[c]), float(batch_1s.f_carr[0, c]))
        for c in range(len(batch_1s.prn))
        if batch_1s.prn[c] > 0
    ]
    t = np.arange(N_CORR) / SAMP_RATE
    idx = (np.floor(t * 2 * 1.023e6).astype(int)) % 8184
    best = 0.0
    for prn, f_carr in active[:3]:
        replica = boc_chips("E1C")[prn - 1][idx].astype(np.float64)
        Rf = np.conj(np.fft.fft(replica))
        for dopp in np.arange(f_carr - 400, f_carr + 401, 100):
            xc = signal[:N_CORR] * np.exp(-2j * np.pi * dopp * t)
            corr = np.abs(np.fft.ifft(np.fft.fft(xc) * Rf))
            best = max(best, corr.max() / np.median(corr))
    assert best > 7.0, f"pilot correlation weak: {best:.1f}"
