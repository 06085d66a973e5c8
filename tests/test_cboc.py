"""CBOC(6,1,1/11) signal model through the signal-model seam.

The reference transmits sine-BOC(1,1) only (its eval config sets
Acquisition_1B.cboc=false, reference gnss-sdr_Galileo_E1_ishort.conf:48);
models/cboc.py adds the real OS modulation.  These tests prove the seam
carries a genuinely different modulation end-to-end: different table
shape/dtype selected purely by the model object, automatic routing to
the direct engine, and a sine-BOC receiver still acquiring the CBOC
stream at the expected ~-0.4 dB correlation penalty.
"""

import numpy as np
import pytest

from galileo_sdr_sim_tpu import codes
from galileo_sdr_sim_tpu.constants import CA_SEQ_LEN_E1, NUM_IQ_SAMPLES
from galileo_sdr_sim_tpu.models.cboc import ALPHA, BETA, CBOC_SUBDIV, E1_CBOC
from galileo_sdr_sim_tpu.rx_track import acquire, iq_to_complex
from galileo_sdr_sim_tpu.scenario import PositionProvider, ScenarioEngine


def test_cboc_table_structure():
    """Component tables decompose exactly into the ICD's subcarrier sum:
    B = chip*(a*sc1 + b*sc6), C = chip*(a*sc1 - b*sc6), unit power."""
    tb = E1_CBOC.data_codes
    tc = E1_CBOC.pilot_codes
    assert tb.shape == (50, CA_SEQ_LEN_E1 * CBOC_SUBDIV)
    assert tb.dtype == np.float32
    # unit power per component
    assert abs(ALPHA**2 + BETA**2 - 1.0) < 1e-6
    np.testing.assert_allclose((tb**2).mean(), 1.0, rtol=1e-5)

    chips_b = codes.primary_chips("E1B").astype(np.float32)
    chips_c = codes.primary_chips("E1C").astype(np.float32)
    vb = tb.reshape(50, CA_SEQ_LEN_E1, CBOC_SUBDIV)
    vc = tc.reshape(50, CA_SEQ_LEN_E1, CBOC_SUBDIV)
    # the sc1 part (the mean over each half chip) matches the sine-BOC
    # sign convention: first half -chip, second half +chip, scaled ALPHA
    np.testing.assert_allclose(
        vb[:, :, :6].mean(-1), -ALPHA * chips_b, rtol=1e-5
    )
    np.testing.assert_allclose(
        vb[:, :, 6:].mean(-1), ALPHA * chips_b, rtol=1e-5
    )
    # data + pilot sc6 components are anti-phase (ICD: pilot subtracts):
    # first sub-interval value is chip*(-a - b) for B, chip*(-a + b) for C
    np.testing.assert_allclose(
        vb[:, :, 0] / chips_b, -ALPHA - BETA, rtol=1e-5
    )
    np.testing.assert_allclose(
        vc[:, :, 0] / chips_c, -ALPHA + BETA, rtol=1e-5
    )


def test_seam_routes_cboc_to_kp_engine(nav, g0):
    """CBOC now runs on the factorized (K,p) engines (the 12-grid tables
    factor over the sine-BOC banks — ops/synth_kp.py cboc branch), so
    the streaming executor keeps the fused-kernel rate; only genuinely
    unknown geometries fall back to the direct engine."""
    from dataclasses import replace

    from galileo_sdr_sim_tpu.io.sinks import NullSink
    from galileo_sdr_sim_tpu.io.stream import StreamingSynthesizer

    eng = ScenarioEngine(
        nav, PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0, duration_s=0.2, model=E1_CBOC,
    )
    s = StreamingSynthesizer(eng, NullSink(), synth_engine="auto")
    assert s.synth_engine in ("kp", "kp_pallas")

    eng2 = ScenarioEngine(
        nav, PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0, duration_s=0.2,
        model=replace(E1_CBOC, code_subdiv=4),  # hypothetical geometry
    )
    s2 = StreamingSynthesizer(eng2, NullSink(), synth_engine="auto")
    assert s2.synth_engine == "direct"


@pytest.fixture(scope="module")
def cboc_stream(nav, g0):
    from galileo_sdr_sim_tpu.ops.synth import synth_batch_host

    eng = ScenarioEngine(
        nav, PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0, duration_s=0.6, model=E1_CBOC,
    )
    iq = []
    for batch in eng.batches(4):
        iq.append(synth_batch_host(batch, mode="float"))
    x16 = np.concatenate(iq).reshape(-1).astype(np.int16)
    prns = sorted(c.prn for c in eng.bank.channels if c.prn > 0)
    f_carr = {c.prn: c.f_carr for c in eng.bank.channels if c.prn > 0}
    return iq_to_complex(x16), prns, f_carr


def test_sineboc_receiver_acquires_cboc(cboc_stream):
    """A sine-BOC receiver correlates the CBOC stream at a = sqrt(10/11)
    of full power (-0.4 dB): all present PRNs must still acquire with
    the correct Doppler; absent PRNs stay at the floor."""
    x, prns, f_carr = cboc_stream
    assert len(prns) >= 4
    for prn in prns:
        a = acquire(x, prn)
        assert a.metric > 8.0, (prn, a.metric)
        # the sc6 component slightly flattens the 250 Hz-wide Doppler
        # main lobe, so the winning 100 Hz cell can jitter a bin or two
        # around the true Doppler — 300 Hz bounds that while still
        # pinning the detection to the right satellite
        assert abs(a.doppler - f_carr[prn]) <= 300.0, (prn, a.doppler)
    for prn in (6, 17):
        assert acquire(x, prn).metric < 6.0


def test_kp_prepare_derives_cboc_factorization(nav, g0):
    """prepare_kp_inputs recovers the sine-BOC ±1 banks and the
    (alpha, beta) weights from the model's own 12-grid tables; unknown
    geometries are still rejected."""
    from galileo_sdr_sim_tpu import codes
    from galileo_sdr_sim_tpu.ops.synth_kp import prepare_kp_inputs

    eng = ScenarioEngine(
        nav, PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0, duration_s=0.2, model=E1_CBOC,
    )
    batch = next(eng.batches(2))
    inp = prepare_kp_inputs(batch, NUM_IQ_SAMPLES)
    ab = np.asarray(inp["cboc_ab"])
    np.testing.assert_allclose(ab, [ALPHA, BETA], atol=1e-6)

    from dataclasses import replace

    bad = replace(
        batch,
        codes_b=batch.codes_b[:, : 4 * 4092],
        codes_c=batch.codes_c[:, : 4 * 4092],
    )
    with pytest.raises(AssertionError, match="geometries"):
        prepare_kp_inputs(bad, NUM_IQ_SAMPLES)


@pytest.fixture(scope="module")
def cboc_kp_stream(nav, g0):
    from galileo_sdr_sim_tpu.ops.synth_kp import synth_batch_kp_host

    eng = ScenarioEngine(
        nav, PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0, duration_s=0.6, model=E1_CBOC,
    )
    iq, batches = [], []
    for batch in eng.batches(4):
        batches.append(batch)
        iq.append(synth_batch_kp_host(batch, engine="xla"))
    x16 = np.concatenate(iq).reshape(-1).astype(np.int16)
    prns = sorted(c.prn for c in eng.bank.channels if c.prn > 0)
    f_carr = {c.prn: c.f_carr for c in eng.bank.channels if c.prn > 0}
    return batches, x16, prns, f_carr


def test_kp_cboc_matches_direct_engine(cboc_kp_stream):
    """The factorized CBOC branch reproduces the direct engine's
    table-lookup output up to one-sample timing ULPs: every sample
    differing by more than a truncation tie sits within f32 phase
    tolerance (< 2e-3 chip) of a 1/12-chip subcarrier transition, and
    those boundary-adjacent samples are ~0.7% of the stream (12
    transitions/chip x 1023/1300 chips/sample)."""
    from galileo_sdr_sim_tpu.ops.synth import prepare_device_inputs, synth_block
    from galileo_sdr_sim_tpu.ops.synth_kp import DELT, synth_batch_kp_host

    batches, _, _, _ = cboc_kp_stream
    batch = batches[0]
    NS = NUM_IQ_SAMPLES
    dinp = prepare_device_inputs(batch, nsamples=NS)
    direct = np.asarray(synth_block(dinp, mode="float"))[:, : 2 * NS]
    kp = synth_batch_kp_host(batch, NS, engine="xla")
    diff = direct.astype(np.int32) - kp.astype(np.int32)
    assert (diff == 0).mean() > 0.98, (diff == 0).mean()

    b_idx, flat = np.nonzero(np.abs(diff) > 2)
    assert b_idx.size < 0.02 * diff.size
    a = batch.f_code * DELT
    for b, n in zip(b_idx[:200], (flat // 2)[:200]):
        c = batch.code_phase0[b].astype(np.float64) + a[b] * n
        x12 = 12.0 * c
        d = np.abs(x12 - np.round(x12)).min()  # nearest transition
        assert d < 0.025, (b, n, d)  # 0.025/12 chip ~ 2e-3 chip


def test_sineboc_receiver_acquires_kp_cboc(cboc_kp_stream):
    """Receiver-level check on the production path's CBOC output: the
    sine-BOC receiver acquires every present PRN from the (K,p) engine's
    stream at the expected -0.4 dB penalty, correct Doppler."""
    _, x16, prns, f_carr = cboc_kp_stream
    x = iq_to_complex(x16)
    assert len(prns) >= 4
    for prn in prns:
        a = acquire(x, prn)
        assert a.metric > 8.0, (prn, a.metric)
        assert abs(a.doppler - f_carr[prn]) <= 300.0, (prn, a.doppler)
    for prn in (6, 17):
        assert acquire(x, prn).metric < 6.0
