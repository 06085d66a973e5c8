"""Byte-format contract of the emitted stream — independent of the
receiver chain.

The drop-in compatibility claim (GNSS-SDR's checked-in
gnss-sdr_Galileo_E1_ishort.conf consumes our files unchanged) rests on
an exact byte format: interleaved int16 I,Q pairs, little-endian
("ishort"), 2.6 Msps, 260 000 complex samples per 0.1 s epoch, carrier
amplitude 250 per component so a C-channel scene peaks at <= 500*C
(galileo-sdr.cpp:536-537 writes (short)i_acc,(short)q_acc of
sum_ch (E1B*d - E1C*s)*{cos,sin}Table512 with table amplitude 250,
constants.h:218-251).  Every expectation here is computed from first
principles (code tables + LUT + the mixing formula written out by
hand), NOT via the synthesis engines or the receiver."""

import numpy as np

from galileo_sdr_sim_tpu.codes import boc_chips, carrier_lut, secondary_code
from galileo_sdr_sim_tpu.constants import (
    CA_SEQ_LEN_E1,
    NUM_IQ_SAMPLES,
    SAMP_RATE,
)


def test_epoch_block_geometry():
    assert SAMP_RATE == 2.6e6
    assert NUM_IQ_SAMPLES == 260000  # samples per 0.1 s epoch


def test_file_sink_writes_little_endian_interleaved(tmp_path):
    from galileo_sdr_sim_tpu.io.sinks import FileSink

    iq = np.array([[1, -2, 300, -400]], np.int16)  # I0 Q0 I1 Q1
    p = tmp_path / "fmt.bin"
    s = FileSink(p)
    s.write(iq)
    s.close()
    raw = p.read_bytes()
    assert raw == np.array([1, -2, 300, -400], dtype="<i2").tobytes()
    # explicit little-endian byte layout of the first value
    assert raw[:2] == b"\x01\x00"


def test_single_channel_samples_from_first_principles():
    """One channel, hand-written mixing formula vs the emitted samples.

    sample n:  hc   = floor(2 * (cp0 + f_code/fs * n)) of the 8184 bank
               d    = -1 if page bit else +1 ; s = -secondary[ibit % 25]
               ...  m = E1B[hc]*d - E1C[hc]*s
               I, Q = m * cos512[(int(511*phi)) & 511], m * sin512[...]
    computed here with plain Python ints/floats — no engine code."""
    from galileo_sdr_sim_tpu.ops.synth import prepare_device_inputs, synth_block
    from galileo_sdr_sim_tpu.scenario import SYM_WIN, EpochBatch
    from galileo_sdr_sim_tpu.models.e1 import E1_OS

    prn = 7
    f_carr = 1234.0
    f_code = 1.023e6 + f_carr / 1540.0
    cp0, ph0, ibit0 = 100.25, 0.375, 3
    bits = np.array([0, 1, 1, 0, 1, 0, 0, 1] * 4, np.int8)[:SYM_WIN]
    sym = np.where(bits > 0, -1, 1).astype(np.int8)
    sec = secondary_code()  # (25,) +-1
    pilot = np.array(
        [sec[(ibit0 + k) % 25] for k in range(SYM_WIN)], np.int8
    )
    # the engine indexes sym_win by wraps since epoch start, i.e. entry
    # k corresponds to symbol ibit0+k — bits above are already that view
    batch = EpochBatch(
        grx_sec=np.array([0.0]),
        prn=np.array([prn], np.int32),
        f_carr=np.array([[f_carr]]),
        f_code=np.array([[f_code]]),
        code_phase0=np.array([[cp0]]),
        carr_phase0=np.array([[ph0]]),
        sym_win=sym[None, None, :],
        pilot_win=pilot[None, None, :],
        gain=np.ones((1, 1), np.float32),
        codes_b=E1_OS.data_codes[prn - 1 : prn],
        codes_c=E1_OS.pilot_codes[prn - 1 : prn],
    )
    N = 4096
    inp = prepare_device_inputs(batch, tile=512, nsamples=N)
    out = np.asarray(synth_block(inp, tile=512, mode="lut512"))[0, : 2 * N]

    cos512, sin512 = carrier_lut()
    e1b = boc_chips("E1B")[prn - 1]
    e1c = boc_chips("E1C")[prn - 1]
    delt = 1.0 / SAMP_RATE
    expect = np.empty(2 * N, np.int16)
    for n in range(N):
        cp = cp0 + f_code * delt * n
        wrap = int(cp // CA_SEQ_LEN_E1)
        hc = int(2.0 * (cp - wrap * CA_SEQ_LEN_E1))
        d = int(sym[wrap])
        s = int(pilot[wrap])
        phi = ph0 + f_carr * delt * n
        phi -= int(phi)
        m = int(e1b[hc]) * d - int(e1c[hc]) * s
        expect[2 * n] = np.int16(m * int(cos512[(int(511 * phi)) & 511]))
        expect[2 * n + 1] = np.int16(m * int(sin512[(int(511 * phi)) & 511]))
    match = (out == expect).mean()
    # float32 device phases can tick a chip/LUT boundary by one sample
    assert match > 0.995, match
    # amplitude contract: one channel peaks at exactly 2*250
    assert np.abs(out).max() <= 500
    assert np.abs(out).max() >= 400  # carrier LUT reaches near-peak


def test_pilot_secondary_sign_convention():
    """The E1C term enters the mix as MINUS the secondary-coded pilot
    (ip = (E1B*d - E1C*s)*cos, galileo-sdr.cpp:521): flipping the
    pilot_win sign must flip the pilot contribution only."""
    from galileo_sdr_sim_tpu.ops.synth import prepare_device_inputs, synth_block
    from galileo_sdr_sim_tpu.scenario import SYM_WIN, EpochBatch
    from galileo_sdr_sim_tpu.models.e1 import E1_OS

    def mk(pilot_sign):
        return EpochBatch(
            grx_sec=np.array([0.0]),
            prn=np.array([4], np.int32),
            f_carr=np.array([[0.0]]),
            f_code=np.array([[1.023e6]]),
            code_phase0=np.array([[0.0]]),
            carr_phase0=np.array([[0.0]]),
            sym_win=np.ones((1, 1, SYM_WIN), np.int8),
            pilot_win=pilot_sign * np.ones((1, 1, SYM_WIN), np.int8),
            gain=np.ones((1, 1), np.float32),
            codes_b=E1_OS.data_codes[3:4],
            codes_c=E1_OS.pilot_codes[3:4],
        )

    N = 1024
    outs = {}
    for sgn in (1, -1):
        inp = prepare_device_inputs(mk(sgn), tile=512, nsamples=N)
        outs[sgn] = np.asarray(
            synth_block(inp, tile=512, mode="lut512")
        )[0, : 2 * N].astype(np.int32)
    # data part: (o(+) + o(-))/2 ; pilot part: (o(+) - o(-))/2
    data = (outs[1] + outs[-1]) // 2
    pilot = (outs[1] - outs[-1]) // 2
    cos512, _ = carrier_lut()
    e1b = boc_chips("E1B")[3]
    e1c = boc_chips("E1C")[3]
    delt = 1.0 / SAMP_RATE
    for n in range(0, N, 97):
        hc = int(2.0 * ((1.023e6 * delt * n) % CA_SEQ_LEN_E1))
        c0 = int(cos512[0])
        assert data[2 * n] == int(e1b[hc]) * c0
        assert pilot[2 * n] == -int(e1c[hc]) * c0
