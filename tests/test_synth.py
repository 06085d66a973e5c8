"""Synthesis-path tests: device (XLA) vs the float64 parity oracle
(reference hot loop: src/galileo-sdr.cpp:481-539).

CPU-backend note: small tiles/sample counts keep XLA compile times sane;
full-size blocks are exercised on TPU by bench.py.
"""

import numpy as np
import pytest

from galileo_sdr_sim_tpu.ops.oracle import synth_epoch_oracle
from galileo_sdr_sim_tpu.ops.synth import prepare_device_inputs, synth_block

TILE = 512
NS = 26000  # 10 ms worth of validation samples


@pytest.fixture(scope="module")
def device_out(batch_1s):
    inp = prepare_device_inputs(batch_1s, tile=TILE, nsamples=NS)
    lut = np.asarray(synth_block(inp, tile=TILE, mode="lut512"))[:, : 2 * NS]
    flt = np.asarray(synth_block(inp, tile=TILE, mode="float"))[:, : 2 * NS]
    return lut, flt


def test_lut_mode_matches_oracle(batch_1s, device_out):
    lut, _ = device_out
    for e in range(min(2, lut.shape[0])):
        oracle = synth_epoch_oracle(batch_1s, e, nsamples=NS)
        exact = (lut[e] == oracle).mean()
        corr = np.corrcoef(lut[e].astype(float), oracle.astype(float))[0, 1]
        assert exact > 0.995, f"epoch {e}: exact-match fraction {exact}"
        assert corr > 0.999, f"epoch {e}: corr {corr}"


def test_float_mode_tracks_oracle(batch_1s, device_out):
    _, flt = device_out
    oracle = synth_epoch_oracle(batch_1s, 0, nsamples=NS)
    corr = np.corrcoef(flt[0].astype(float), oracle.astype(float))[0, 1]
    assert corr > 0.995


def test_output_format(batch_1s, device_out):
    lut, _ = device_out
    assert lut.dtype == np.int16
    nch = int((batch_1s.prn > 0).sum())
    # peak amplitude bound: sum over channels of |m|<=2 times LUT amp 250
    assert np.abs(lut).max() <= 500 * nch


def test_epoch_padding_consistency(batch_1s):
    """Near-identical samples regardless of tile size: host f64 seeding is
    exact at tile starts; within a tile, f32 phase rounding can flip a
    handful of chip-transition samples."""
    i1 = prepare_device_inputs(batch_1s, tile=TILE, nsamples=NS)
    i2 = prepare_device_inputs(batch_1s, tile=2 * TILE, nsamples=NS)
    a = np.asarray(synth_block(i1, tile=TILE, mode="lut512"))[:, : 2 * NS]
    b = np.asarray(synth_block(i2, tile=2 * TILE, mode="lut512"))[:, : 2 * NS]
    assert (a == b).mean() > 0.995


def test_inactive_channels_contribute_zero(batch_1s):
    import dataclasses

    b = dataclasses.replace(batch_1s)
    b.codes_b = np.zeros_like(b.codes_b)
    b.codes_c = np.zeros_like(b.codes_c)
    inp = prepare_device_inputs(b, tile=TILE, nsamples=NS)
    out = np.asarray(synth_block(inp, tile=TILE, mode="lut512"))
    assert np.all(out == 0)
