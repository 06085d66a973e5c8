"""Scenario-engine tests (reference: src/galileo-sdr.cpp epoch loop +
src/channel.cpp allocation)."""

import numpy as np
import pytest

from galileo_sdr_sim_tpu.constants import EPOCH_DT, MAX_CHAN
from galileo_sdr_sim_tpu.scenario import (
    PositionProvider,
    ScenarioEngine,
    scenario_start_time,
)


STATIC = np.array([42.3601, -71.0589, 100.0])


def test_epoch_count(nav, g0):
    eng = ScenarioEngine(nav, PositionProvider(llh_deg=STATIC), g0, duration_s=2.0)
    tabs = list(eng.epochs())
    # numd = 20 -> numd-1 epochs (reference starts iumd at 1)
    assert len(tabs) == 19


def test_first_epoch_time(nav, g0):
    eng = ScenarioEngine(nav, PositionProvider(llh_deg=STATIC), g0, duration_s=0.5)
    tab = next(eng.epochs())
    # grx incremented twice before the loop (galileo-sdr.cpp:348,436)
    assert np.isclose(tab.grx_sec, g0.sec + 2 * EPOCH_DT)


def test_channels_active_and_stable(engine_1s):
    prns = [c.prn for c in engine_1s.bank.channels if c.prn > 0]
    assert 4 <= len(prns) <= MAX_CHAN
    assert len(set(prns)) == len(prns)


def test_determinism(nav, g0):
    def run():
        eng = ScenarioEngine(nav, PositionProvider(llh_deg=STATIC), g0, 0.5)
        return list(eng.epochs())

    a, b = run(), run()
    for ta, tb in zip(a, b):
        assert np.array_equal(ta.prn, tb.prn)
        assert np.array_equal(ta.f_carr, tb.f_carr)
        assert np.array_equal(ta.code_phase0, tb.code_phase0)
        assert np.array_equal(ta.carr_phase0, tb.carr_phase0)
        assert np.array_equal(ta.sym_win, tb.sym_win)


def test_carrier_phase_continuity(nav, g0):
    """carr_phase(e+1) == frac(carr_phase(e) + f_carr * block_time)."""
    eng = ScenarioEngine(nav, PositionProvider(llh_deg=STATIC), g0, 1.0)
    tabs = list(eng.epochs())
    block_t = 260000 / 2.6e6
    for e in range(len(tabs) - 1):
        for c in range(MAX_CHAN):
            if tabs[e].prn[c] <= 0 or tabs[e + 1].prn[c] != tabs[e].prn[c]:
                continue
            pred = tabs[e].carr_phase0[c] + tabs[e].f_carr[c] * block_t
            pred -= np.trunc(pred)
            assert abs(pred - tabs[e + 1].carr_phase0[c]) < 1e-9


def test_code_phase_near_continuity(nav, g0):
    """Analytic per-epoch code phase must continue the previous epoch's NCO
    trajectory to sub-chip accuracy (the reference relies on this)."""
    eng = ScenarioEngine(nav, PositionProvider(llh_deg=STATIC), g0, 1.0)
    tabs = list(eng.epochs())
    nsamp = 260000
    delt = 1 / 2.6e6
    for e in range(len(tabs) - 1):
        for c in range(MAX_CHAN):
            if tabs[e].prn[c] <= 0 or tabs[e + 1].prn[c] != tabs[e].prn[c]:
                continue
            cp_end = tabs[e].code_phase0[c] + tabs[e].f_code[c] * delt * nsamp
            # epoch boundary: next epoch covers dt=0.10000002314 while the
            # sample clock advanced exactly 0.1 s -> ~0.024 chip offset
            diff = (tabs[e + 1].code_phase0[c] - cp_end) % 4092
            diff = min(diff, 4092 - diff)
            assert diff < 0.5, (e, c, diff)


def test_symbol_windows_valid(engine_1s, batch_1s):
    assert np.all(np.isin(batch_1s.sym_win, (-1, 1)))
    assert np.all(np.isin(batch_1s.pilot_win, (-1, 1)))


def test_batches_cut_on_channel_change(nav, g0):
    eng = ScenarioEngine(nav, PositionProvider(llh_deg=STATIC), g0, 1.0)
    batches = list(eng.batches(4))
    for b in batches:
        assert b.f_code.shape[0] <= 4
        active = b.prn > 0
        assert np.all(b.codes_b[~active] == 0)
        assert np.all(np.any(b.codes_b[active] != 0, axis=1))


def test_trajectory_position(nav, g0):
    traj = np.tile(STATIC, (10, 1))
    traj[:, 0] += np.linspace(0, 0.001, 10)  # ~100 m of motion
    eng = ScenarioEngine(nav, PositionProvider(trajectory=traj), g0, 0.5)
    tabs = list(eng.epochs())
    assert len(tabs) == 4


def test_invalid_start_time(nav):
    from galileo_sdr_sim_tpu.gnss_time import GalTime

    with pytest.raises(ValueError):
        scenario_start_time(nav, GalTime(2196, 0.0))  # before gmin


def test_chunked_fast_path_matches_stepwise(nav, g0):
    """The vectorized chunk path (static/trajectory positions) must match
    the per-epoch path (used for live positions) across a 30 s
    reallocation boundary."""
    from galileo_sdr_sim_tpu.scenario import PositionProvider, ScenarioEngine

    llh = np.array([42.3601, -71.0589, 100.0])
    fast = ScenarioEngine(nav, PositionProvider(llh_deg=llh), g0, 40.0)
    slow = ScenarioEngine(
        nav, PositionProvider(live=lambda: llh), g0, 40.0
    )  # live provider forces the stepwise path
    for tf, ts in zip(fast.epochs(), slow.epochs()):
        assert np.array_equal(tf.prn, ts.prn)
        np.testing.assert_allclose(tf.f_carr, ts.f_carr, rtol=0, atol=1e-9)
        np.testing.assert_allclose(tf.f_code, ts.f_code, rtol=0, atol=1e-9)
        np.testing.assert_allclose(
            tf.code_phase0, ts.code_phase0, rtol=0, atol=1e-9
        )
        np.testing.assert_allclose(
            tf.carr_phase0, ts.carr_phase0, rtol=0, atol=1e-9
        )
        assert np.array_equal(tf.sym_win, ts.sym_win)
        assert np.array_equal(tf.pilot_win, ts.pilot_win)
        np.testing.assert_allclose(tf.gain, ts.gain, rtol=1e-6)


def test_signal_model_is_the_code_seam(nav, g0):
    """ScenarioEngine consumes code banks / secondary code through its
    E1SignalModel (models/e1.py) — the seam where sibling signal models
    (E5a/E6) plug in.  A model with substituted banks must propagate to
    the emitted batches."""
    import dataclasses

    from galileo_sdr_sim_tpu.models.e1 import E1_OS, E1SignalModel
    from galileo_sdr_sim_tpu.scenario import PositionProvider, ScenarioEngine

    class Flipped(E1SignalModel):
        @property
        def data_codes(self):
            return -E1_OS.data_codes

    llh = np.array([42.3601, -71.0589, 100.0])
    eng = ScenarioEngine(
        nav, PositionProvider(llh_deg=llh), g0, 1.0, model=Flipped()
    )
    ref = ScenarioEngine(nav, PositionProvider(llh_deg=llh), g0, 1.0)
    b = next(eng.batches(4))
    r = next(ref.batches(4))
    active = b.prn > 0
    assert np.array_equal(b.codes_b[active], -r.codes_b[active])
    assert np.array_equal(b.codes_c[active], r.codes_c[active])
    # default engine pulls the E1 OS banks
    assert np.array_equal(r.codes_b[active], E1_OS.data_codes[r.prn[active] - 1])
