"""-T TOC/TOE overwrite tests (BASELINE config 3).

The reference's -T path iterates a stale array and is effectively a no-op
on the ephemerides actually used (SURVEY quirk list); this framework
implements the documented intent: shift all TOC/TOE so the scenario can
start at an arbitrary wall time.
"""

import numpy as np

from galileo_sdr_sim_tpu.gnss_time import DateTime, date2gal
from galileo_sdr_sim_tpu.rinex import read_rinex_v3
from galileo_sdr_sim_tpu.scenario import (
    PositionProvider,
    ScenarioEngine,
    scenario_start_time,
)

from conftest import RINEX

STATIC = np.array([42.3601, -71.0589, 100.0])


def test_overwrite_shifts_ephemerides():
    nav = read_rinex_v3(RINEX)
    toc_before = nav.eph[0][0].toc
    # a start time far outside the original ephemeris window
    g0_req = date2gal(DateTime(2025, 6, 1, 12, 0, 0.0))
    g0 = scenario_start_time(nav, g0_req, timeoverwrite=True)
    assert g0.week == g0_req.week and g0.sec == g0_req.sec
    toc_after = nav.eph[0][0].toc
    # all records shifted by the same (7200 s-quantized) offset
    shift = toc_after - toc_before
    assert abs(shift) > 3600
    for recs in nav.eph:
        for r in recs:
            assert abs((r.toe - r.toc) % 7200) < 7200  # still consistent
    assert nav.iono.wnt == g0_req.week


def test_overwrite_scenario_runs():
    nav = read_rinex_v3(RINEX)
    g0_req = date2gal(DateTime(2025, 6, 1, 12, 0, 0.0))
    g0 = scenario_start_time(nav, g0_req, timeoverwrite=True)
    eng = ScenarioEngine(nav, PositionProvider(llh_deg=STATIC), g0, 0.5)
    tabs = list(eng.epochs())
    assert len(tabs) == 4
    # The shift semantics replay the *file start*, where this RINEX only
    # carries records for a handful of SVs — at least one must be usable.
    assert int((tabs[0].prn > 0).sum()) >= 1
    active = np.flatnonzero(tabs[0].prn > 0)
    assert np.all(np.abs(tabs[0].f_carr[active]) < 5000)
