"""Real-time pacing contract (GALILEO_RT=1 gated).

The file-less analogue of the reference's USRP sustain requirement
(include/constants.h:82-83: a 0.2 s FIFO between galileo_task and
tx_task must never run dry at 2.6 Msps): the full production pipeline
(scenario -> device synthesis -> native C++ ring) feeds a DAC-clock-
paced consumer that claims exactly 2.6 Msps in SAMPLES_PER_BUFFER
chunks for >= 60 signal-seconds.  Pass = ZERO underruns after the
0.1 s-of-signal warmup preload (a real DAC would have glitched
otherwise) and producer lead bounded by the ring capacity throughout
(reference-style blocking-write backpressure).

Run:  GALILEO_RT=1 python -m pytest tests/test_realtime_pacing.py -q
on the TPU host (the gate exists because 60 s of synthesis is heavy for
the CPU-only CI, where the direct engine runs ~0.5x realtime).  The
latest run's margin is recorded in docs/realtime.md.
"""

import os
import threading
import time

import numpy as np
import pytest

from galileo_sdr_sim_tpu.constants import (
    FIFO_LENGTH,
    SAMP_RATE,
    SAMPLES_PER_BUFFER,
)

pytestmark = pytest.mark.skipif(
    not os.environ.get("GALILEO_RT"),
    reason="real-time pacing run synthesizes >= 60 s of signal against a "
    "DAC-paced consumer; run with GALILEO_RT=1 (TPU host)",
)

DURATION_S = float(os.environ.get("GALILEO_RT_DURATION", "62"))


class PacedDacConsumer:
    """Reads the ring at exactly SAMP_RATE, counting underruns.

    Mirrors tx_task (src/main.cpp:55-127): SAMPLES_PER_BUFFER chunks on
    the DAC clock.  An underrun = the DAC's chunk deadline arrives and
    the ring cannot supply a full chunk."""

    def __init__(self, ring, total_samples: int):
        self.ring = ring
        self.total = total_samples
        self.underruns = 0
        self.underrun_at = []  # signal-seconds where the DAC starved
        self.consumed = 0
        self.max_lead = 0
        self.min_avail_after_warmup = None
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._thread.start()

    def join(self):
        self._thread.join()

    def _run(self):
        chunk = SAMPLES_PER_BUFFER
        period = chunk / SAMP_RATE
        # warmup: wait for a full reference FIFO of preload (0.2 s; the
        # reference waits for the first full epoch before starting
        # tx_task, main.cpp:376-380, and its producer then runs ahead
        # to fill the FIFO before the DAC can starve)
        warm_deadline = time.perf_counter() + 60.0
        while (
            self.ring.available < FIFO_LENGTH - SAMPLES_PER_BUFFER
            and time.perf_counter() < warm_deadline
        ):
            time.sleep(0.005)
        next_t = time.perf_counter()
        while self.consumed < self.total:
            next_t += period
            need = min(chunk, self.total - self.consumed)
            avail = self.ring.available
            self.max_lead = max(self.max_lead, avail)
            if self.min_avail_after_warmup is None or avail < self.min_avail_after_warmup:
                self.min_avail_after_warmup = avail
            if avail < need:
                self.underruns += 1
                self.underrun_at.append(round(self.consumed / SAMP_RATE, 2))
            got = self.ring.read(need)
            self.consumed += got.size // 2
            if got.size == 0:  # EOF
                break
            lag = next_t - time.perf_counter()
            if lag > 0:
                time.sleep(lag)
            # a late read does not "catch up" by reading faster — the
            # DAC clock keeps ticking; next deadline stays fixed


def test_realtime_pacing_contract():
    from galileo_sdr_sim_tpu.gnss_time import DateTime, date2gal
    from galileo_sdr_sim_tpu.io.native_fifo import IqRing
    from galileo_sdr_sim_tpu.io.sinks import Sink
    from galileo_sdr_sim_tpu.io.stream import StreamingSynthesizer
    from galileo_sdr_sim_tpu.rinex import read_rinex_v3
    from galileo_sdr_sim_tpu.scenario import (
        PositionProvider,
        ScenarioEngine,
        scenario_start_time,
    )

    nav = read_rinex_v3("/root/reference/rinex_files/20feb2022.rnx")
    g0 = scenario_start_time(nav, date2gal(DateTime(2022, 2, 20, 8, 0, 1)))
    eng = ScenarioEngine(
        nav,
        PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0,
        duration_s=DURATION_S,
    )

    ring = IqRing(FIFO_LENGTH)  # 0.2 s, the reference depth

    class RingSink(Sink):
        def write(self, iq: np.ndarray) -> None:
            ring.write(iq)  # blocking: reference-style backpressure

    n_epochs = int(DURATION_S * 10 + 0.5) - 1
    total = n_epochs * 260000
    dac = PacedDacConsumer(ring, total)

    synth = StreamingSynthesizer(eng, RingSink())
    dac.start()
    t0 = time.perf_counter()
    stats = synth.run()
    ring.close_write()
    dac.join()
    wall = time.perf_counter() - t0

    signal_s = dac.consumed / SAMP_RATE
    print(
        f"\nRT pacing: {signal_s:.1f} signal-s in {wall:.1f} wall-s, "
        f"underruns={dac.underruns}, max_lead={dac.max_lead} samples "
        f"({dac.max_lead / SAMP_RATE * 1e3:.0f} ms), min_avail="
        f"{dac.min_avail_after_warmup}, synth {stats.samples_per_sec/1e6:.0f} Msps"
    )
    assert dac.consumed == total
    # >= 60 signal-seconds at the default duration; GALILEO_RT_DURATION
    # can shorten the run for smoke checks of the harness itself
    assert signal_s >= min(60.0, DURATION_S - 2.0)
    assert dac.underruns == 0, (
        f"{dac.underruns} DAC underruns at signal-s {dac.underrun_at[:10]}"
    )
    # producer lead bounded by the ring capacity (backpressure held)
    assert dac.max_lead <= FIFO_LENGTH
