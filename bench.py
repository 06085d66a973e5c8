#!/usr/bin/env python3
"""Benchmark: steady-state baseband synthesis throughput on one chip.

Prints one JSON line:
  {"metric": "samples_per_sec", "value": N, "unit": "samples/s",
   "vs_baseline": N / 2.6e6}

Baseline: the reference C++ simulator's hot loop sustains the real-time
rate of 2.6 Msps on one CPU core (BASELINE.md: real-time requirement;
src/galileo-sdr.cpp:481-539).  vs_baseline is therefore the real-time
factor: how many simultaneous full-rate E1 scenarios one chip can feed.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    from galileo_sdr_sim_tpu.constants import NUM_IQ_SAMPLES
    from galileo_sdr_sim_tpu.gnss_time import DateTime, date2gal
    from galileo_sdr_sim_tpu.ops.synth import (
        TILE,
        prepare_device_inputs,
        synth_block,
    )
    from galileo_sdr_sim_tpu.rinex import read_rinex_v3
    from galileo_sdr_sim_tpu.scenario import (
        PositionProvider,
        ScenarioEngine,
        scenario_start_time,
    )

    rinex = "/root/reference/rinex_files/20feb2022.rnx"
    nav = read_rinex_v3(rinex)
    g0 = scenario_start_time(nav, date2gal(DateTime(2022, 2, 20, 8, 0, 1)))
    eng = ScenarioEngine(
        nav,
        PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0,
        duration_s=2.0,
    )
    batch = next(eng.batches(8))
    B = batch.f_code.shape[0]
    inputs = prepare_device_inputs(batch, TILE, NUM_IQ_SAMPLES)

    # Warm-up / compile.
    out = synth_block(inputs, tile=TILE, mode="float")
    out.block_until_ready()

    # Steady state: repeat enough for a stable measurement.
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = synth_block(inputs, tile=TILE, mode="float")
    out.block_until_ready()
    dt = time.perf_counter() - t0

    total_samples = reps * B * NUM_IQ_SAMPLES
    sps = total_samples / dt
    print(
        json.dumps(
            {
                "metric": "samples_per_sec",
                "value": sps,
                "unit": "samples/s",
                "vs_baseline": sps / 2.6e6,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
