#!/usr/bin/env python3
"""Benchmark: steady-state baseband synthesis throughput on one chip.

Prints one JSON line with the primary metric plus auxiliary fields:
  {"metric": "samples_per_sec", "value": N, "unit": "samples/s",
   "vs_baseline": N / 2.6e6,
   "parity_ok": true,              # Pallas == XLA int16 output on-chip
   "e2e_samples_per_sec": N,       # ScenarioEngine -> device -> NullSink
   "e2e_vs_baseline": N / 2.6e6,
   "host_engine_samples_per_sec": N}

Baseline: the reference C++ simulator's hot loop sustains the real-time
rate of 2.6 Msps on one CPU core (BASELINE.md; src/galileo-sdr.cpp:481-539).
vs_baseline is therefore the real-time factor.

Methodology: the fused Pallas (K,p) engine (ops/synth_kp_pallas.py; the
XLA formulation ops/synth_kp.py is the non-TPU fallback) is invoked
inside a jitted fori_loop with a feedback dependency between iterations
and a final scalar readback, so asynchronous dispatch, relay-side
buffering, or result caching cannot inflate the number — this measures
completed device execution only.

parity_ok pins the on-chip claim of docs/kernel_design.md: the fused
Pallas kernel and the XLA lowering produce bit-identical int16 streams
on the production backend (null where no TPU is attached).

e2e_samples_per_sec is the sustained pipeline rate (host scenario engine
-> device synthesis -> drained int16 on host) via io/stream.py's
double-buffered executor, the analogue of the reference's producer loop
(src/galileo-sdr.cpp:570-595).  In this environment the device->host
relay tunnel (~30-45 MB/s incompressible) caps it far below the device
rate; host_engine_samples_per_sec shows the host side is not the
bottleneck (see docs/kernel_design.md "Measurement methodology").
"""

import json
import os
import sys
import time

# persistent compile cache: the relay-side XLA compile of the B=64
# graphs dominates bench wall time; warmed by tests/tools runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the persistent cache config

    from galileo_sdr_sim_tpu.constants import NUM_IQ_SAMPLES
    from galileo_sdr_sim_tpu.gnss_time import DateTime, date2gal
    from galileo_sdr_sim_tpu.ops.synth_kp import (
        K_EPOCH,
        accum_kp,
        default_engine,
        prepare_kp_inputs,
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
    B = 64  # epochs per device call (6.4 s of signal; see docs/kernel_design.md)
    eng = ScenarioEngine(
        nav,
        PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0,
        duration_s=0.1 * B + 0.5,
    )
    batch = next(eng.batches(B))
    engine = default_engine()
    inputs = prepare_kp_inputs(
        batch, NUM_IQ_SAMPLES, pad_epochs=B, pack_g=engine == "pallas"
    )

    R = 10

    @jax.jit
    def chained(inputs):
        def body(i, carry):
            inp = dict(inputs)
            inp["carr0"] = inputs["carr0"] + carry * 1e-9
            acc = accum_kp(inp, n_k=K_EPOCH, engine=engine)
            return carry + jnp.sum(acc[:, ::1313, 0]) * 1e-12
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    float(chained(inputs))  # compile + warm

    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(inputs))  # scalar readback forces completion
        best_dt = min(best_dt, (time.perf_counter() - t0) / R)

    sps = B * NUM_IQ_SAMPLES / best_dt

    # --- on-chip Pallas vs XLA parity (docs/kernel_design.md claim) ----
    # run at B=8 — the bit-identity claim is shape-independent and the
    # full-B XLA-engine compile would dominate bench wall time
    parity_ok = None
    if engine == "pallas":
        from galileo_sdr_sim_tpu.ops.synth_kp import synth_block_kp

        pinputs = {
            k: (v if k in ("vpack", "vpack_gt") else v[:8])
            for k, v in inputs.items()
        }
        out_p = np.asarray(synth_block_kp(pinputs, n_k=K_EPOCH, engine="pallas"))
        out_x = np.asarray(synth_block_kp(pinputs, n_k=K_EPOCH, engine="xla"))
        parity_ok = bool(np.array_equal(out_p, out_x))

    # --- sustained end-to-end pipeline rate ---------------------------
    from galileo_sdr_sim_tpu.io.sinks import NullSink
    from galileo_sdr_sim_tpu.io.stream import StreamingSynthesizer

    eng2 = ScenarioEngine(
        nav,
        PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0,
        duration_s=0.1 * B + 0.5,
    )
    # warm the e2e pipeline's compile (same B -> one compile), then time
    # a fresh engine over the same horizon
    StreamingSynthesizer(eng2, NullSink(), block_epochs=B).run()
    eng3 = ScenarioEngine(
        nav,
        PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0,
        duration_s=30.0,
    )
    stats = StreamingSynthesizer(eng3, NullSink(), block_epochs=B).run()

    # host-side rate alone (scenario engine + device-input prep, no device)
    eng4 = ScenarioEngine(
        nav,
        PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0,
        duration_s=30.0,
    )
    t0 = time.perf_counter()
    host_epochs = 0
    cache: dict = {}
    for batch in eng4.batches(B):
        prepare_kp_inputs(
            batch, NUM_IQ_SAMPLES, pad_epochs=B, code_cache=cache,
            pack_g=engine == "pallas",
        )
        host_epochs += batch.f_code.shape[0]
    host_sps = host_epochs * NUM_IQ_SAMPLES / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "samples_per_sec",
                "value": sps,
                "unit": "samples/s",
                "vs_baseline": sps / 2.6e6,
                "parity_ok": parity_ok,
                "e2e_samples_per_sec": stats.samples_per_sec,
                "e2e_vs_baseline": stats.realtime_factor,
                "host_engine_samples_per_sec": host_sps,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
