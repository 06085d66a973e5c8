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
        default_engine,
        prepare_kp_inputs,
        synth_block_kp,
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
        # the carry perturbs BOTH carr0 and cp0: production feeds fresh
        # values of every input each call, so nothing (e.g. the chip-
        # window anchors, which depend only on cp0) may be hoisted out
        # of the loop as loop-invariant by XLA's LICM
        def body(i, carry):
            inp = dict(inputs)
            inp["carr0"] = inputs["carr0"] + carry * 1e-9
            inp["cp0"] = inputs["cp0"] + carry * 1e-9
            out = synth_block_kp(inp, n_k=K_EPOCH, engine=engine)
            return carry + jnp.sum(
                out[:, ::2626].astype(jnp.float32)
            ) * 1e-12
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
    # full-B XLA-engine compile would dominate bench wall time.  Checked
    # at the scenario seed plus adversarial perturbations (half-chip
    # boundary phases, carrier frac-wrap, negated drift) — same shapes,
    # so the extra cases cost no recompiles.  The full multi-shape sweep
    # is tools/tpu_parity_check.py.
    parity_ok = None
    parity_cases = 0
    if engine == "pallas":
        pinputs = {
            k: (v if k in ("vpack", "vpack_rs") else v[:8])
            for k, v in inputs.items()
        }
        from galileo_sdr_sim_tpu.ops.synth_kp import COLS, P_GRID

        rng = np.random.default_rng(7)
        B8, C8 = np.asarray(pinputs["cp0"]).shape
        cases = [pinputs]
        for mode in range(3):
            inp = {k: np.asarray(v) for k, v in pinputs.items()
                   if k not in ("vpack", "vpack_rs")}
            cp0 = rng.uniform(0, 4 * COLS, (B8, C8)).astype(np.float32)
            if mode == 1:  # exact half-chip boundaries
                cp0 = np.round(cp0 * 2).astype(np.float32) / np.float32(2)
            inp["cp0"] = cp0
            inp["carr0"] = (
                np.nextafter(np.ones((B8, C8), np.float32), 0)
                if mode == 2
                else rng.uniform(0, 1, (B8, C8)).astype(np.float32)
            )
            sign = -1.0 if mode % 2 else 1.0
            mu = (sign * rng.uniform(5e-4, 3e-3, (B8, C8))).astype(np.float32)
            inp["mu"] = mu
            inp["two_a"] = (
                (mu.astype(np.float64) + COLS) / P_GRID
            ).astype(np.float32)
            # carrier rate too (mirrors tools/tpu_parity_check.perturb):
            # large |fc| exercises the fc_k frac-wrap path per K step
            fc = rng.uniform(-3e-3, 3e-3, (B8, C8)).astype(np.float32)
            inp["fc"] = fc
            fc_k = fc.astype(np.float64) * P_GRID
            inp["fc_k"] = (fc_k - np.floor(fc_k)).astype(np.float32)
            inp["vpack"] = pinputs["vpack"]
            inp["vpack_rs"] = pinputs["vpack_rs"]
            cases.append(inp)
        parity_ok = True
        for inp in cases:
            out_p = np.asarray(synth_block_kp(inp, n_k=K_EPOCH, engine="pallas"))
            out_x = np.asarray(synth_block_kp(inp, n_k=K_EPOCH, engine="xla"))
            parity_cases += 1
            parity_ok = parity_ok and bool(np.array_equal(out_p, out_x))

    # --- CBOC(6,1,1/11) rate at the production shape -------------------
    # the real OS modulation (models/cboc.py) runs on the same fused
    # kernel via the factorized weight branch (ops/synth_kp.py cboc);
    # ~10 extra VPU ops per channel-sample instead of the direct
    # engine's gather-bound path
    from galileo_sdr_sim_tpu.models.cboc import ALPHA, BETA

    cboc_inputs = dict(inputs)
    cboc_inputs["cboc_ab"] = jnp.asarray([ALPHA, BETA], jnp.float32)

    @jax.jit
    def chained_cboc(inputs):
        def body(i, carry):
            inp = dict(inputs)
            inp["carr0"] = inputs["carr0"] + carry * 1e-9
            inp["cp0"] = inputs["cp0"] + carry * 1e-9
            out = synth_block_kp(inp, n_k=K_EPOCH, engine=engine)
            return carry + jnp.sum(
                out[:, ::2626].astype(jnp.float32)
            ) * 1e-12
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    float(chained_cboc(cboc_inputs))
    best_cboc = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained_cboc(cboc_inputs))
        best_cboc = min(best_cboc, (time.perf_counter() - t0) / R)
    cboc_sps = B * NUM_IQ_SAMPLES / best_cboc

    # --- B=1 low-latency (interactive -i) call rate --------------------
    # the CLI drops to block_epochs=1 in interactive mode so a UDP 7533
    # position update reaches emitted samples within one 0.1 s epoch;
    # this is the device-call rate that bounds that path (reference
    # guarantee: galileo-sdr.cpp:443 picks up llhr each epoch)
    b1_inputs = {
        k: (v if k in ("vpack", "vpack_rs") else v[:1])
        for k, v in inputs.items()
    }

    @jax.jit
    def chained_b1(inputs):
        def body(i, carry):
            inp = dict(inputs)
            inp["carr0"] = inputs["carr0"] + carry * 1e-9
            inp["cp0"] = inputs["cp0"] + carry * 1e-9
            out = synth_block_kp(inp, n_k=K_EPOCH, engine=engine)
            return carry + jnp.sum(
                out[:, ::2626].astype(jnp.float32)
            ) * 1e-12
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    float(chained_b1(b1_inputs))
    best_b1 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained_b1(b1_inputs))
        best_b1 = min(best_b1, (time.perf_counter() - t0) / R)
    b1_sps = NUM_IQ_SAMPLES / best_b1

    # --- TPU production-path acceptance artifact -----------------------
    # Synthesize the PVT scene through the PRODUCTION pipeline
    # (StreamingSynthesizer + the fused Pallas engine on the chip) and
    # run the full in-repo receiver on the drained samples: the bench
    # then carries a position error produced from samples the production
    # kernel actually emitted (the analogue of the reference's file-sink
    # run consumed by GNSS-SDR, gnss-sdr_Galileo_E1_ishort.conf:36-100).
    from galileo_sdr_sim_tpu.io.sinks import NullSink
    from galileo_sdr_sim_tpu.io.stream import StreamingSynthesizer

    fix_error_m = None
    n_sats_decoded = None
    if engine == "pallas":
        from galileo_sdr_sim_tpu import geodesy
        from galileo_sdr_sim_tpu.constants import R2D
        from galileo_sdr_sim_tpu.rx_pvt import receiver_fix
        from galileo_sdr_sim_tpu.rx_track import iq_to_complex

        class _Collect:
            def __init__(self):
                self.blocks = []

            def write(self, b):
                self.blocks.append(np.asarray(b))

            def close(self):
                pass

        static = np.array([42.3601, -71.0589, 100.0])
        g18 = scenario_start_time(
            nav, date2gal(DateTime(2022, 2, 20, 8, 0, 18))
        )
        eng_p = ScenarioEngine(
            nav, PositionProvider(llh_deg=static), g18, duration_s=19.0
        )
        sink = _Collect()
        StreamingSynthesizer(eng_p, sink, block_epochs=8).run()
        x16 = np.concatenate(
            [b for b in sink.blocks if b.shape[0] == 8]
        ).reshape(-1).astype(np.int16)
        fix = receiver_fix(iq_to_complex(x16))
        if fix is not None:
            truth = geodesy.llh2xyz(
                np.array([static[0] / R2D, static[1] / R2D, static[2]])
            )
            fix_error_m = float(np.linalg.norm(fix.solution.xyz - truth))
            n_sats_decoded = int(fix.solution.n_sats)

    # --- tunnel-independent pipeline rate (device-resident sink) -------
    # ScenarioEngine -> device synthesis with only a per-block scalar
    # checksum read back (4 B/block instead of 26 MB/block), so the
    # steady-state host-prep + device-execute pipeline rate is visible
    # even though this environment's device->host relay tunnel caps
    # full drains at ~30-45 MB/s.  The analogue of the reference's
    # producer-loop rate with the consumer detached
    # (src/galileo-sdr.cpp:570-595).
    csum = jax.jit(
        lambda o: jnp.sum(o[:, ::1001].astype(jnp.float32))
    )
    eng_d = ScenarioEngine(
        nav,
        PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0,
        duration_s=30.0,
    )
    cache_d: dict = {}
    # warm both compiles (same shapes as the loop) outside the timing
    _w = synth_block_kp(inputs, n_k=K_EPOCH, engine=engine)
    float(csum(_w))
    t0 = time.perf_counter()
    dev_epochs = 0
    sums = []
    for batch in eng_d.batches(B):
        inputs_d = prepare_kp_inputs(
            batch, NUM_IQ_SAMPLES, pad_epochs=B, code_cache=cache_d,
            pack_g=engine == "pallas",
        )
        out = synth_block_kp(inputs_d, n_k=K_EPOCH, engine=engine)
        sums.append(csum(out))
        dev_epochs += batch.f_code.shape[0]
    float(sum(float(s) for s in sums))  # drain the device queue
    devsink_sps = dev_epochs * NUM_IQ_SAMPLES / (time.perf_counter() - t0)

    # --- pipelined device-resident sink (io/stream.py drain_host=False)
    # Same workload through the PRODUCTION executor: the producer thread
    # preps/uploads/dispatches pipeline_depth blocks ahead while the
    # sink consumes device arrays (a jitted checksum; no D2H sample
    # traffic), so relay dispatch round-trips overlap — the input-side
    # double buffer this round added.  Compare against devsink_sps
    # (the serial prep->dispatch loop above).
    class _DevSink:
        def __init__(self):
            self.sums = []

        def write(self, blk):
            self.sums.append(csum(blk) if not isinstance(blk, np.ndarray)
                             else float(blk[:, ::1001].astype(np.float32).sum()))

        def close(self):
            pass

    eng_dp = ScenarioEngine(
        nav,
        PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0,
        duration_s=30.0,
    )
    dsink = _DevSink()
    t0 = time.perf_counter()
    st_dp = StreamingSynthesizer(
        eng_dp, dsink, block_epochs=B, drain_host=False, pipeline_depth=3
    ).run()
    float(sum(float(s) for s in dsink.sums))  # force everything
    devsink_pipe_sps = st_dp.samples / (time.perf_counter() - t0)

    # --- sustained end-to-end pipeline rate ---------------------------

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
                "parity_cases": parity_cases,
                "cboc_samples_per_sec": cboc_sps,
                "fix_error_m": fix_error_m,
                "n_sats_decoded": n_sats_decoded,
                "b1_samples_per_sec": b1_sps,
                "devsink_samples_per_sec": devsink_sps,
                "devsink_pipelined_samples_per_sec": devsink_pipe_sps,
                "e2e_samples_per_sec": stats.samples_per_sec,
                "e2e_vs_baseline": stats.realtime_factor,
                "host_engine_samples_per_sec": host_sps,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
