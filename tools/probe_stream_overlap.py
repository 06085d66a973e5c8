#!/usr/bin/env python3
"""A/B probe: serial prep->dispatch loop vs the production streaming
executor (io/stream.py) at several pipeline depths, same process, same
workload — the comparison BENCH_r04 showed losing 2x (devsink_pipelined
69 Msps vs devsink serial 140 Msps).  Device-resident sink (per-block
jitted checksum, no D2H sample traffic) isolates the executor overhead
from the relay tunnel.

Usage: python tools/probe_stream_overlap.py [reps] [duration_s]
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    dur = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0

    import jax
    import jax.numpy as jnp

    from galileo_sdr_sim_tpu.constants import NUM_IQ_SAMPLES
    from galileo_sdr_sim_tpu.gnss_time import DateTime, date2gal
    from galileo_sdr_sim_tpu.io.stream import StreamingSynthesizer
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

    nav = read_rinex_v3("/root/reference/rinex_files/20feb2022.rnx")
    g0 = scenario_start_time(nav, date2gal(DateTime(2022, 2, 20, 8, 0, 1)))
    B = 64
    engine = default_engine()
    static = np.array([42.3601, -71.0589, 100.0])

    csum = jax.jit(lambda o: jnp.sum(o[:, ::1001].astype(jnp.float32)))

    def mk_engine():
        return ScenarioEngine(
            nav, PositionProvider(llh_deg=static), g0, duration_s=dur
        )

    # warm compiles
    eng_w = mk_engine()
    b0 = next(eng_w.batches(B))
    iw = prepare_kp_inputs(
        b0, NUM_IQ_SAMPLES, pad_epochs=B, pack_g=engine == "pallas"
    )
    float(csum(synth_block_kp(iw, n_k=K_EPOCH, engine=engine)))

    def serial() -> float:
        eng = mk_engine()
        cache: dict = {}
        t0 = time.perf_counter()
        n = 0
        sums = []
        for batch in eng.batches(B):
            inp = prepare_kp_inputs(
                batch, NUM_IQ_SAMPLES, pad_epochs=B, code_cache=cache,
                pack_g=engine == "pallas",
            )
            sums.append(csum(synth_block_kp(inp, n_k=K_EPOCH, engine=engine)))
            n += batch.f_code.shape[0]
        float(sum(float(s) for s in sums))
        return n * NUM_IQ_SAMPLES / (time.perf_counter() - t0)

    class DevSink:
        def __init__(self):
            self.sums = []

        def write(self, blk):
            self.sums.append(
                csum(blk)
                if not isinstance(blk, np.ndarray)
                else float(blk[:, ::1001].astype(np.float32).sum())
            )

        def close(self):
            pass

    def pipelined(depth: int) -> float:
        sink = DevSink()
        t0 = time.perf_counter()
        st = StreamingSynthesizer(
            mk_engine(), sink, block_epochs=B, drain_host=False,
            pipeline_depth=depth,
        ).run()
        float(sum(float(s) for s in sink.sums))
        return st.samples / (time.perf_counter() - t0)

    out = {"reps": reps, "duration_s": dur, "engine": engine}
    for name, fn in [
        ("serial", serial),
        ("depth1", lambda: pipelined(1)),
        ("depth2", lambda: pipelined(2)),
        ("depth3", lambda: pipelined(3)),
    ]:
        vals = [fn() / 1e6 for _ in range(reps)]
        out[name] = {
            "median_msps": float(np.median(vals)),
            "min": float(min(vals)),
            "max": float(max(vals)),
        }
        print(f"# {name}: {out[name]}", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
