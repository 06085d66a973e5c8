#!/usr/bin/env python3
"""Attribute the fused kernel's per-call cost to its phases, on
hardware.

HISTORICAL NOTE: this probe's original fixed-R timing carried the
per-call relay round trip (~25 ms congested / R iterations) and its
strided consumption re-read the whole output buffer — both identified
and removed in the round-5 methodology revision (differential timing;
docs/kernel_design.md).  The section probes remain useful for
RELATIVE attribution within one session; absolute per-phase numbers
from fixed-R runs are inflated by RTT/R.

Phases:

- full:       prologue + main loop (production kernel, emit=int16)
- prologue:   per-(b, c) geometry/DMA/trig into scratch only
- main:       kap-tile accumulation loop only (scratch garbage)
- epilogue:   the XLA stack/slice/reshape after pallas_call, estimated
              as full(int16) - pallas-only via a standalone jit

Chained-fori harness with per-iteration input perturbation and a scalar
readback, same anti-LICM discipline as bench.py.

Usage: python tools/probe_kernel_cost.py [C ...]
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
    cs = [int(a) for a in sys.argv[1:]] or [2, 8, 16]

    import jax
    import jax.numpy as jnp

    from galileo_sdr_sim_tpu.constants import NUM_IQ_SAMPLES
    from galileo_sdr_sim_tpu.gnss_time import DateTime, date2gal
    from galileo_sdr_sim_tpu.ops.synth_kp import (
        K_EPOCH,
        prepare_kp_inputs,
    )
    from galileo_sdr_sim_tpu.ops.synth_kp_pallas import synth_accum_kp_pallas
    from galileo_sdr_sim_tpu.rinex import read_rinex_v3
    from galileo_sdr_sim_tpu.scenario import (
        PositionProvider,
        ScenarioEngine,
        scenario_start_time,
    )

    if jax.default_backend() != "tpu":
        print(json.dumps({"ok": False, "error": "no TPU attached"}))
        return 2

    nav = read_rinex_v3("/root/reference/rinex_files/20feb2022.rnx")
    g0 = scenario_start_time(nav, date2gal(DateTime(2022, 2, 20, 8, 0, 1)))
    B = 64
    eng = ScenarioEngine(
        nav,
        PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0,
        duration_s=0.1 * B + 0.5,
    )
    batch = next(eng.batches(B))
    base = prepare_kp_inputs(batch, NUM_IQ_SAMPLES, pad_epochs=B, pack_g=True)

    R = 10

    def timed(fn, inputs, reps=3):
        @jax.jit
        def chained(inputs):
            def body(i, carry):
                inp = dict(inputs)
                inp["carr0"] = inputs["carr0"] + carry * 1e-9
                inp["cp0"] = inputs["cp0"] + carry * 1e-9
                out = fn(inp)
                return carry + jnp.nansum(
                    out.reshape(out.shape[0], -1)[:, ::2627].astype(jnp.float32)
                ) * 1e-12
            return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

        float(chained(inputs))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(inputs))
            best = min(best, (time.perf_counter() - t0) / R)
        return best * 1e3  # ms/call

    rows = []
    for C in cs:
        # channel-compact the inputs to C channels (vpack tables are
        # per-channel too)
        inp = {}
        for k, v in base.items():
            v = np.asarray(v)
            if k in ("vpack", "vpack_rs"):
                inp[k] = jnp.asarray(v[:C])
            elif v.ndim >= 2 and v.shape[1] == base["cp0"].shape[1]:
                inp[k] = jnp.asarray(v[:, :C])
            else:
                inp[k] = jnp.asarray(v)
        row = {"C": C, "B": B}
        row["full_i16_ms"] = timed(
            lambda i: synth_accum_kp_pallas(i, n_k=K_EPOCH, emit="int16"), inp
        )
        row["prologue_ms"] = timed(
            lambda i: synth_accum_kp_pallas(
                i, n_k=K_EPOCH, emit="int16", _sections=("prologue",)
            ),
            inp,
        )
        row["main_ms"] = timed(
            lambda i: synth_accum_kp_pallas(
                i, n_k=K_EPOCH, emit="int16", _sections=("main",)
            ),
            inp,
        )
        row["empty_ms"] = timed(
            lambda i: synth_accum_kp_pallas(
                i, n_k=K_EPOCH, emit="int16", _sections=()
            ),
            inp,
        )
        row["gsps_full"] = B * NUM_IQ_SAMPLES / row["full_i16_ms"] / 1e6
        rows.append(row)
        print(f"# {row}", flush=True)
    print(json.dumps({"rows": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
