#!/usr/bin/env python3
"""v5 (per-kt unrolled) vs v6 (vectorized-kt) main loop on hardware.

Differential chained timing (tau = (T(80) - T(40)) / 40, bench.py
methodology) plus a bit-identity check of the packed outputs.

Usage: python tools/probe_vec_kt.py [C ...]
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
    from galileo_sdr_sim_tpu.ops.synth_kp import K_EPOCH, prepare_kp_inputs
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
    R1, R2 = 40, 80

    def make_chained(R, vec):
        @jax.jit
        def chained(inputs):
            def body(i, carry):
                d = dict(inputs)
                d["carr0"] = inputs["carr0"] + carry * 1e-9
                d["cp0"] = inputs["cp0"] + carry * 1e-9
                out = synth_accum_kp_pallas(
                    d, n_k=K_EPOCH, emit="i32pack", vec_kt=vec
                )
                return carry + jnp.sum(
                    out[:, :, :128].astype(jnp.float32)
                ) * 1e-12
            return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

        return chained

    def tau_ms(vec, inp, reps=3):
        c1, c2 = make_chained(R1, vec), make_chained(R2, vec)
        float(c1(inp))
        float(c2(inp))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(c1(inp))
            t1 = time.perf_counter()
            float(c2(inp))
            t2 = time.perf_counter()
            tau = ((t2 - t1) - (t1 - t0)) / (R2 - R1)
            if tau > 0:
                best = min(best, tau)
        return best * 1e3

    def widen(base, C):
        inp = {}
        for k, v in base.items():
            v = np.asarray(v)
            if k in ("vpack", "vpack_rs"):
                inp[k] = jnp.asarray(
                    np.stack([v[i % v.shape[0]] for i in range(C)])
                )
            elif v.ndim >= 2 and v.shape[1] == base["cp0"].shape[1]:
                inp[k] = jnp.asarray(
                    np.stack([v[:, i % v.shape[1]] for i in range(C)], axis=1)
                )
            else:
                inp[k] = jnp.asarray(v)
        return inp

    j5 = jax.jit(lambda d: synth_accum_kp_pallas(
        d, n_k=K_EPOCH, emit="i32pack", vec_kt=False))
    j6 = jax.jit(lambda d: synth_accum_kp_pallas(
        d, n_k=K_EPOCH, emit="i32pack", vec_kt=True))
    rows = []
    for C in cs:
        inp = widen(base, C)
        print(f"# C={C}: compiling...", flush=True)
        try:
            o5 = np.asarray(j5(inp))
            o6 = np.asarray(j6(inp))
        except Exception as e:
            print(f"# C={C}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            rows.append({"C": C, "error": str(e)[:200]})
            continue
        identical = bool(np.array_equal(o5, o6))
        print(f"# C={C}: identical={identical}; timing...", flush=True)
        t5 = tau_ms(False, inp)
        t6 = tau_ms(True, inp)
        row = {
            "C": C, "identical": identical,
            "v5_ms": round(t5, 3), "v6_ms": round(t6, 3),
            "v5_gsps": round(B * NUM_IQ_SAMPLES / t5 / 1e6, 2),
            "v6_gsps": round(B * NUM_IQ_SAMPLES / t6 / 1e6, 2),
            "speedup": round(t5 / t6, 3),
        }
        rows.append(row)
        print(f"# {row}", flush=True)
    print(json.dumps({"rows": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
