#!/usr/bin/env python3
"""Perf experiments for the (K,p) engine on the real chip.

Honest harness: chained in-jit fori_loop with inter-iteration data
dependency + final scalar readback (see docs/kernel_design.md).
Usage: python tools/perf_experiments.py [exp ...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from galileo_sdr_sim_tpu.constants import NUM_IQ_SAMPLES
from galileo_sdr_sim_tpu.gnss_time import DateTime, date2gal
from galileo_sdr_sim_tpu.ops.synth_kp import (
    K_EPOCH,
    prepare_kp_inputs,
    synth_accum_kp,
)
from galileo_sdr_sim_tpu.rinex import read_rinex_v3
from galileo_sdr_sim_tpu.scenario import (
    PositionProvider,
    ScenarioEngine,
    scenario_start_time,
)


def get_batch(n_epochs):
    nav = read_rinex_v3("/root/reference/rinex_files/20feb2022.rnx")
    g0 = scenario_start_time(nav, date2gal(DateTime(2022, 2, 20, 8, 0, 1)))
    eng = ScenarioEngine(
        nav,
        PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0,
        duration_s=max(2.0, 0.1 * n_epochs + 0.5),
    )
    return next(eng.batches(n_epochs))


def timeit_chained(fn_of_inputs, inputs, B, nsamples, R=10, reps=3):
    @jax.jit
    def chained(inputs):
        def body(i, carry):
            inp = dict(inputs)
            inp["carr0"] = inputs["carr0"] + carry * 1e-9
            acc = fn_of_inputs(inp)
            return carry + jnp.sum(acc[:, ::1313, 0]) * 1e-12
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    float(chained(inputs))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(inputs))
        best = min(best, (time.perf_counter() - t0) / R)
    return B * nsamples / best


def exp_bscale():
    for B in (4, 8, 16, 32):
        batch = get_batch(B)
        inputs = prepare_kp_inputs(batch, NUM_IQ_SAMPLES, pad_epochs=B)
        sps = timeit_chained(
            lambda inp: synth_accum_kp(inp, n_k=K_EPOCH),
            inputs, B, NUM_IQ_SAMPLES,
        )
        print(f"B={B:3d}: {sps/1e6:9.1f} Msps ({sps/2.6e6:7.1f}x)")


def exp_pallas_bscale():
    from galileo_sdr_sim_tpu.ops.synth_kp_pallas import synth_accum_kp_pallas

    for B in (32, 64, 96, 128):
        batch = get_batch(min(B, 32))
        inputs = prepare_kp_inputs(
            batch, NUM_IQ_SAMPLES, pad_epochs=B, pack_g=True
        )
        sps = timeit_chained(
            lambda inp: synth_accum_kp_pallas(inp, n_k=K_EPOCH),
            inputs, B, NUM_IQ_SAMPLES,
        )
        print(f"B={B:3d}: {sps/1e6:9.1f} Msps ({sps/2.6e6:7.1f}x)", flush=True)




if __name__ == "__main__":
    exps = sys.argv[1:] or ["bscale"]
    # per-stage ablation lives in tools/probe_prep_ablation.py
    for e in exps:
        print(f"--- {e} ---")
        globals()[f"exp_{e}"]()
