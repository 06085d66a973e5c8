#!/usr/bin/env python3
"""Ablate the Pallas-engine per-call cost at B=64 on the attached chip.

Times, with the honest chained harness (in-jit fori_loop, feedback
dependency into BOTH carr0 and cp0 so no stage can be hoisted out of
the loop as loop-invariant, scalar readback):
  full   - v5 engine, f32 accumulator emit (accum_kp production call)
  i16    - v5 engine, in-kernel int16 emit (synth_block_kp production)
  block  - full synth_block_kp via the XLA engine (for comparison)
  slice  - the per-(b, c) window slices alone (the only XLA-side prep)
  check  - int16 emit == trunc(f32 emit), on the attached backend

Usage: python tools/probe_prep_ablation.py [stage ...]
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from galileo_sdr_sim_tpu.constants import NUM_IQ_SAMPLES
from galileo_sdr_sim_tpu.gnss_time import DateTime, date2gal
from galileo_sdr_sim_tpu.ops.synth_kp import (
    K_EPOCH, prepare_kp_inputs, synth_block_kp,
)
from galileo_sdr_sim_tpu.ops import synth_kp_pallas as skp
from galileo_sdr_sim_tpu.rinex import read_rinex_v3
from galileo_sdr_sim_tpu.scenario import PositionProvider, ScenarioEngine, scenario_start_time

B = 64
R = 10

nav = read_rinex_v3("/root/reference/rinex_files/20feb2022.rnx")
g0 = scenario_start_time(nav, date2gal(DateTime(2022, 2, 20, 8, 0, 1)))
eng = ScenarioEngine(
    nav, PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
    g0, duration_s=0.1 * B + 0.5,
)
batch = next(eng.batches(B))
inputs = prepare_kp_inputs(batch, NUM_IQ_SAMPLES, pad_epochs=B, pack_g=True)
print("backend:", jax.default_backend(), " C =", inputs["cp0"].shape[1])


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    float(jfn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(*args))
        best = min(best, (time.perf_counter() - t0) / R)
    print(f"{name:10s} {best*1e3:8.2f} ms   {B*NUM_IQ_SAMPLES/best/1e9:7.2f} Gsps")
    return best


def chain(body):
    # Perturb BOTH carr0 and cp0 by the carry: production feeds fresh
    # values of every input each call, so nothing may be hoisted out of
    # the loop as loop-invariant (XLA LICM would otherwise exclude the
    # window slices, which depend only on cp0, from the measured cost).
    def outer(inputs):
        def step(i, carry):
            inp = dict(inputs)
            inp["carr0"] = inputs["carr0"] + carry * 1e-9
            inp["cp0"] = inputs["cp0"] + carry * 1e-9
            return carry + body(inp)
        return jax.lax.fori_loop(0, R, step, jnp.float32(0.0))
    return outer


def full_body(inp):
    acc = skp.synth_accum_kp_pallas(inp, n_k=K_EPOCH)
    return jnp.sum(acc[:, ::1313, 0]) * 1e-12


def i16_body(inp):
    out = skp.synth_accum_kp_pallas(inp, n_k=K_EPOCH, emit="int16")
    return jnp.sum(out[:, ::2626].astype(jnp.float32)) * 1e-12


def block_xla_body(inp):
    out = synth_block_kp(inp, n_k=K_EPOCH, engine="xla")
    return jnp.sum(out[:, ::2626].astype(jnp.float32)) * 1e-12


def slice_body(inp):
    # anchors only: the window fetch itself is now an in-kernel DMA
    g0_, o_, r_ = skp._window_anchors(inp)
    return (jnp.sum(o_.astype(jnp.float32))
            + jnp.sum(r_.astype(jnp.float32))) * 1e-12


import sys

stages = sys.argv[1:] or ["full", "i16", "slice"]
if "full" in stages:
    timed("full", chain(full_body), inputs)
if "i16" in stages:
    timed("i16", chain(i16_body), inputs)
if "block" in stages:
    timed("block", chain(block_xla_body), inputs)
if "slice" in stages:
    timed("slice", chain(slice_body), inputs)
if "check" in stages:
    acc = np.asarray(jax.jit(
        lambda i: skp.synth_accum_kp_pallas(i, n_k=K_EPOCH))(inputs))
    i16 = np.asarray(jax.jit(
        lambda i: skp.synth_accum_kp_pallas(i, n_k=K_EPOCH, emit="int16"))(inputs))
    ref = np.trunc(acc).astype(np.int16).reshape(acc.shape[0], -1)
    xla = np.asarray(jax.jit(
        lambda i: synth_block_kp(i, n_k=K_EPOCH, engine="xla"))(inputs))
    print("i16 == trunc(f32):", np.array_equal(i16, ref),
          " pallas i16 == xla block:", np.array_equal(i16, xla))
