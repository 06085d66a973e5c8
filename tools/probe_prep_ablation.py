#!/usr/bin/env python3
"""Ablate the Pallas-engine per-call cost at B=64 on the attached chip.

Times, with the honest chained harness (in-jit fori_loop, feedback
dependency, scalar readback):
  full      - prepare_pallas_operands + fused kernel (production call)
  prep      - prepare_pallas_operands alone
  gather    - the (b, c, p) row-pull + plane transpose alone
  geometry  - the (B, C, p) phi/psi/threshold/carrier block alone
  kernel    - fused kernel alone (operands precomputed outside the loop)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from galileo_sdr_sim_tpu.constants import NUM_IQ_SAMPLES
from galileo_sdr_sim_tpu.gnss_time import DateTime, date2gal
from galileo_sdr_sim_tpu.ops.synth_kp import K_EPOCH, P_GRID, ROWS, COLS, prepare_kp_inputs
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
# the round-1 direct-G table, for timing the old per-(b,c,p) row gather
from galileo_sdr_sim_tpu.ops.synth_kp import _pack_codes_g, compact_channels

_cb = compact_channels(batch)
inputs["vpack_g"] = jnp.asarray(_pack_codes_g(_cb.codes_b, _cb.codes_c))
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
    def outer(inputs):
        def step(i, carry):
            inp = dict(inputs)
            inp["carr0"] = inputs["carr0"] + carry * 1e-9
            return carry + body(inp)
        return jax.lax.fori_loop(0, R, step, jnp.float32(0.0))
    return outer


def full_body(inp):
    acc = skp.synth_accum_kp_pallas(inp, n_k=K_EPOCH)
    return jnp.sum(acc[:, ::1313, 0]) * 1e-12


def fused_body(inp):
    acc = skp.synth_accum_kp_pallas_fused(inp, n_k=K_EPOCH)
    return jnp.sum(acc[:, ::1313, 0]) * 1e-12


def prep_body(inp):
    ops = skp.prepare_pallas_operands(inp, K_EPOCH)
    return (jnp.sum(ops["a0b"][:, :, ::7, ::311]) + jnp.sum(ops["cpr"][:, :, ::317])) * 1e-12


def gather_body(inp):
    cp0 = inp["cp0"]
    Bc, C = cp0.shape
    p = jnp.arange(P_GRID, dtype=jnp.float32)
    phi = 2.0 * cp0[..., None] + inp["two_a"][..., None] * p
    mu = inp["mu"][..., None]
    gb = jnp.floor(phi) + jnp.where(mu < 0, -1.0, 0.0)
    gbm = jnp.mod(gb, float(ROWS * COLS))
    idx = gbm.astype(jnp.int32)
    pulled = jax.vmap(
        lambda ib: jax.vmap(lambda tab, ic: tab[ic])(inp["vpack_g"], ib)
    )(idx)
    A = pulled.reshape(Bc, C, P_GRID, 2, 2, ROWS).transpose(0, 1, 3, 4, 5, 2)
    return jnp.sum(A[:, :, 0, 0, :, ::311].astype(jnp.float32)) * 1e-12


def geom_body(inp):
    cp0 = inp["cp0"]
    p = jnp.arange(P_GRID, dtype=jnp.float32)
    rho = jnp.arange(ROWS, dtype=jnp.float32)
    phi = 2.0 * cp0[..., None] + inp["two_a"][..., None] * p
    mu = inp["mu"][..., None]
    gb = jnp.floor(phi) + jnp.where(mu < 0, -1.0, 0.0)
    psi = phi - gb
    gbm = jnp.mod(gb, float(ROWS * COLS))
    thr = (float(COLS) * (float(ROWS) - rho))[None, None, :, None]
    b0 = (gbm[:, :, None, :] >= thr).astype(jnp.float32)
    b1 = (gbm[:, :, None, :] + 1.0 >= thr).astype(jnp.float32)
    w8 = (gb >= float(ROWS * COLS)).astype(jnp.float32)
    ph_p = inp["carr0"][..., None] + inp["fc"][..., None] * p
    ph_p = ph_p - jnp.floor(ph_p)
    ang_p = jnp.float32(2 * np.pi) * ph_p
    cpr = jnp.cos(ang_p)
    cpi = jnp.sin(ang_p)
    return (jnp.sum(psi[:, :, ::317]) + jnp.sum(b0[:, :, :, ::311])
            + jnp.sum(b1[:, :, :, ::313]) + jnp.sum(w8[:, :, ::307])
            + jnp.sum(cpr[:, :, ::311]) + jnp.sum(cpi[:, :, ::313])) * 1e-12


import sys

stages = sys.argv[1:] or ["full", "prep", "gather", "geometry", "kernel"]
if "full" in stages:
    timed("full", chain(full_body), inputs)
if "fused" in stages:
    timed("fused", chain(fused_body), inputs)
if "prep" in stages:
    timed("prep", chain(prep_body), inputs)
if "gather" in stages:
    timed("gather", chain(gather_body), inputs)
if "geometry" in stages:
    timed("geometry", chain(geom_body), inputs)

def kernel_only(ops):
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def run(o):
        n_kap = K_EPOCH // ROWS
        kap_tile = 5
        Bc, C = o["mu"].shape

        def vspec(*shape):
            return pl.BlockSpec((1,) + shape, lambda b, kap: (b,) + (0,) * len(shape),
                                memory_space=pltpu.VMEM)
        sspec = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        out_spec = pl.BlockSpec((1, ROWS * kap_tile, skp.P_PAD), lambda b, kap: (b, kap, 0),
                                memory_space=pltpu.VMEM)
        order = ("mu", "fc_k", "sym", "pil", "a0b", "dab", "a0c", "dac",
                 "b0", "db", "psi", "w8", "cpr", "cpi")
        in_specs = [sspec(), sspec(), sspec(), sspec(),
                    vspec(C, ROWS, skp.P_PAD), vspec(C, ROWS, skp.P_PAD),
                    vspec(C, ROWS, skp.P_PAD), vspec(C, ROWS, skp.P_PAD),
                    vspec(C, ROWS, skp.P_PAD), vspec(C, ROWS, skp.P_PAD),
                    vspec(C, skp.P_PAD), vspec(C, skp.P_PAD),
                    vspec(C, skp.P_PAD), vspec(C, skp.P_PAD)]
        out_i, out_q = pl.pallas_call(
            functools.partial(skp._kernel, C=C, kap_tile=kap_tile),
            grid=(Bc, n_kap // kap_tile),
            in_specs=in_specs, out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((Bc, K_EPOCH, skp.P_PAD), jnp.float32),
                       jax.ShapeDtypeStruct((Bc, K_EPOCH, skp.P_PAD), jnp.float32)),
        )(*(o[k] for k in order))
        return jnp.sum(out_i[:, ::1313, 0]) * 1e-12

    def outer(ops):
        def step(i, carry):
            o = dict(ops)
            o["cpr"] = ops["cpr"] + carry * 1e-9
            return carry + run(o)
        return jax.lax.fori_loop(0, R, step, jnp.float32(0.0))
    return outer(ops)


if "kernel" in stages:
    # kernel alone: operands fixed, vary only via carry into a cheap input
    ops0 = jax.jit(lambda i: skp.prepare_pallas_operands(i, K_EPOCH))(inputs)
    ops0 = jax.tree.map(lambda x: x.astype(jnp.float32), ops0)
    timed("kernel", kernel_only, ops0)
