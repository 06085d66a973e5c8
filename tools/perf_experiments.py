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




def exp_ablate():
    """Per-component cost of the Pallas path at B=64 (docs ablation)."""
    from galileo_sdr_sim_tpu.ops.synth_kp_pallas import (
        prepare_pallas_operands,
        synth_accum_kp_pallas,
    )

    B = 64
    batch = get_batch(32)
    inputs = prepare_kp_inputs(batch, NUM_IQ_SAMPLES, pad_epochs=B, pack_g=True)

    sps = timeit_chained(
        lambda inp: synth_accum_kp_pallas(inp, n_k=K_EPOCH),
        inputs, B, NUM_IQ_SAMPLES)
    print(f"full pallas path : {B*NUM_IQ_SAMPLES/sps*1e3*B*NUM_IQ_SAMPLES and B*NUM_IQ_SAMPLES/sps*1000:8.2f} ms/call  {sps/2.6e6:7.1f}x", flush=True)

    def prep_scalar(inp):
        ops = prepare_pallas_operands(inp, K_EPOCH)
        # produce (B, x, 2)-like output for harness slicing compatibility
        s = sum(jnp.sum(v) for v in ops.values())
        return jnp.broadcast_to(s, (B, 26300, 2))

    sps = timeit_chained(prep_scalar, inputs, B, NUM_IQ_SAMPLES)
    print(f"prep (all)       : {B*NUM_IQ_SAMPLES/sps*1000:8.2f} ms/call", flush=True)

    def gather_scalar(inp):
        cp0 = inp["cp0"]
        Bq, C = cp0.shape
        p = jnp.arange(1300, dtype=jnp.float32)
        phi = 2.0 * cp0[..., None] + inp["two_a"][..., None] * p
        mu = inp["mu"][..., None]
        gb = jnp.floor(phi) + jnp.where(mu < 0, -1.0, 0.0)
        gbm = jnp.mod(gb, 8184.0)
        idx = gbm.astype(jnp.int32)
        pulled = jax.vmap(
            lambda ib: jax.vmap(lambda tab, ic: tab[ic])(inp["vpack_g"], ib)
        )(idx)
        s = jnp.sum(pulled.astype(jnp.float32))
        return jnp.broadcast_to(s, (B, 26300, 2))

    sps = timeit_chained(gather_scalar, inputs, B, NUM_IQ_SAMPLES)
    print(f"geom+gather only : {B*NUM_IQ_SAMPLES/sps*1000:8.2f} ms/call", flush=True)

    def geom_scalar(inp):
        cp0 = inp["cp0"]
        p = jnp.arange(1300, dtype=jnp.float32)
        phi = 2.0 * cp0[..., None] + inp["two_a"][..., None] * p
        mu = inp["mu"][..., None]
        gb = jnp.floor(phi) + jnp.where(mu < 0, -1.0, 0.0)
        gbm = jnp.mod(gb, 8184.0)
        ph_p = inp["carr0"][..., None] + inp["fc"][..., None] * p
        ph_p = ph_p - jnp.floor(ph_p)
        s = jnp.sum(gbm) + jnp.sum(jnp.cos(2*jnp.pi*ph_p)) + jnp.sum(jnp.sin(2*jnp.pi*ph_p))
        return jnp.broadcast_to(s, (B, 26300, 2))

    sps = timeit_chained(geom_scalar, inputs, B, NUM_IQ_SAMPLES)
    print(f"geometry only    : {B*NUM_IQ_SAMPLES/sps*1000:8.2f} ms/call", flush=True)

    ops0 = prepare_pallas_operands(inputs, K_EPOCH)
    ops0 = {k: v.astype(jnp.float32) for k, v in ops0.items()}

    def kernel_scalar(inp):
        # kernel alone, fed precomputed operands (carry dep via carr-like op)
        from galileo_sdr_sim_tpu.ops import synth_kp_pallas as skp
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        ops = dict(ops0)
        ops["cpr"] = ops["cpr"] + inp["carr0"][..., None] * 0.0  # dep
        B_, C = inputs["cp0"].shape
        n_kap = K_EPOCH // skp.ROWS
        kap_tile = 5
        def vspec(*shape):
            return pl.BlockSpec((1,) + shape, lambda b, kap: (b,) + (0,)*len(shape), memory_space=pltpu.VMEM)
        sspec = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        out_spec = pl.BlockSpec((1, skp.ROWS*kap_tile, skp.P_PAD), lambda b, kap: (b, kap, 0), memory_space=pltpu.VMEM)
        order = ("mu","fc_k","sym","pil","a0b","dab","a0c","dac","b0","db","psi","w8","cpr","cpi")
        in_specs = [sspec(), sspec(), sspec(), sspec(),
                    vspec(C, skp.ROWS, skp.P_PAD), vspec(C, skp.ROWS, skp.P_PAD),
                    vspec(C, skp.ROWS, skp.P_PAD), vspec(C, skp.ROWS, skp.P_PAD),
                    vspec(C, skp.ROWS, skp.P_PAD), vspec(C, skp.ROWS, skp.P_PAD),
                    vspec(C, skp.P_PAD), vspec(C, skp.P_PAD), vspec(C, skp.P_PAD), vspec(C, skp.P_PAD)]
        out_i, out_q = pl.pallas_call(
            functools.partial(skp._kernel, C=C, kap_tile=kap_tile),
            grid=(B, n_kap//kap_tile), in_specs=in_specs,
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((B, K_EPOCH, skp.P_PAD), jnp.float32),
                       jax.ShapeDtypeStruct((B, K_EPOCH, skp.P_PAD), jnp.float32)),
        )(*(ops[k] for k in order))
        iq = jnp.stack([out_i[:, :, :1300], out_q[:, :, :1300]], axis=-1)
        return iq.reshape(B, -1, 2)

    sps = timeit_chained(kernel_scalar, inputs, B, NUM_IQ_SAMPLES)
    print(f"kernel only      : {B*NUM_IQ_SAMPLES/sps*1000:8.2f} ms/call", flush=True)


if __name__ == "__main__":
    exps = sys.argv[1:] or ["bscale"]
    for e in exps:
        print(f"--- {e} ---")
        globals()[f"exp_{e}"]()
