#!/usr/bin/env python3
"""On-chip Pallas==XLA bit-identity sweep: shapes x adversarial seeds.

The claim (docs/kernel_design.md): on TPU the fused Pallas engine and
the XLA (K,p) lowering produce bit-identical int16 streams, because they
perform the same f32 tile math in the same channel order.  bench.py pins
one production shape; this tool sweeps the claim across shapes (the
production B=64 tail-B=8, the interactive B=1, and a short-block n_k)
and adversarially-placed seeds:

  - code phases moved to exact and near-exact half-chip boundaries,
    where any fused-vs-unfused rounding difference in the integer chip
    geometry would flip a chip index (the failure mode the CPU
    interpreter exhibits, bounded in tests/test_synth_kp_pallas.py);
  - carrier phases at the frac()-wrap boundary (carr0 -> 1 - ulp);
  - code-Doppler drift mu negated (the mu<0 floor-bias branch) and
    pushed to the +-3e-3 envelope edge, with two_a kept consistent
    (mu = 2*a*1300 - 1023, ops/synth_kp.py:234-235).

Every case requires exact np.array_equal of the full int16 block.
Prints one JSON line; exits nonzero on any mismatch or if no TPU is
attached (the claim is about the TPU backend; the CPU interpreter is
covered by the test suite's tolerance-bounded checks instead).

Usage: python tools/tpu_parity_check.py [n_seeds]
"""

import json
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from galileo_sdr_sim_tpu.constants import NUM_IQ_SAMPLES
from galileo_sdr_sim_tpu.gnss_time import DateTime, date2gal
from galileo_sdr_sim_tpu.ops.synth_kp import (
    COLS,
    K_EPOCH,
    P_GRID,
    prepare_kp_inputs,
    synth_block_kp,
)
from galileo_sdr_sim_tpu.rinex import read_rinex_v3
from galileo_sdr_sim_tpu.scenario import (
    PositionProvider,
    ScenarioEngine,
    scenario_start_time,
)

SHAPES = [(8, K_EPOCH), (1, K_EPOCH), (8, 40)]  # (B, n_k)


def perturb(inputs: dict, rng: np.random.Generator, mode: int) -> dict:
    """One adversarial seed: new phases/drift inside the engine envelope."""
    inp = {k: np.asarray(v) for k, v in inputs.items()
           if k not in ("vpack", "vpack_rs")}
    B, C = inp["cp0"].shape
    f32 = np.float32

    cp0 = rng.uniform(0.0, 0.5 * COLS * 8, size=(B, C)).astype(f32)
    if mode % 3 == 1:
        # exact half-chip boundaries: phi = 2*cp0 integral
        cp0 = np.round(cp0 * 2.0).astype(f32) / f32(2.0)
    elif mode % 3 == 2:
        # one f32 ulp below a boundary
        cp0 = np.nextafter(
            np.round(cp0 * 2.0).astype(f32) / f32(2.0), f32(-1.0)
        )
    inp["cp0"] = cp0

    carr0 = rng.uniform(0.0, 1.0, size=(B, C)).astype(f32)
    if mode % 2 == 1:
        carr0 = np.nextafter(np.ones((B, C), f32), np.zeros((B, C), f32))
    inp["carr0"] = carr0

    # drift: envelope edge, alternating sign (mu<0 exercises the floor
    # bias branch); keep two_a consistent with mu
    sign = -1.0 if mode % 2 == 1 else 1.0
    mu = (sign * rng.uniform(0.5e-3, 3e-3, size=(B, C))).astype(f32)
    inp["mu"] = mu
    two_a = (mu.astype(np.float64) + COLS) / P_GRID
    inp["two_a"] = two_a.astype(f32)
    fc = rng.uniform(-3e-3, 3e-3, size=(B, C)).astype(f32)  # ~ +-7.8 kHz
    inp["fc"] = fc
    fc_k = fc.astype(np.float64) * P_GRID
    inp["fc_k"] = (fc_k - np.floor(fc_k)).astype(f32)

    out = {k: jnp.asarray(v) for k, v in inp.items()}
    out["vpack"] = inputs["vpack"]
    out["vpack_rs"] = inputs["vpack_rs"]
    return out


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    if jax.default_backend() != "tpu":
        print(json.dumps({"ok": False, "error": "no TPU attached"}))
        return 2

    nav = read_rinex_v3("/root/reference/rinex_files/20feb2022.rnx")
    g0 = scenario_start_time(nav, date2gal(DateTime(2022, 2, 20, 8, 0, 1)))
    eng = ScenarioEngine(
        nav,
        PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0,
        duration_s=1.5,
    )
    batch = next(eng.batches(8))
    base = prepare_kp_inputs(batch, NUM_IQ_SAMPLES, pad_epochs=8, pack_g=True)

    rng = np.random.default_rng(20260820)
    cases = 0
    failures = []
    # variants: plain sine-BOC across SHAPES, the CBOC weight branch,
    # and the per-channel gain branch (chan_gain SMEM operand) — each
    # adds ops to BOTH engines; all must stay bit-identical
    variants = (
        [s + ("boc",) for s in SHAPES] + [(8, 40, "cboc"), (8, 40, "gain")]
    )
    for B, n_k, variant in variants:
        cboc = variant == "cboc"
        inputs = {
            k: (v if k in ("vpack", "vpack_rs") else v[:B])
            for k, v in base.items()
        }
        if cboc:
            # the CBOC weight branch (synth_kp.py) adds tau/alpha/beta
            # ops to BOTH engines; check it stays bit-identical too
            from galileo_sdr_sim_tpu.models.cboc import ALPHA, BETA

            inputs["cboc_ab"] = jnp.asarray([ALPHA, BETA], jnp.float32)
        if variant == "gain":
            gshape = np.asarray(inputs["cp0"]).shape
            inputs["chan_gain"] = jnp.asarray(
                rng.uniform(0.05, 1.0, gshape).astype(np.float32)
            )
        for seed in range(n_seeds):
            inp = perturb(inputs, rng, seed) if seed else inputs
            if cboc:
                inp["cboc_ab"] = inputs["cboc_ab"]
            if variant == "gain":
                inp["chan_gain"] = inputs["chan_gain"]
            out_p = np.asarray(synth_block_kp(inp, n_k=n_k, engine="pallas"))
            out_x = np.asarray(synth_block_kp(inp, n_k=n_k, engine="xla"))
            cases += 1
            if not np.array_equal(out_p, out_x):
                nbad = int(np.sum(out_p != out_x))
                failures.append(
                    {"B": B, "n_k": n_k, "variant": variant, "seed": seed,
                     "mismatches": nbad}
                )
    print(
        json.dumps(
            {
                "ok": not failures,
                "cases": cases,
                "shapes": SHAPES,
                "cboc_case": [8, 40],
                "seeds_per_shape": n_seeds,
                "failures": failures,
            }
        )
    )
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
