"""Single-chip channel-cost curve for the fused (K,p) kernel.

Measures fused-kernel throughput on the real TPU for C = 2..16
channels (MAX_CHAN = 16) x B = 1/8/64 epochs at the production shape (260 000 samples
per epoch), and derives the per-channel marginal cost.  This is the
hardware-derived basis for the satellite-shard scaling projection
(BASELINE target 3): sharding C channels over N chips runs each chip at
C/N channels plus one psum, so the projected speedup is
t(C) / t(C/N) from this curve (per-channel VPU work is the whole story;
the psum of a (B, n, 2) int16/f32 block over ICI is negligible at these
sizes).

Writes docs/channel_cost.json and prints the table.  Run on the TPU
host:  python tools/channel_cost_curve.py
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import numpy as np  # noqa: E402

CS = (2, 4, 8, 12, 16)  # MAX_CHAN = 16: the product never runs more channels
BS = (1, 8, 32, 64)
REPS = 4


def make_batch(C: int, B: int, rng):
    """Synthetic EpochBatch with C active channels of realistic state."""
    from galileo_sdr_sim_tpu.models.e1 import E1_OS
    from galileo_sdr_sim_tpu.scenario import SYM_WIN, EpochBatch

    prn = np.arange(1, C + 1, dtype=np.int32)
    f_carr = rng.uniform(-4000.0, 4000.0, (B, C))
    f_code = 1.023e6 + f_carr / 1540.0
    return EpochBatch(
        grx_sec=np.arange(B, dtype=np.float64) * 0.1,
        prn=prn,
        f_carr=f_carr,
        f_code=f_code,
        code_phase0=rng.uniform(0, 4092.0, (B, C)),
        carr_phase0=rng.uniform(0, 1.0, (B, C)),
        sym_win=rng.choice(np.array([-1, 1], np.int8), (B, C, SYM_WIN)),
        pilot_win=rng.choice(np.array([-1, 1], np.int8), (B, C, SYM_WIN)),
        gain=np.ones((B, C), np.float32),
        codes_b=E1_OS.data_codes[prn - 1],
        codes_c=E1_OS.pilot_codes[prn - 1],
    )


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from galileo_sdr_sim_tpu.constants import NUM_IQ_SAMPLES
    from galileo_sdr_sim_tpu.ops.synth_kp import (
        P_GRID,
        default_engine,
        prepare_kp_inputs,
        synth_block_kp_packed,
    )

    import jax.numpy as jnp

    engine = default_engine()
    backend = jax.default_backend()
    rng = np.random.default_rng(11)
    n_k = NUM_IQ_SAMPLES // P_GRID

    # bench.py's methodology: DIFFERENTIAL chained timing — the chain
    # (data-dependent carry defeats LICM; scalar readback is the
    # completion fence) is timed at two iteration counts and
    # differenced, tau = (T(R2) - T(R1)) / (R2 - R1), cancelling the
    # fixed per-call host<->relay round trip (~25 ms on a degraded
    # tunnel) that inflated every per-iteration figure at fixed R=10
    # in rounds <= 4 (docs/kernel_design.md round-5 addendum)
    R1, R2 = 40, 80

    def make_chained(R):
        @jax.jit
        def chained(inputs):
            def body(i, carry):
                inp = dict(inputs)
                inp["carr0"] = inputs["carr0"] + carry * 1e-9
                inp["cp0"] = inputs["cp0"] + carry * 1e-9
                # packed production format; consume one lane-aligned
                # 128-lane slab (any read forces the opaque kernel;
                # a full/strided scan would re-measure the consumer's
                # HBM read)
                out = synth_block_kp_packed(inp, n_k=n_k, engine=engine)
                return carry + jnp.sum(
                    out[:, :, :128].astype(jnp.float32)
                ) * 1e-12
            return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
        return chained

    chains = (make_chained(R1), make_chained(R2))

    rows = []
    for C in CS:
        for B in BS:
            batch = make_batch(C, B, rng)
            inputs = prepare_kp_inputs(
                batch, NUM_IQ_SAMPLES, pack_g=engine == "pallas"
            )
            c1, c2 = chains
            float(c1(inputs))  # compile + warm
            float(c2(inputs))
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(c1(inputs))
                t1 = time.perf_counter()
                float(c2(inputs))
                t2 = time.perf_counter()
                tau = ((t2 - t1) - (t1 - t0)) / (R2 - R1)
                if tau > 0:
                    best = min(best, tau)
            sps = B * NUM_IQ_SAMPLES / best
            rows.append({
                "C": C, "B": B, "seconds": best, "samples_per_sec": sps,
                "channel_samples_per_sec": sps * C,
            })
            print(f"C={C:2d} B={B:2d}: {best*1e3:8.2f} ms  "
                  f"{sps/1e9:6.2f} Gsps  {sps*C/1e9:6.2f} Gcsps", flush=True)

    # per-channel marginal cost + sat-shard projection at B=64
    fit = None
    b64 = {r["C"]: r["seconds"] for r in rows if r["B"] == 64}
    if len(b64) >= 3:
        cs = np.array(sorted(b64))
        ts = np.array([b64[c] for c in cs])
        slope, intercept = np.polyfit(cs, ts, 1)
        fit = {
            "B": 64,
            "fixed_overhead_s": float(intercept),
            "per_channel_s": float(slope),
            "channel_fraction_at_16": float(
                slope * 16 / (slope * 16 + intercept)
            ),
        }
        if 8 in b64 and 16 in b64:
            # sharding 16 channels over 2 chips runs each at C=8:
            # projected speedup = t(16)/t(8) at the same B
            fit["projected_speedup_16ch_over_2chips"] = float(
                b64[16] / b64[8]
            )
            fit["projected_efficiency_vs_ideal_2x"] = float(
                b64[16] / b64[8] / 2.0
            )
        print("fit:", json.dumps(fit))

    out_path = REPO / "docs" / "channel_cost.json"
    out_path.write_text(json.dumps({
        "backend": backend, "engine": engine,
        "nsamples_per_epoch": NUM_IQ_SAMPLES, "reps": REPS,
        "smem_note": "symbol windows are bit-packed to one int32 per "
                     "(B, C) (synth_kp_pallas._pack_pm1_bits), so SMEM "
                     "cost is C-independent and B=64 compiles through "
                     "C=MAX_CHAN=16 (the unpacked f32 windows OOMed "
                     "SMEM at B=64 C=12).",
        "rows": rows, "b64_linear_fit": fit,
    }, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
