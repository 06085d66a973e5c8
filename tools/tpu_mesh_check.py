#!/usr/bin/env python3
"""Run the PRODUCTION Pallas kernel under shard_map on the real TPU.

VERDICT r4 weak #5: every sharding artifact ran the XLA kp engine on
CPU meshes; the fused Pallas kernel had never executed under the mesh
machinery on hardware.  This tool builds the largest mesh the attached
chip count allows (a single chip gives (sat=1, time=1) — the full
shard_map/psum/collective lowering still wraps the kernel) and asserts
the sharded stream equals the unsharded Pallas stream bit-for-bit
(single-device psum is order-preserving, so unlike the multi-device
CPU-mesh bound this one is exact).  Also runs the CBOC weight branch.

Output: one JSON line (saved by the round as PALLAS_MESH_r05.json).
"""

import json
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax

    if jax.default_backend() != "tpu":
        print(json.dumps({"ok": False, "error": "no TPU attached"}))
        return 2

    from galileo_sdr_sim_tpu.constants import NUM_IQ_SAMPLES
    from galileo_sdr_sim_tpu.gnss_time import DateTime, date2gal
    from galileo_sdr_sim_tpu.models.cboc import E1_CBOC
    from galileo_sdr_sim_tpu.ops.synth_kp import synth_batch_kp_host
    from galileo_sdr_sim_tpu.parallel.mesh import (
        make_mesh,
        synth_batch_kp_sharded,
    )
    from galileo_sdr_sim_tpu.rinex import read_rinex_v3
    from galileo_sdr_sim_tpu.scenario import (
        PositionProvider,
        ScenarioEngine,
        scenario_start_time,
    )

    n_dev = len(jax.devices())
    n_sat, n_time = (1, 1) if n_dev == 1 else (max(n_dev // 2, 1), 2)
    mesh = make_mesh(n_sat, n_time)

    nav = read_rinex_v3("/root/reference/rinex_files/20feb2022.rnx")
    g0 = scenario_start_time(nav, date2gal(DateTime(2022, 2, 20, 8, 0, 1)))
    results = {}
    ok = True
    for name, model in (("boc", None), ("cboc", E1_CBOC)):
        kw = {} if model is None else {"model": model}
        eng = ScenarioEngine(
            nav,
            PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
            g0,
            duration_s=1.0,
            **kw,
        )
        batch = next(eng.batches(8))
        ref = synth_batch_kp_host(batch, NUM_IQ_SAMPLES, engine="pallas")
        out = synth_batch_kp_sharded(
            batch, mesh, nsamples=NUM_IQ_SAMPLES, pad_epochs=8,
            engine="pallas",
        )
        exact = bool(np.array_equal(out, ref))
        ident = float((out == ref).mean())
        maxlsb = int(
            np.abs(out.astype(np.int32) - ref.astype(np.int32)).max()
        )
        results[name] = {
            "exact": exact, "identical_frac": ident, "max_lsb": maxlsb,
            "epochs": int(batch.f_code.shape[0]),
        }
        # single-device mesh: psum order is the kernel's order -> exact;
        # multi-device: allow the documented <= 1 LSB psum bound
        case_ok = exact if n_dev == 1 else (ident >= 0.999 and maxlsb <= 1)
        ok = ok and case_ok
    print(
        json.dumps(
            {
                "ok": ok,
                "engine": "pallas",
                "backend": "tpu",
                "mesh": [n_sat, n_time],
                "n_devices": n_dev,
                "results": results,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
