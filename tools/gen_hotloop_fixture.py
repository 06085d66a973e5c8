"""Generate the sample-level hot-loop A/B fixture from the compiled
reference loop.

tests/ref_harness/harness_obs.cpp carries a line-faithful transcription of
the reference's sequential NCO sample loop (galileo-sdr.cpp:481-539 —
double NCO accumulation, 512-entry integer trig LUT, integer channel
accumulation, C (short) truncation).  This script runs the repo's own
scenario engine to produce real per-epoch channel states from
20feb2022.rnx, drives the transcribed loop with those states, and stores
the resulting int16 I/Q epochs in tests/data/hotloop_ref_iq.npz.

tests/test_hotloop_ref_ab.py then re-derives the same states (the engine
is deterministic) and asserts the lut512 XLA engine reproduces the
reference loop's stream sample-for-sample (stated bound: exact-match
fraction + correlation; residual mismatches are single-sample chip/LUT
boundary ticks from the affine float32 phase vs the sequential float64
NCO — see the test's docstring).

Run from the repo root:  python tools/gen_hotloop_fixture.py
"""

import hashlib
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "tests" / "data" / "hotloop_ref_iq.npz"

sys.path.insert(0, str(REPO))

from galileo_sdr_sim_tpu.constants import NUM_IQ_SAMPLES, SAMP_RATE  # noqa: E402

# epochs (iumd) captured: first epoch, mid-chunk, and one past the first
# 30 s reallocation boundary
SCENE_EPOCHS = [1, 17, 305]


def build_harness() -> Path:
    from gen_obs_fixture import build_harness as _b  # same binary

    return _b()


def scene_states():
    """Deterministic scenario states at SCENE_EPOCHS (same scene as
    tests/conftest.py engine_1s, longer horizon)."""
    from galileo_sdr_sim_tpu.gnss_time import DateTime, date2gal
    from galileo_sdr_sim_tpu.rinex import read_rinex_v3
    from galileo_sdr_sim_tpu.scenario import (
        PositionProvider,
        ScenarioEngine,
        scenario_start_time,
    )

    nav = read_rinex_v3("/root/reference/rinex_files/20feb2022.rnx")
    g0 = scenario_start_time(nav, date2gal(DateTime(2022, 2, 20, 8, 0, 1)))
    eng = ScenarioEngine(
        nav,
        PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0,
        duration_s=(max(SCENE_EPOCHS) + 2) / 10.0,
    )
    want = set(SCENE_EPOCHS)
    tabs = {}
    for iumd, tab in enumerate(eng.epochs(), start=1):
        if iumd in want:
            tabs[iumd] = tab
        if len(tabs) == len(want):
            break
    return [tabs[i] for i in SCENE_EPOCHS]


def harness_page_bits(tab, slot) -> str:
    """Rebuild the 500-entry page the transcribed loop reads, from the
    tab's symbol window: sym_win[k] is the +-1 databit for wrap count k,
    i.e. symbol index (ibit0 + k) (mod 500 across a page rollover, where
    the loop wraps ibit back into the same array)."""
    page = np.zeros(500, np.int64)
    ib0 = int(tab.ibit0[slot])
    for k in range(tab.sym_win.shape[1]):
        page[(ib0 + k) % 500] = 1 if tab.sym_win[slot, k] < 0 else 0
    return "".join(str(b) for b in page)


def state_digest(tab) -> str:
    h = hashlib.sha256()
    for arr in (tab.prn, tab.f_carr, tab.f_code, tab.code_phase0,
                tab.carr_phase0, tab.ibit0, tab.sym_win, tab.pilot_win):
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()[:16]


def run_reference_loop(exe: Path, tab) -> np.ndarray:
    delt = 1.0 / SAMP_RATE
    lines = []
    for slot in range(len(tab.prn)):
        if tab.prn[slot] <= 0:
            continue
        lines.append(
            f"chan {slot} {int(tab.prn[slot])} "
            f"{float(tab.f_carr[slot])!r} {float(tab.f_code[slot])!r} "
            f"{float(tab.code_phase0[slot])!r} {float(tab.carr_phase0[slot])!r} "
            f"{int(tab.ibit0[slot])} {harness_page_bits(tab, slot)}"
        )
    lines.append(f"hotrun {NUM_IQ_SAMPLES} {delt!r}")
    proc = subprocess.run(
        [str(exe)], input="\n".join(lines) + "\n",
        capture_output=True, text=True, check=True,
    )
    if proc.stderr:
        sys.stderr.write(proc.stderr)
    out = proc.stdout.strip().split()
    assert out[0] == "hot" and int(out[1]) == NUM_IQ_SAMPLES
    hexs = out[2]
    assert len(hexs) == NUM_IQ_SAMPLES * 8
    raw = np.frombuffer(bytes.fromhex(hexs), dtype=">u2").astype(np.uint16)
    return raw.view(np.int16).astype(np.int16)  # interleaved I/Q


def main() -> None:
    sys.path.insert(0, str(REPO / "tools"))
    exe = build_harness()
    tabs = scene_states()
    arrays = {}
    meta = []
    for iumd, tab in zip(SCENE_EPOCHS, tabs):
        iq = run_reference_loop(exe, tab)
        arrays[f"iq_{iumd}"] = iq
        meta.append({
            "iumd": iumd,
            "grx_sec": float(tab.grx_sec),
            "n_chan": int((tab.prn > 0).sum()),
            "state_digest": state_digest(tab),
        })
        print(f"epoch {iumd}: {meta[-1]}")
    np.savez_compressed(
        OUT, meta=json.dumps({"scene_epochs": SCENE_EPOCHS, "scenes": meta}),
        **arrays,
    )
    print(f"wrote {OUT} ({OUT.stat().st_size/1e6:.2f} MB)")


if __name__ == "__main__":
    main()
