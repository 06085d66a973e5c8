"""Fused Pallas engine vs the XLA (K,p) engine.

On TPU the two are bit-identical (same f32 tile math; pinned on hardware
by bench.py's parity check every round).  These tests run the kernel in
Pallas interpreter mode on the CPU backend so CI needs no TPU; shapes
are kept small because the interpreter executes op-by-op.  The chip-
fetch path (pre-resampled table + 5-tap select) is additionally pinned
bit-exactly against the direct row-gather oracle at adversarial seeds.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from galileo_sdr_sim_tpu.ops.synth_kp import (
    COLS,
    J_RS,
    P_GRID,
    ROWS,
    W_PACK,
    _pack_codes_g,
    _pack_codes_rs,
    accum_kp,
    default_engine,
    prepare_kp_inputs,
    synth_accum_kp,
)
from galileo_sdr_sim_tpu.ops.synth_kp_pallas import synth_accum_kp_pallas


def _small_inputs(batch_1s):
    return prepare_kp_inputs(batch_1s, ROWS * P_GRID, pack_g=True)


def test_pallas_matches_xla_engine_interpret(batch_1s):
    n_k = ROWS  # one row cycle (10400 samples), n_kap = 1
    inputs = _small_inputs(batch_1s)
    ref = np.asarray(jax.jit(
        lambda i: synth_accum_kp(i, n_k=n_k))(inputs))
    out = np.asarray(synth_accum_kp_pallas(inputs, n_k=n_k, interpret=True))
    assert out.shape == ref.shape
    # On TPU the two engines are bit-identical.  Under the CPU
    # interpreter, unfused vs jit-fused f32 rounding can flip
    # floor(psi + mu*K) at exact chip boundaries — the same one-sample
    # timing-ULP class both engines exhibit vs the float64 oracle — so
    # bound the mismatch fraction rather than requiring exactness.
    mismatch = np.abs(out - ref) > 1e-2
    assert mismatch.mean() < 1e-3, mismatch.mean()
    np.testing.assert_allclose(out[~mismatch], ref[~mismatch], atol=1e-2)


def test_pallas_matches_xla_engine_cboc_interpret(batch_1s):
    """The CBOC weight branch (tau / alpha / beta, ops/synth_kp.py) runs
    the same op order in both engines; same interpreter tolerance class
    as the sine-BOC case."""
    from galileo_sdr_sim_tpu.models.cboc import ALPHA, BETA

    n_k = ROWS
    inputs = dict(_small_inputs(batch_1s))
    inputs["cboc_ab"] = jnp.asarray([ALPHA, BETA], jnp.float32)
    ref = np.asarray(jax.jit(
        lambda i: synth_accum_kp(i, n_k=n_k))(inputs))
    out = np.asarray(synth_accum_kp_pallas(inputs, n_k=n_k, interpret=True))
    # CBOC has 12 transitions/chip (vs sine-BOC's 2), so the boundary-
    # adjacent timing-ULP fraction scales accordingly
    mismatch = np.abs(out - ref) > 1e-2
    assert mismatch.mean() < 6e-3, mismatch.mean()
    np.testing.assert_allclose(out[~mismatch], ref[~mismatch], atol=1e-2)


def test_int16_emit_matches_f32_emit(batch_1s):
    """emit="int16" must equal the trunc-cast of the f32 accumulator —
    the in-kernel quantization is the same (short) cast the XLA path
    applies afterwards (reference galileo-sdr.cpp:536-537)."""
    n_k = ROWS
    inputs = _small_inputs(batch_1s)
    acc = np.asarray(synth_accum_kp_pallas(inputs, n_k=n_k, interpret=True))
    i16 = np.asarray(
        synth_accum_kp_pallas(inputs, n_k=n_k, interpret=True, emit="int16")
    )
    B = acc.shape[0]
    ref = np.trunc(acc).astype(np.int16).reshape(B, -1)
    np.testing.assert_array_equal(i16, ref)


def test_resampled_window_select_matches_row_gather():
    """The pre-resampled-table slice + 5-tap select chip path must be
    bit-identical to the per-(b, c, p) row gather of the direct-G table
    (the round-1 design, kept as _pack_codes_g purely as this oracle),
    including at adversarial seeds: code phase at 0 / just under the
    wrap, code-Doppler drift mu at both extremes and zero."""
    rng = np.random.default_rng(0)
    C, B = 4, 7
    codes_b = rng.choice([-1, 1], size=(C, ROWS * COLS)).astype(np.int8)
    codes_c = rng.choice([-1, 1], size=(C, ROWS * COLS)).astype(np.int8)
    cp0 = rng.uniform(0, 4092, (B, C))
    cp0[0, 0] = 0.0
    cp0[0, 1] = 4091.9999
    cp0[1, 0] = 2046.0
    mu = rng.uniform(-3e-3, 3e-3, (B, C))
    mu[0, :] = 3e-3
    mu[1, :] = -3e-3
    mu[2, 0] = 0.0
    two_a = (COLS + mu) / P_GRID  # mu = 2*a*P_GRID - COLS

    p = np.arange(P_GRID, dtype=np.float64)
    phi = 2.0 * cp0[..., None] + two_a[..., None] * p
    gb = np.floor(phi) + np.where(mu[..., None] < 0, -1.0, 0.0)
    gbm = np.mod(gb, float(ROWS * COLS)).astype(np.int64)

    # oracle: one 32-wide row pull per (b, c, p) from the direct-G table
    vpack_g = _pack_codes_g(codes_b, codes_c)  # (C, 8184, 32)
    pulled = np.stack([
        np.stack([vpack_g[c][gbm[b, c]] for c in range(C)]) for b in range(B)
    ])  # (B, C, p, 32)
    oracle = pulled.transpose(0, 1, 3, 2)  # (B, C, 32, p)

    # production path: slice the pre-resampled table at o, select by
    # e'(p) = (gb - g0) - S(p) - kappa(p)  (mirrors _kernel_v5)
    vpack_rs = _pack_codes_rs(codes_b, codes_c)  # (C, 160, T_RS)
    g0 = gb[:, :, 0]
    start = np.mod(g0, float(ROWS * COLS)).astype(np.int64)
    o = (P_GRID * start + (COLS - 1)) // COLS
    r = COLS * o - P_GRID * start
    assert (r >= 0).all() and (r < COLS).all()
    s_p = (COLS * np.arange(P_GRID)) // P_GRID
    m_p = (COLS * np.arange(P_GRID)) % P_GRID
    sel = np.zeros((B, C, W_PACK, P_GRID), np.int64)
    e_all = []
    for b in range(B):
        for c in range(C):
            win = vpack_rs[c][:, o[b, c] : o[b, c] + P_GRID]
            kappa = (m_p + r[b, c] >= P_GRID).astype(np.int64)
            e2 = (gb[b, c] - g0[b, c]).astype(np.int64) - s_p - kappa
            e_all.append(e2)
            assert e2.min() >= -2 and e2.max() <= 2, (e2.min(), e2.max())
            for j in range(J_RS):
                mask = e2 == (j - 2)
                sel[b, c][:, mask] = win[j * W_PACK : (j + 1) * W_PACK][:, mask]
    np.testing.assert_array_equal(sel, oracle)
    # both tap extremes actually exercised across the adversarial seeds
    e_all = np.asarray(e_all)
    assert e_all.min() == -2 or e_all.min() == -1
    assert e_all.max() >= 1


def test_pallas_requires_rs_table(batch_1s):
    inputs = prepare_kp_inputs(batch_1s, ROWS * P_GRID)
    with pytest.raises(ValueError, match="pack_g"):
        synth_accum_kp_pallas(inputs, n_k=ROWS, interpret=True)


def test_default_engine_is_xla_on_cpu(batch_1s):
    assert default_engine() == "xla"  # tests force JAX_PLATFORMS=cpu
    inputs = _small_inputs(batch_1s)
    # the dispatcher must accept both names
    a = np.asarray(accum_kp(inputs, n_k=ROWS, engine="xla"))
    assert np.abs(a).max() > 0


def test_smem_budget_guard_raises_with_advice():
    """Epoch batches whose padded scalar operands exceed the v5e SMEM
    budget must fail with actionable advice, not an opaque XLA compile
    OOM.  With the symbol windows bit-packed the SMEM cost is
    C-independent (12 scalars x B x 128 lanes): B=64 fits for any
    C <= 16; B = 128 exceeds the budget."""
    import pytest

    from galileo_sdr_sim_tpu.ops.synth_kp_pallas import synth_accum_kp_pallas

    inputs = {
        "cp0": np.zeros((128, 8), np.float32),
        "vpack_rs": np.zeros((1,), np.int8),  # presence check only
    }
    with pytest.raises(ValueError, match="lower block_epochs"):
        synth_accum_kp_pallas(inputs, n_k=10400 // 1300, interpret=True)


def test_gain_is_separate_operand_not_window_amplitude(batch_1s):
    """apply_gain must never scale the symbol windows (the Pallas
    bit-pack keeps signs only — it would silently drop the gain); it
    rides as a (B, C) chan_gain operand instead."""
    inputs = prepare_kp_inputs(
        batch_1s, ROWS * P_GRID, pack_g=True, apply_gain=True
    )
    assert "chan_gain" in inputs
    g = np.asarray(inputs["chan_gain"])
    assert g.max() <= 1.0 + 1e-6 and (g > 0).any()
    # windows stayed pure signs
    for k in ("sym_win", "pilot_win"):
        w = np.asarray(inputs[k])
        assert set(np.unique(np.abs(w))) <= {0.0, 1.0}, k


def test_xla_gain_scales_each_channel(batch_1s):
    """f32 accumulator with chan_gain == sum_c g_c * (per-channel
    accumulator without gain), to f32 tolerance."""
    n_k = ROWS
    base = prepare_kp_inputs(batch_1s, ROWS * P_GRID, pack_g=True)
    gained = prepare_kp_inputs(
        batch_1s, ROWS * P_GRID, pack_g=True, apply_gain=True
    )
    acc_g = np.asarray(synth_accum_kp(gained, n_k=n_k))
    g = np.asarray(gained["chan_gain"])  # (B, C)
    B, C = g.shape
    # per-channel accumulators: zero out all other channels' windows via
    # a one-channel gain mask (exactly 0/1 -> exact channel isolation)
    expect = np.zeros_like(acc_g)
    for c in range(C):
        one = dict(base)
        mask = np.zeros_like(g)
        mask[:, c] = 1.0
        one["chan_gain"] = jnp.asarray(mask)
        expect = expect + g[:, c, None, None] * np.asarray(
            synth_accum_kp(one, n_k=n_k)
        )
    np.testing.assert_allclose(acc_g, expect, rtol=2e-5, atol=2e-3)


def test_pallas_gain_matches_xla_interpret(batch_1s):
    """The Pallas kernel applies chan_gain with the same op order as the
    XLA engine (interpreter tolerance class as the other parity tests;
    bit-identity on TPU is pinned by tools/tpu_parity_check.py)."""
    n_k = ROWS
    inputs = prepare_kp_inputs(
        batch_1s, ROWS * P_GRID, pack_g=True, apply_gain=True
    )
    assert "chan_gain" in inputs
    ref = np.asarray(jax.jit(lambda i: synth_accum_kp(i, n_k=n_k))(inputs))
    out = np.asarray(synth_accum_kp_pallas(inputs, n_k=n_k, interpret=True))
    mismatch = np.abs(out - ref) > 1e-2
    assert mismatch.mean() < 1e-3, mismatch.mean()
    np.testing.assert_allclose(out[~mismatch], ref[~mismatch], atol=1e-2)
    # and the gain actually attenuated the mix vs the ungained stream
    base = prepare_kp_inputs(batch_1s, ROWS * P_GRID, pack_g=True)
    acc0 = np.asarray(synth_accum_kp(base, n_k=n_k))
    assert np.abs(out).mean() < np.abs(acc0).mean()


def test_pack_pm1_bits_rejects_amplitude():
    from galileo_sdr_sim_tpu.ops.synth_kp_pallas import _pack_pm1_bits

    with pytest.raises(AssertionError, match="chan_gain"):
        _pack_pm1_bits(np.full((1, 1, 8), 2.0, np.float32))


def test_packed_stream_equals_flat_stream(batch_1s):
    """The packed int32 production format (synth_block_kp_packed) views
    to EXACTLY the flat interleaved int16 stream, on both engines
    (pallas via interpreter here; on-chip bit-identity is bench.py's
    parity check)."""
    from galileo_sdr_sim_tpu.ops.synth_kp import (
        packed_to_iq16,
        synth_block_kp,
        synth_block_kp_packed,
    )
    from galileo_sdr_sim_tpu.ops.synth_kp_pallas import synth_accum_kp_pallas

    n_k = ROWS
    inputs = _small_inputs(batch_1s)
    flat = np.asarray(synth_block_kp(inputs, n_k=n_k, engine="xla"))
    packed = np.asarray(synth_block_kp_packed(inputs, n_k=n_k, engine="xla"))
    assert packed.dtype == np.int32 and packed.shape == (
        flat.shape[0], n_k, P_GRID
    )
    np.testing.assert_array_equal(packed_to_iq16(packed), flat)
    pk = np.asarray(
        synth_accum_kp_pallas(inputs, n_k=n_k, interpret=True, emit="i32pack")
    )
    # interpreter tolerance class vs the jit-fused XLA engine: identical
    # here in practice; allow the documented chip-boundary ULP fraction
    mis = (packed_to_iq16(pk) != flat).mean()
    assert mis < 1e-3, mis


def test_vec_kt_variant_matches_default(batch_1s):
    """The vectorized-kt (v6) main loop is value-identical to the
    default per-kt (v5) loop — same ops per element, same channel
    order (hardware verdict: v6 measures slower and stays non-default;
    docs/kernel_design.md 'Negative result')."""
    inputs = _small_inputs(batch_1s)
    a5 = np.asarray(
        synth_accum_kp_pallas(
            inputs, n_k=ROWS, interpret=True, emit="i32pack", vec_kt=False
        )
    )
    a6 = np.asarray(
        synth_accum_kp_pallas(
            inputs, n_k=ROWS, interpret=True, emit="i32pack", vec_kt=True
        )
    )
    np.testing.assert_array_equal(a5, a6)


def test_pallas_cboc_plus_gain_matches_xla_interpret(nav, g0):
    """The CBOC weight branch and the per-channel gain branch compose:
    both engines agree with both enabled (interpreter tolerance
    class)."""
    from galileo_sdr_sim_tpu.models.cboc import E1_CBOC
    from galileo_sdr_sim_tpu.scenario import PositionProvider, ScenarioEngine

    eng = ScenarioEngine(
        nav,
        PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0, duration_s=1.0, model=E1_CBOC,
    )
    batch = next(eng.batches(8))
    inputs = prepare_kp_inputs(
        batch, ROWS * P_GRID, pack_g=True, apply_gain=True
    )
    assert "cboc_ab" in inputs and "chan_gain" in inputs
    ref = np.asarray(jax.jit(lambda i: synth_accum_kp(i, n_k=ROWS))(inputs))
    out = np.asarray(
        synth_accum_kp_pallas(inputs, n_k=ROWS, interpret=True)
    )
    mismatch = np.abs(out - ref) > 1e-2
    assert mismatch.mean() < 2e-3, mismatch.mean()
