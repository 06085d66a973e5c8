"""Fused Pallas engine vs the XLA (K,p) engine.

On TPU the two are bit-identical (same f32 tile math; validated on
hardware during development).  These tests run the kernel in Pallas
interpreter mode on the CPU backend so CI needs no TPU; shapes are kept
small because the interpreter executes op-by-op.
"""

import numpy as np
import jax
import pytest

from galileo_sdr_sim_tpu.ops.synth_kp import (
    P_GRID,
    ROWS,
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


def test_windowed_chip_planes_match_row_gather():
    """The slice + constant-staircase-matmul + select chip path must be
    bit-identical to the per-(b, c, p) row gather of the direct-G table
    it replaced (round-1 design), including at adversarial seeds: code
    phase at 0 / just under the wrap, code-Doppler drift mu at both
    extremes and zero."""
    import jax.numpy as jnp

    from galileo_sdr_sim_tpu.ops.synth_kp import (
        COLS, _pack_codes_g, _pack_codes_gt,
    )
    from galileo_sdr_sim_tpu.ops.synth_kp_pallas import (
        _S_CONST, chip_planes_windowed,
    )

    rng = np.random.default_rng(0)
    C, B = 8, 7
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

    inputs = dict(
        cp0=jnp.asarray(cp0, jnp.float32),
        two_a=jnp.asarray(two_a, jnp.float32),
        mu=jnp.asarray(mu, jnp.float32),
        vpack_gt=jnp.asarray(_pack_codes_gt(codes_b, codes_c)),
    )
    p = jnp.arange(P_GRID, dtype=jnp.float32)
    phi = 2.0 * inputs["cp0"][..., None] + inputs["two_a"][..., None] * p
    gb = jnp.floor(phi) + jnp.where(inputs["mu"][..., None] < 0, -1.0, 0.0)
    gbm = jnp.mod(gb, float(ROWS * COLS))

    # the round-1 reference path: one 32-wide row pull per (b, c, p)
    vpack_g = jnp.asarray(_pack_codes_g(codes_b, codes_c))
    idx = gbm.astype(jnp.int32)
    pulled = jax.vmap(
        lambda ib: jax.vmap(lambda tab, ic: tab[ic])(vpack_g, ib)
    )(idx)
    A = pulled.reshape(B, C, P_GRID, 2, 2, ROWS).transpose(0, 1, 3, 4, 5, 2)
    old = (A[:, :, 0, 0], A[:, :, 0, 1], A[:, :, 1, 0], A[:, :, 1, 1])

    new = chip_planes_windowed(inputs, gb)
    for o, n in zip(old, new):
        np.testing.assert_array_equal(
            np.asarray(o, np.float32), np.asarray(n)[:, :, :, :P_GRID]
        )

    # staircase residual stays within the 4 packed taps
    e = np.asarray(gb - gb[:, :, :1]) - np.asarray(_S_CONST)
    assert e.min() >= -1 and e.max() <= 2, (e.min(), e.max())


def test_pallas_requires_g_table(batch_1s):
    inputs = prepare_kp_inputs(batch_1s, ROWS * P_GRID)
    with pytest.raises(ValueError, match="pack_g"):
        synth_accum_kp_pallas(inputs, n_k=ROWS, interpret=True)


def test_default_engine_is_xla_on_cpu(batch_1s):
    assert default_engine() == "xla"  # tests force JAX_PLATFORMS=cpu
    inputs = _small_inputs(batch_1s)
    # the dispatcher must accept both names
    a = np.asarray(accum_kp(inputs, n_k=ROWS, engine="xla"))
    assert np.abs(a).max() > 0
