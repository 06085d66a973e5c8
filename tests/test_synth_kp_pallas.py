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
