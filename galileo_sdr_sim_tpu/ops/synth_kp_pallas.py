"""Fused Pallas TPU kernel for the (K, p) synthesis engine's hot chain.

Motivation (measured on v5e, honest chained harness — see
docs/kernel_design.md): the XLA lowering of ops/synth_kp.py materializes
the ~25-op full-rank (B, C, K, p) elementwise chain through HBM, running
at ~3% of the VPU's ~3.8 Tops/s f32 peak (12.6 ms of a 15.7 ms call at
B=32).  This kernel performs the identical math entirely in VMEM.

Structure: grid = (B, n_kap) where n_kap = n_k // 8.  Each program
computes one (8, 1300) tile of 8 consecutive K rows (K = 8*kap + rho)
for all channels:

    for c in 0..C:
        delta  = floor(psi_c + mu_c * K)            in {0, 1}
        chip_b = a0b_c + delta * dab_c              (aligned BOC planes)
        chip_c = a0c_c + delta * dac_c
        bsel   = b0_c + delta * db_c                (code-period carry)
        d_val  = d_lo + bsel * d_df                 (symbol select;
        s_val  = s_lo + bsel * s_df                  scalars from SMEM)
        m      = chip_b * d_val - chip_c * s_val
        cis    = cis_K(8,1) (computed in-kernel) x cis_p(1,1300)
        acc   += m * cis
    out[kap] = amp * acc

All operands are prepared at <= (B, C, 8, 1300) rank by XLA (gather,
row-alignment einsum, plane diffs — cheap); the p axis is padded to
1408 lanes (11 x 128) to satisfy Mosaic's lane tiling, and the kap-
constant inputs keep a constant index map so they are fetched into VMEM
once per b, not per program.

Semantics match ops/synth_kp.synth_accum_kp (same formulas and f32 tile
math; the channel reduction is sequential here vs XLA's tree reduction,
so results agree to float32 tolerance, not bit-exactly).  Validated in
tests/test_synth_kp_pallas.py.

Reference behavior being implemented: the per-sample mixing loop of
src/galileo-sdr.cpp:481-539 (chip fetch, symbol, carrier, accumulate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import LUT_AMPLITUDE
from .synth_kp import (
    COLS, J_TAPS, P_GRID, ROWS, W_GT, W_PACK, WIN, _staircase_matrix,
)

P_PAD = 1408  # 11 x 128 lanes (p axis padded from 1300)
_TWO_PI = 2.0 * np.pi
_S_CONST = ((COLS * np.arange(P_GRID)) // P_GRID).astype(np.float32)


def _pad_p(x: jax.Array) -> jax.Array:
    pad = [(0, 0)] * (x.ndim - 1) + [(0, P_PAD - P_GRID)]
    return jnp.pad(x, pad)


def chip_planes_windowed(inputs: dict, gb: jax.Array) -> tuple:
    """Chip planes via window-slice + constant staircase matmul + select.

    Per (epoch, channel) the flat half-chip base gbm(p) covers ONE
    contiguous window of <= 1024 consecutive rows of the direct-G code
    table (synth_kp._pack_codes_gt), because the (K, p) factorization
    confines each p-grid pass to a single code period.  So instead of
    665k serialized 32-wide row-pulls per B=64 batch (the dominant
    per-call cost of round 1, docs/kernel_design.md), we do:

      1. one contiguous (128, 1024) dynamic slice per (b, c) —
         bandwidth-bound, ~17 MB per batch;
      2. a CONSTANT one-hot staircase matmul resampling window rows to
         the sample grid, S(p) = floor(1023*p/1300) — MXU, bf16-exact
         (single-tap sums of +-1 values);
      3. a 4-way select over j lane groups by the integer residual
         e(p) = gbm(p) - gbm(0) - S(p) in {-1, 0, 1, 2} (the residual
         of the real code-Doppler slope vs the nominal staircase).

    Bit-identical to the row gather it replaces (all arithmetic is
    exact on +-1 / {0,1} values); proven in tests/test_synth_kp_pallas.py.
    Replaces the per-sample chip fetch of src/galileo-sdr.cpp:512-515.
    """
    table = inputs["vpack_gt"]  # (C, 128, 9208) int8
    g0 = gb[:, :, 0]  # (B, C) integer-valued f32
    start = jnp.mod(g0, float(ROWS * COLS)).astype(jnp.int32)
    win = jax.vmap(  # over B
        lambda srow: jax.vmap(
            lambda tab_c, s: jax.lax.dynamic_slice(tab_c, (0, s), (W_GT, WIN))
        )(table, srow)
    )(start)  # (B, C, 128, WIN) int8

    # bf16 halves the MXU-result traffic and is exact here (every output
    # is a single +-1 tap); CPU backends lack native bf16, so use f32.
    # The staircase matrix is zero-padded to P_PAD columns so the planes
    # come out kernel-ready (no separate pad copies).
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    emat = jnp.asarray(_pad_p(jnp.asarray(_staircase_matrix(), dt)))
    m = jnp.einsum(
        "bclr,rp->bclp", win.astype(dt), emat, preferred_element_type=dt,
    )  # (B, C, 128, P_PAD) in {-1, +1} (0 in the pad columns)

    e = _pad_p((gb - g0[..., None]) - _S_CONST)  # {-1..2}; 0 in the pad
    sel = jnp.zeros_like(m[:, :, :W_PACK, :])
    for j in range(J_TAPS):
        mask = (e == float(j - 1)).astype(dt)[:, :, None, :]
        sel = sel + mask * m[:, :, j * W_PACK : (j + 1) * W_PACK, :]
    sel = sel.astype(jnp.float32)
    # lane order within the 32: code*16 + shift*8 + rho
    a0b, a1b = sel[:, :, 0:8], sel[:, :, 8:16]  # (B, C, 8, P_PAD)
    a0c, a1c = sel[:, :, 16:24], sel[:, :, 24:32]
    return a0b, a1b, a0c, a1c


def prepare_pallas_operands(inputs: dict, n_k: int) -> dict:
    """XLA-side prep: geometry, windowed chip planes, plane diffs.

    Everything here is at most (B, C, 8, p)-rank — ~1/25 of the
    full-rank chain — and feeds the fused kernel.  Identical math to
    the corresponding prologue of synth_kp.synth_accum_kp.
    """
    cp0 = inputs["cp0"]
    B, C = cp0.shape

    p = jnp.arange(P_GRID, dtype=jnp.float32)
    rho = jnp.arange(ROWS, dtype=jnp.float32)

    phi = 2.0 * cp0[..., None] + inputs["two_a"][..., None] * p  # (B, C, p)
    mu = inputs["mu"][..., None]
    gb = jnp.floor(phi) + jnp.where(mu < 0, -1.0, 0.0)
    psi = phi - gb
    gbm = jnp.mod(gb, float(ROWS * COLS))

    a0b, a1b, a0c, a1c = chip_planes_windowed(inputs, gb)  # (B, C, 8, P_PAD)

    # code-period carry: rho + q0 >= 8  <=>  gbm >= 1023 * (8 - rho).
    # Built from pre-padded gbm so the (B, C, 8, p) planes never need a
    # separate pad copy (pad region: gbm = 0 < thr -> b0 = b1 = 0).
    gbm_p = _pad_p(gbm)
    thr = (float(COLS) * (float(ROWS) - rho))[None, None, :, None]
    b0 = (gbm_p[:, :, None, :] >= thr).astype(jnp.float32)
    b1 = (gbm_p[:, :, None, :] + 1.0 >= thr).astype(jnp.float32)
    w8 = (gb >= float(ROWS * COLS)).astype(jnp.float32)  # (B, C, p)

    ph_p = inputs["carr0"][..., None] + inputs["fc"][..., None] * p
    ph_p = ph_p - jnp.floor(ph_p)
    ang_p = jnp.float32(_TWO_PI) * ph_p
    cpr = jnp.cos(ang_p)  # (B, C, p)
    cpi = jnp.sin(ang_p)

    return dict(
        a0b=a0b, dab=a1b - a0b,
        a0c=a0c, dac=a1c - a0c,
        b0=b0, db=b1 - b0,
        psi=_pad_p(psi), w8=_pad_p(w8),
        cpr=_pad_p(cpr), cpi=_pad_p(cpi),
        mu=inputs["mu"], fc_k=inputs["fc_k"],
        sym=inputs["sym_win"], pil=inputs["pilot_win"],
    )


def _kernel(mu_s, fck_s, sym_s, pil_s,
            a0b, dab, a0c, dac, b0, db, psi, w8, cpr, cpi,
            out_i, out_q, *, C: int, kap_tile: int):
    b = pl.program_id(0)
    kap0 = pl.program_id(1) * kap_tile
    amp = jnp.float32(LUT_AMPLITUDE)
    rho8 = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0).astype(jnp.float32)

    for c in range(C):
        # channel-invariant tiles, loaded once per (program, channel)
        psi_c = psi[0, c].reshape(1, P_PAD)
        w8_c = w8[0, c].reshape(1, P_PAD)
        cpr_c = cpr[0, c].reshape(1, P_PAD)
        cpi_c = cpi[0, c].reshape(1, P_PAD)
        a0b_c, dab_c = a0b[0, c], dab[0, c]
        a0c_c, dac_c = a0c[0, c], dac[0, c]
        b0_c, db_c = b0[0, c], db[0, c]
        mu_c = mu_s[b, c]
        fck_c = fck_s[b, c]
        for kt in range(kap_tile):
            kap = kap0 + kt
            k8 = jnp.float32(ROWS) * kap.astype(jnp.float32) + rho8  # (8, 1)
            delta = jnp.floor(psi_c + mu_c * k8)  # (8, P_PAD)
            chip_b = a0b_c + delta * dab_c
            chip_c = a0c_c + delta * dac_c
            bsel = b0_c + delta * db_c
            # symbol scalars for code periods kap, kap+1, kap+2 (SMEM)
            d0, d1, d2 = sym_s[b, c, kap], sym_s[b, c, kap + 1], sym_s[b, c, kap + 2]
            s0, s1, s2 = pil_s[b, c, kap], pil_s[b, c, kap + 1], pil_s[b, c, kap + 2]
            d_lo = d0 + w8_c * (d1 - d0)  # (1, P_PAD)
            d_df = (d1 + w8_c * (d2 - d1)) - d_lo
            s_lo = s0 + w8_c * (s1 - s0)
            s_df = (s1 + w8_c * (s2 - s1)) - s_lo
            d_val = d_lo + bsel * d_df
            s_val = s_lo + bsel * s_df
            m = chip_b * d_val - chip_c * s_val
            # rank-1 carrier: K factor computed on an (8, 1) column
            ph_k = fck_c * k8
            ph_k = ph_k - jnp.floor(ph_k)
            ang_k = jnp.float32(_TWO_PI) * ph_k
            ckr = jnp.cos(ang_k)  # (8, 1)
            cki = jnp.sin(ang_k)
            cis_r = ckr * cpr_c - cki * cpi_c
            cis_i = ckr * cpi_c + cki * cpr_c
            v_i = m * cis_r
            v_q = m * cis_i
            rows = slice(kt * ROWS, (kt + 1) * ROWS)
            if C == 1:
                out_i[0, rows] = amp * v_i
                out_q[0, rows] = amp * v_q
            elif c == 0:
                out_i[0, rows] = v_i
                out_q[0, rows] = v_q
            elif c == C - 1:
                out_i[0, rows] = amp * (out_i[0, rows] + v_i)
                out_q[0, rows] = amp * (out_q[0, rows] + v_q)
            else:
                out_i[0, rows] += v_i
                out_q[0, rows] += v_q


def prepare_fused_operands(inputs: dict) -> dict:
    """Geometry + window slice only — the staircase resample, tap select,
    and carry masks all happen inside the fused kernel (v3).  Everything
    produced here is (B, C, P_PAD)-rank or smaller plus the (B, C, 128,
    1024) int8 window, so the XLA-side prologue is bandwidth-trivial."""
    cp0 = inputs["cp0"]
    p = jnp.arange(P_GRID, dtype=jnp.float32)

    phi = 2.0 * cp0[..., None] + inputs["two_a"][..., None] * p  # (B, C, p)
    mu = inputs["mu"][..., None]
    gb = jnp.floor(phi) + jnp.where(mu < 0, -1.0, 0.0)
    psi = phi - gb
    gbm = jnp.mod(gb, float(ROWS * COLS))

    g0 = gb[:, :, 0]
    start = jnp.mod(g0, float(ROWS * COLS)).astype(jnp.int32)
    win = jax.vmap(
        lambda srow: jax.vmap(
            lambda tab_c, s: jax.lax.dynamic_slice(tab_c, (0, s), (W_GT, WIN))
        )(inputs["vpack_gt"], srow)
    )(start)  # (B, C, 128, WIN) int8

    e = _pad_p((gb - g0[..., None]) - _S_CONST)  # {-1..2}; 0 in the pad
    w8 = (gb >= float(ROWS * COLS)).astype(jnp.float32)

    ph_p = inputs["carr0"][..., None] + inputs["fc"][..., None] * p
    ph_p = ph_p - jnp.floor(ph_p)
    ang_p = jnp.float32(_TWO_PI) * ph_p

    return dict(
        win=win, e=e, gbm=_pad_p(gbm), psi=_pad_p(psi), w8=_pad_p(w8),
        cpr=_pad_p(jnp.cos(ang_p)), cpi=_pad_p(jnp.sin(ang_p)),
        mu=inputs["mu"], fc_k=inputs["fc_k"],
        sym=inputs["sym_win"], pil=inputs["pilot_win"],
    )


def _kernel_fused(mu_s, fck_s, sym_s, pil_s,
                  emat, win, e_in, gbm, psi, w8, cpr, cpi,
                  out_i, out_q, planes, *, C: int, kap_tile: int):
    """v3: per-b prologue (staircase dot on the MXU + tap select + carry
    masks) runs once per batch row into VMEM scratch; the kap-tile loop
    then consumes scratch with zero HBM plane traffic."""
    b = pl.program_id(0)
    kap0 = pl.program_id(1) * kap_tile
    amp = jnp.float32(LUT_AMPLITUDE)
    rho8 = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0).astype(jnp.float32)
    thr = jnp.float32(COLS) * (jnp.float32(ROWS) - rho8)  # (8, 1)

    @pl.when(pl.program_id(1) == 0)
    def _fill_planes():
        for c in range(C):
            m = jnp.dot(
                win[0, c].astype(jnp.bfloat16), emat[...],
                preferred_element_type=jnp.float32,
            )  # (128, P_PAD), exact +-1 single taps
            e_c = e_in[0, c].reshape(1, P_PAD)
            sel = jnp.zeros((W_PACK, P_PAD), jnp.float32)
            for j in range(J_TAPS):
                mask = (e_c == jnp.float32(j - 1)).astype(jnp.float32)
                sel = sel + mask * m[j * W_PACK : (j + 1) * W_PACK]
            a0b, a1b = sel[0:8], sel[8:16]
            a0c, a1c = sel[16:24], sel[24:32]
            gbm_c = gbm[0, c].reshape(1, P_PAD)
            b0 = (gbm_c >= thr).astype(jnp.float32)  # (8, P_PAD)
            b1 = (gbm_c + 1.0 >= thr).astype(jnp.float32)
            planes[c, 0:8] = a0b
            planes[c, 8:16] = a1b - a0b
            planes[c, 16:24] = a0c
            planes[c, 24:32] = a1c - a0c
            planes[c, 32:40] = b0
            planes[c, 40:48] = b1 - b0

    for c in range(C):
        psi_c = psi[0, c].reshape(1, P_PAD)
        w8_c = w8[0, c].reshape(1, P_PAD)
        cpr_c = cpr[0, c].reshape(1, P_PAD)
        cpi_c = cpi[0, c].reshape(1, P_PAD)
        a0b_c, dab_c = planes[c, 0:8], planes[c, 8:16]
        a0c_c, dac_c = planes[c, 16:24], planes[c, 24:32]
        b0_c, db_c = planes[c, 32:40], planes[c, 40:48]
        mu_c = mu_s[b, c]
        fck_c = fck_s[b, c]
        for kt in range(kap_tile):
            kap = kap0 + kt
            k8 = jnp.float32(ROWS) * kap.astype(jnp.float32) + rho8
            delta = jnp.floor(psi_c + mu_c * k8)
            chip_b = a0b_c + delta * dab_c
            chip_c = a0c_c + delta * dac_c
            bsel = b0_c + delta * db_c
            d0, d1, d2 = sym_s[b, c, kap], sym_s[b, c, kap + 1], sym_s[b, c, kap + 2]
            s0, s1, s2 = pil_s[b, c, kap], pil_s[b, c, kap + 1], pil_s[b, c, kap + 2]
            d_lo = d0 + w8_c * (d1 - d0)
            d_df = (d1 + w8_c * (d2 - d1)) - d_lo
            s_lo = s0 + w8_c * (s1 - s0)
            s_df = (s1 + w8_c * (s2 - s1)) - s_lo
            d_val = d_lo + bsel * d_df
            s_val = s_lo + bsel * s_df
            m = chip_b * d_val - chip_c * s_val
            ph_k = fck_c * k8
            ph_k = ph_k - jnp.floor(ph_k)
            ang_k = jnp.float32(_TWO_PI) * ph_k
            ckr = jnp.cos(ang_k)
            cki = jnp.sin(ang_k)
            cis_r = ckr * cpr_c - cki * cpi_c
            cis_i = ckr * cpi_c + cki * cpr_c
            v_i = m * cis_r
            v_q = m * cis_i
            rows = slice(kt * ROWS, (kt + 1) * ROWS)
            if C == 1:
                out_i[0, rows] = amp * v_i
                out_q[0, rows] = amp * v_q
            elif c == 0:
                out_i[0, rows] = v_i
                out_q[0, rows] = v_q
            elif c == C - 1:
                out_i[0, rows] = amp * (out_i[0, rows] + v_i)
                out_q[0, rows] = amp * (out_q[0, rows] + v_q)
            else:
                out_i[0, rows] += v_i
                out_q[0, rows] += v_q


def synth_accum_kp_pallas_fused(
    inputs: dict, n_k: int, interpret: bool = False
) -> jax.Array:
    """v3 fully-fused engine: window slice is the only HBM-rank prep;
    resample/select/mask + synthesis run in one kernel."""
    if "vpack_gt" not in inputs:
        raise ValueError(
            "the Pallas engine needs the windowed code table: call "
            "prepare_kp_inputs(..., pack_g=True)"
        )
    ops = prepare_fused_operands(inputs)
    B, C = inputs["cp0"].shape
    assert n_k % ROWS == 0, n_k
    n_kap = n_k // ROWS
    kap_tile = next(t for t in (5, 4, 3, 2, 1) if n_kap % t == 0)

    def vspec(*shape, dtype_ok=True):
        return pl.BlockSpec(
            (1,) + shape, lambda b, kap: (b,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    sspec = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    const_vmem = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole-array constant

    out_spec = pl.BlockSpec(
        (1, ROWS * kap_tile, P_PAD), lambda b, kap: (b, kap, 0),
        memory_space=pltpu.VMEM,
    )
    emat = jnp.asarray(_pad_p(jnp.asarray(_staircase_matrix(), jnp.bfloat16)))

    order = ("e", "gbm", "psi", "w8", "cpr", "cpi")
    in_specs = [
        sspec(), sspec(), sspec(), sspec(),
        const_vmem,  # emat
        vspec(C, W_GT, WIN),  # win
    ] + [vspec(C, P_PAD) for _ in order]
    out_i, out_q = pl.pallas_call(
        functools.partial(_kernel_fused, C=C, kap_tile=kap_tile),
        grid=(B, n_kap // kap_tile),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_k, P_PAD), jnp.float32),
            jax.ShapeDtypeStruct((B, n_k, P_PAD), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((C, 6 * ROWS, P_PAD), jnp.float32)],
        interpret=interpret,
    )(
        ops["mu"].astype(jnp.float32), ops["fc_k"].astype(jnp.float32),
        ops["sym"].astype(jnp.float32), ops["pil"].astype(jnp.float32),
        emat, ops["win"],
        *(ops[k].astype(jnp.float32) for k in order),
    )

    iq = jnp.stack([out_i[:, :, :P_GRID], out_q[:, :, :P_GRID]], axis=-1)
    return iq.reshape(B, n_k * P_GRID, 2)


def synth_accum_kp_pallas(
    inputs: dict, n_k: int, interpret: bool = False
) -> jax.Array:
    """Drop-in replacement for synth_kp.synth_accum_kp: (B, n_k*1300, 2)
    float32 channel-summed accumulator, fused on the VPU."""
    if "vpack_gt" not in inputs:
        raise ValueError(
            "the Pallas engine needs the windowed code table: call "
            "prepare_kp_inputs(..., pack_g=True)"
        )
    ops = prepare_pallas_operands(inputs, n_k)
    B, C = inputs["cp0"].shape
    assert n_k % ROWS == 0, n_k
    n_kap = n_k // ROWS
    kap_tile = next(t for t in (5, 4, 3, 2, 1) if n_kap % t == 0)

    def vspec(*shape):
        # kap-constant VMEM block: fetched once per b
        return pl.BlockSpec(
            (1,) + shape, lambda b, kap: (b,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    # SMEM scalar tables are passed whole (unblocked) and indexed by
    # program_id in the kernel — Mosaic requires full-array SMEM blocks.
    sspec = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731

    out_spec = pl.BlockSpec(
        (1, ROWS * kap_tile, P_PAD), lambda b, kap: (b, kap, 0),
        memory_space=pltpu.VMEM,
    )

    order = ("mu", "fc_k", "sym", "pil",
             "a0b", "dab", "a0c", "dac", "b0", "db",
             "psi", "w8", "cpr", "cpi")
    in_specs = [
        sspec(), sspec(), sspec(), sspec(),
        vspec(C, ROWS, P_PAD), vspec(C, ROWS, P_PAD),
        vspec(C, ROWS, P_PAD), vspec(C, ROWS, P_PAD),
        vspec(C, ROWS, P_PAD), vspec(C, ROWS, P_PAD),
        vspec(C, P_PAD), vspec(C, P_PAD),
        vspec(C, P_PAD), vspec(C, P_PAD),
    ]
    out_i, out_q = pl.pallas_call(
        functools.partial(_kernel, C=C, kap_tile=kap_tile),
        grid=(B, n_kap // kap_tile),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_k, P_PAD), jnp.float32),
            jax.ShapeDtypeStruct((B, n_k, P_PAD), jnp.float32),
        ),
        interpret=interpret,
    )(*(ops[k].astype(jnp.float32) for k in order))

    iq = jnp.stack([out_i[:, :, :P_GRID], out_q[:, :, :P_GRID]], axis=-1)
    return iq.reshape(B, n_k * P_GRID, 2)
