"""Fused Pallas TPU kernel for the (K, p) synthesis engine's hot chain.

Motivation (measured on v5e, honest chained harness — see
docs/kernel_design.md): the XLA lowering of ops/synth_kp.py materializes
the ~25-op full-rank (B, C, K, p) elementwise chain through HBM, running
at ~3% of the VPU's ~3.8 Tops/s f32 peak.  This kernel performs the
identical math entirely in VMEM, and (v5) reduces the per-call prep to
one contiguous int8 slice per (epoch, channel):

1. **Pre-resampled window table** (synth_kp._pack_codes_rs): the
   sample-grid staircase S(p) = floor(1023*p/1300) is start-independent,
   so it is baked into the packed code table once per channel map.  The
   whole chip fetch is then a contiguous (160, 1408) int8 column slice
   at o = ceil(1300*start/1023) plus an in-kernel 5-tap select by the
   residual e'(p) = (gb(p) - g0) - S(p) - kappa(p) in {-2..2} — no MXU
   work at all.  (Earlier revisions resampled per (b, c) with a one-hot
   staircase matmul: ~190 GFLOP per B=64 call to select single taps,
   costing about as much as the XLA prep it replaced.)
2. **In-kernel geometry prologue**: per batch row (grid program
   kap == 0) each channel's (1, P_PAD) geometry — phi/gb/psi, tap
   select, carry thresholds, carrier sin/cos — is computed from SMEM
   scalars into VMEM scratch; the kap-tile main loop then consumes
   scratch with zero HBM plane traffic.
3. **int16 emission** (emit="int16"): the kernel truncates and packs to
   int16 in VMEM, saving the two full-size f32 HBM round-trips the
   separate quantization pass cost (the f32 accumulator variant
   emit="f32" remains for the satellite-sharded mesh path, which must
   psum partial sums before truncation — parallel/mesh.py).

Main loop per (kap-tile row block, channel):

    delta  = floor(psi_c + mu_c * K)            in {0, 1}
    chip_b = a0b_c + delta * dab_c              (aligned BOC planes)
    chip_c = a0c_c + delta * dac_c
    bsel   = b0_c + delta * db_c                (code-period carry)
    d_val  = d_lo + bsel * d_df                 (symbol select;
    s_val  = s_lo + bsel * s_df                  scalars from SMEM)
    m      = chip_b * d_val - chip_c * s_val
    cis    = cis_K(8,1) (computed in-kernel) x cis_p(1,1300)
    acc   += m * cis                            (channels ascending)

Semantics match ops/synth_kp.synth_accum_kp exactly (same formulas and
f32 tile math, same channel order); on TPU the engines are bit-identical
(pinned by bench.py's parity check and tests/test_synth_kp_pallas.py).

Reference behavior being implemented: the per-sample mixing loop of
src/galileo-sdr.cpp:481-539 (chip fetch, symbol, carrier, accumulate,
(short) cast).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import LUT_AMPLITUDE
from .synth_kp import COLS, J_RS, P_GRID, ROWS, T_RS, W_PACK, W_RS

P_PAD = 1408  # 11 x 128 lanes (p axis padded from 1300)
W_WIN = P_PAD + 128  # DMA'd window lanes: 128-aligned start + phase < 128
_TWO_PI = 2.0 * np.pi

# planes scratch rows per channel
_PL = {"a0b": 0, "dab": 8, "a0c": 16, "dac": 24, "b0": 32, "db": 40,
       "psi": 48, "w8": 49, "cpr": 50, "cpi": 51, "pgb": 52}
_PL_ROWS = 53


def _kernel_v5(cp0_s, two_a_s, mu_s, g0_s, o128_s, ph_s, r_s, carr0_s,
               fc_s, fck_s, sym_s, pil_s, ab_s, gain_s, tab_hbm,
               *rest, C: int, kap_tile: int,
               emit: str, cboc: bool, use_gain: bool,
               vec_kt: bool = False,
               sections: tuple = ("prologue", "main")):
    # `sections` exists for cost attribution probes only
    # (tools/probe_kernel_cost.py): dropping "prologue" leaves scratch
    # garbage, dropping "main" writes nothing useful — never production.
    if emit == "i32pack":
        out_w, planes, win, sems = rest
    else:
        out_i, out_q, planes, win, sems = rest
    b = pl.program_id(0)
    kap0 = pl.program_id(1) * kap_tile
    amp = jnp.float32(LUT_AMPLITUDE)
    rho8 = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0).astype(jnp.float32)
    thr = jnp.float32(COLS) * (jnp.float32(ROWS) - rho8)  # (8, 1)
    nper = jnp.float32(ROWS * COLS)

    def _win_dma(c):
        # contiguous (W_RS, W_WIN) int8 window: the DMA engine does the
        # strided copy natively, where an XLA-side vmapped dynamic_slice
        # lowers to a serialized gather that cost more than the whole
        # kernel (6.3 of 7.0 ms at B=64 — tools/probe_prep_ablation.py
        # 'slice').  Mosaic requires the lane-dim slice start to be a
        # tile multiple, so the slice begins at o128 = (o//128)*128 and
        # the intra-tile phase = o - o128 is folded into the lane grid
        # below and removed with one dynamic rotate per plane group.
        o128 = pl.multiple_of(o128_s[b, c], 128)
        return pltpu.make_async_copy(
            tab_hbm.at[c, :, pl.ds(o128, W_WIN)], win.at[c], sems.at[c]
        )

    @pl.when(pl.program_id(1) == (0 if "prologue" in sections else -1))
    def _fill_planes():
        for c in range(C):
            _win_dma(c).start()
        l_row = jax.lax.broadcasted_iota(
            jnp.int32, (1, W_WIN), 1
        ).astype(jnp.float32)
        for c in range(C):
            phase = ph_s[b, c]  # int32 in [0, 128)

            def rot(x):
                # planes'[., p] = x[., p + phase]: rotate left by phase
                # (as a non-negative right-rotate), then crop the lane
                # padding.  Exact lane permutation — no arithmetic.
                return pltpu.roll(x, W_WIN - phase, axis=1)[:, :P_PAD]

            # --- integer chip geometry on the lane grid l = p + phase --
            pp = l_row - phase.astype(jnp.float32)  # sample index p
            mu_c = mu_s[b, c]
            phi = 2.0 * cp0_s[b, c] + two_a_s[b, c] * pp  # (1, W_WIN)
            gb = jnp.floor(phi) + jnp.where(mu_c < 0.0, -1.0, 0.0)
            psi = phi - gb
            gbm = gb - nper * jnp.floor(gb * (1.0 / nper))
            w8 = (gb >= nper).astype(jnp.float32)
            # staircase S(p) = floor(1023*p/1300) and its residual
            # m(p) = 1023*p - 1300*S(p), computed in f32: products are
            # exact integers < 2^24 and the quotient is never within
            # ~1e-4 of a wrong integer (min fractional gap 1/1300), so
            # the floor is exact on the valid lanes.
            s_p = jnp.floor(pp * jnp.float32(COLS / P_GRID))
            m_p = jnp.float32(COLS) * pp - jnp.float32(P_GRID) * s_p
            # tap residual vs the pre-resampled window (see
            # synth_kp._pack_codes_rs): e' = (gb - g0) - S(p) - kappa(p)
            kap_p = (m_p + r_s[b, c] >= jnp.float32(P_GRID)).astype(
                jnp.float32
            )
            e2 = (gb - g0_s[b, c]) - s_p - kap_p
            # --- carrier p-factor --------------------------------------
            ph_p = carr0_s[b, c] + fc_s[b, c] * pp
            ph_p = ph_p - jnp.floor(ph_p)
            ang_p = jnp.float32(_TWO_PI) * ph_p
            # --- chip planes: 5-tap select over the DMA'd window -------
            _win_dma(c).wait()
            sel = jnp.zeros((W_PACK, W_WIN), jnp.float32)
            for j in range(J_RS):
                mask = (e2 == jnp.float32(j - 2)).astype(jnp.float32)
                sel = sel + mask * win[c, j * W_PACK : (j + 1) * W_PACK].astype(
                    jnp.float32
                )
            a0b, a1b = sel[0:8], sel[8:16]
            a0c, a1c = sel[16:24], sel[24:32]
            b0 = (gbm >= thr).astype(jnp.float32)  # (8, W_WIN)
            b1 = (gbm + 1.0 >= thr).astype(jnp.float32)
            planes[c, 0:8] = rot(a0b)
            planes[c, 8:16] = rot(a1b - a0b)
            planes[c, 16:24] = rot(a0c)
            planes[c, 24:32] = rot(a1c - a0c)
            planes[c, 32:40] = rot(b0)
            planes[c, 40:48] = rot(b1 - b0)
            planes[c, 48:49] = rot(psi)
            planes[c, 49:50] = rot(w8)
            planes[c, 50:51] = rot(jnp.cos(ang_p))
            planes[c, 51:52] = rot(jnp.sin(ang_p))
            if cboc:
                # half-chip-base parity for the sc6 weight (see the
                # cboc branch in synth_kp.synth_accum_kp); gb is an
                # exact integer in f32 so the mod-2 is exact
                planes[c, 52:53] = rot(gb - 2.0 * jnp.floor(gb * 0.5))

    if "main" not in sections:
        return
    rho_par = rho8 - 2.0 * jnp.floor(rho8 * 0.5)  # (8, 1) K parity
    if vec_kt:
        # v6 main loop: one (kap_tile, 8, P_PAD) chain per channel
        # instead of kap_tile separate (8, P_PAD) chains — identical
        # values elementwise (same op order per element, same ascending
        # channel adds), so bit-identity with the XLA engine is
        # preserved; larger ops amortize per-op VPU overhead.
        kt_i = jax.lax.broadcasted_iota(jnp.int32, (kap_tile, 1, 1), 0)
        kap3 = kap0 + kt_i  # (kt, 1, 1) int32
        k3 = (
            jnp.float32(ROWS) * kap3.astype(jnp.float32)
            + rho8.reshape(1, ROWS, 1)
        )  # (kt, 8, 1)
        rho_par3 = rho_par.reshape(1, ROWS, 1)
        acc_i = acc_q = None
        for c in range(C):
            psi_c = planes[c, 48:49][None]  # (1, 1, P_PAD)
            w8_c = planes[c, 49:50][None]
            cpr_c = planes[c, 50:51][None]
            cpi_c = planes[c, 51:52][None]
            a0b_c, dab_c = planes[c, 0:8][None], planes[c, 8:16][None]
            a0c_c, dac_c = planes[c, 16:24][None], planes[c, 24:32][None]
            b0_c, db_c = planes[c, 32:40][None], planes[c, 40:48][None]
            t_kp = psi_c + mu_s[b, c] * k3  # (kt, 8, P_PAD)
            delta = jnp.floor(t_kp)
            chip_b = a0b_c + delta * dab_c
            chip_c = a0c_c + delta * dac_c
            bsel = b0_c + delta * db_c
            wd = sym_s[b, c]
            wp = pil_s[b, c]
            d0 = 1.0 - 2.0 * ((wd >> kap3) & 1).astype(jnp.float32)
            d1 = 1.0 - 2.0 * ((wd >> (kap3 + 1)) & 1).astype(jnp.float32)
            d2 = 1.0 - 2.0 * ((wd >> (kap3 + 2)) & 1).astype(jnp.float32)
            s0 = 1.0 - 2.0 * ((wp >> kap3) & 1).astype(jnp.float32)
            s1 = 1.0 - 2.0 * ((wp >> (kap3 + 1)) & 1).astype(jnp.float32)
            s2 = 1.0 - 2.0 * ((wp >> (kap3 + 2)) & 1).astype(jnp.float32)
            d_lo = d0 + w8_c * (d1 - d0)
            d_df = (d1 + w8_c * (d2 - d1)) - d_lo
            s_lo = s0 + w8_c * (s1 - s0)
            s_df = (s1 + w8_c * (s2 - s1)) - s_lo
            d_val = d_lo + bsel * d_df
            s_val = s_lo + bsel * s_df
            if cboc:
                frac = t_kp - delta
                j6 = jnp.floor(jnp.float32(6.0) * frac)
                par = planes[c, 52:53][None] + rho_par3 + delta + j6
                tau = 1.0 - 2.0 * (par - 2.0 * jnp.floor(par * 0.5))
                wb = ab_s[0] + ab_s[1] * tau
                wc = ab_s[0] - ab_s[1] * tau
                m = (chip_b * wb) * d_val - (chip_c * wc) * s_val
            else:
                m = chip_b * d_val - chip_c * s_val
            if use_gain:
                m = m * gain_s[b, c]
            ph_k = fck_s[b, c] * k3
            ph_k = ph_k - jnp.floor(ph_k)
            ang_k = jnp.float32(_TWO_PI) * ph_k
            ckr = jnp.cos(ang_k)  # (kt, 8, 1)
            cki = jnp.sin(ang_k)
            cis_r = ckr * cpr_c - cki * cpi_c
            cis_i = ckr * cpi_c + cki * cpr_c
            v_i = m * cis_r
            v_q = m * cis_i
            acc_i = v_i if c == 0 else acc_i + v_i
            acc_q = v_q if c == 0 else acc_q + v_q
        R_TILE = ROWS * kap_tile
        if emit == "i32pack":
            ii = jnp.trunc(amp * acc_i).astype(jnp.int32)
            qq = jnp.trunc(amp * acc_q).astype(jnp.int32)
            out_w[0] = ((ii & 0xFFFF) | (qq << 16)).reshape(R_TILE, P_PAD)
        elif emit == "int16":
            out_i[0] = jnp.trunc(amp * acc_i).astype(jnp.int16).reshape(
                R_TILE, P_PAD
            )
            out_q[0] = jnp.trunc(amp * acc_q).astype(jnp.int16).reshape(
                R_TILE, P_PAD
            )
        else:
            out_i[0] = (amp * acc_i).reshape(R_TILE, P_PAD)
            out_q[0] = (amp * acc_q).reshape(R_TILE, P_PAD)
        return
    for kt in range(kap_tile):
        kap = kap0 + kt
        k8 = jnp.float32(ROWS) * kap.astype(jnp.float32) + rho8  # (8, 1)
        acc_i = acc_q = None
        for c in range(C):
            psi_c = planes[c, 48:49]
            w8_c = planes[c, 49:50]
            cpr_c = planes[c, 50:51]
            cpi_c = planes[c, 51:52]
            a0b_c, dab_c = planes[c, 0:8], planes[c, 8:16]
            a0c_c, dac_c = planes[c, 16:24], planes[c, 24:32]
            b0_c, db_c = planes[c, 32:40], planes[c, 40:48]
            t_kp = psi_c + mu_s[b, c] * k8  # (8, P_PAD)
            delta = jnp.floor(t_kp)
            chip_b = a0b_c + delta * dab_c
            chip_c = a0c_c + delta * dac_c
            bsel = b0_c + delta * db_c
            # symbol windows arrive bit-packed (one int32 per (b, c):
            # bit k set <=> symbol k is -1), so SMEM cost is
            # C-independent; arithmetic >> then &1 extracts bit kap
            wd = sym_s[b, c]
            wp = pil_s[b, c]
            d0 = 1.0 - 2.0 * ((wd >> kap) & 1).astype(jnp.float32)
            d1 = 1.0 - 2.0 * ((wd >> (kap + 1)) & 1).astype(jnp.float32)
            d2 = 1.0 - 2.0 * ((wd >> (kap + 2)) & 1).astype(jnp.float32)
            s0 = 1.0 - 2.0 * ((wp >> kap) & 1).astype(jnp.float32)
            s1 = 1.0 - 2.0 * ((wp >> (kap + 1)) & 1).astype(jnp.float32)
            s2 = 1.0 - 2.0 * ((wp >> (kap + 2)) & 1).astype(jnp.float32)
            d_lo = d0 + w8_c * (d1 - d0)  # (1, P_PAD)
            d_df = (d1 + w8_c * (d2 - d1)) - d_lo
            s_lo = s0 + w8_c * (s1 - s0)
            s_df = (s1 + w8_c * (s2 - s1)) - s_lo
            d_val = d_lo + bsel * d_df
            s_val = s_lo + bsel * s_df
            if cboc:
                # tau = (-1)^(parity(gb) + parity(K) + delta + j6); op
                # order mirrors synth_kp.synth_accum_kp's cboc branch
                # exactly (bit-identical engines on TPU)
                frac = t_kp - delta
                j6 = jnp.floor(jnp.float32(6.0) * frac)
                par = planes[c, 52:53] + rho_par + delta + j6
                tau = 1.0 - 2.0 * (par - 2.0 * jnp.floor(par * 0.5))
                wb = ab_s[0] + ab_s[1] * tau
                wc = ab_s[0] - ab_s[1] * tau
                m = (chip_b * wb) * d_val - (chip_c * wc) * s_val
            else:
                m = chip_b * d_val - chip_c * s_val
            if use_gain:
                # per-channel path-loss/antenna amplitude — a separate
                # SMEM scalar because the bit-packed symbol windows
                # carry signs only (same op order as the XLA engine)
                m = m * gain_s[b, c]
            # rank-1 carrier: K factor computed on an (8, 1) column
            ph_k = fck_s[b, c] * k8
            ph_k = ph_k - jnp.floor(ph_k)
            ang_k = jnp.float32(_TWO_PI) * ph_k
            ckr = jnp.cos(ang_k)  # (8, 1)
            cki = jnp.sin(ang_k)
            cis_r = ckr * cpr_c - cki * cpi_c
            cis_i = ckr * cpi_c + cki * cpr_c
            v_i = m * cis_r
            v_q = m * cis_i
            acc_i = v_i if c == 0 else acc_i + v_i
            acc_q = v_q if c == 0 else acc_q + v_q
        rows = slice(kt * ROWS, (kt + 1) * ROWS)
        if emit == "i32pack":
            # the reference's (short) cast truncates toward zero
            # (galileo-sdr.cpp:536-537); the two int16 components are
            # packed into ONE little-endian int32 word (I low, Q high),
            # whose byte stream IS the interleaved int16 I/Q format —
            # the host views it as int16 for free, skipping the XLA
            # epilogue's lane-unaligned stack/flatten relayout
            # (1300 % 128 != 0) and one of the two output buffers
            # (tools/probe_kernel_cost.py, round 5)
            ii = jnp.trunc(amp * acc_i).astype(jnp.int32)
            qq = jnp.trunc(amp * acc_q).astype(jnp.int32)
            out_w[0, rows] = (ii & 0xFFFF) | (qq << 16)
        elif emit == "int16":
            # the reference's (short) cast truncates toward zero
            # (galileo-sdr.cpp:536-537)
            out_i[0, rows] = jnp.trunc(amp * acc_i).astype(jnp.int16)
            out_q[0, rows] = jnp.trunc(amp * acc_q).astype(jnp.int16)
        else:
            out_i[0, rows] = amp * acc_i
            out_q[0, rows] = amp * acc_q


def _pack_pm1_bits(win) -> jax.Array:
    """(B, C, W<=32) +-1 window -> (B, C) int32 bit mask (bit k set <=>
    entry k is -1).  uint32 accumulate wraps bit 31 correctly.

    The pack keeps SIGNS only — amplitude (e.g. per-channel gain) must
    travel as a separate operand (inputs['chan_gain']), never as window
    scaling.  Guarded below when the window is concrete (it is traced
    when called under jit, where the check cannot run)."""
    w = jnp.asarray(win)
    W = w.shape[-1]
    assert W <= 32, W
    if not isinstance(w, jax.core.Tracer):
        mx = float(jnp.max(jnp.abs(w)))
        assert mx <= 1.0 + 1e-6, (
            f"symbol window carries amplitude (max |w| = {mx}); the "
            "bit-pack would drop it — pass gain via inputs['chan_gain']"
        )
    weights = jnp.asarray((1 << np.arange(W, dtype=np.uint64)) & 0xFFFFFFFF,
                          jnp.uint32)
    bits = (w < 0).astype(jnp.uint32)
    packed = jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)
    return packed.astype(jnp.int32)


def _window_anchors(inputs: dict) -> tuple:
    """(B, C) slice anchors o and residuals r for the in-kernel DMA.

    o = ceil(1300*start/1023), r = 1023*o - 1300*start, start = g0 mod
    8184 — exact in int32 (values < 2^24)."""
    cp0 = inputs["cp0"]
    g0 = jnp.floor(2.0 * cp0) + jnp.where(inputs["mu"] < 0.0, -1.0, 0.0)
    start = jnp.mod(g0, float(ROWS * COLS)).astype(jnp.int32)
    o = (P_GRID * start + (COLS - 1)) // COLS
    r = COLS * o - P_GRID * start
    return g0, o, r


def synth_accum_kp_pallas(
    inputs: dict,
    n_k: int,
    interpret: bool = False,
    emit: str = "f32",
    kap_tile: int | None = None,
    vec_kt: bool | None = None,
    _sections: tuple = ("prologue", "main"),
) -> jax.Array:
    """Fused (v5) Pallas engine.

    emit="f32": drop-in replacement for synth_kp.synth_accum_kp —
    (B, n_k*1300, 2) float32 channel-summed accumulator (the mesh path
    psums these partials over the satellite axis before truncation).

    emit="int16": additionally truncates and packs in-kernel —
    (B, 2*n_k*1300) interleaved int16, the full synth_block_kp output,
    skipping the separate full-size quantization pass.  NOTE: the final
    flatten is a lane-UNALIGNED XLA relayout (1300 % 128 != 0) — the
    production stream path uses emit="i32pack" instead.

    emit="i32pack": truncates AND interleaves in-kernel by packing each
    I/Q int16 pair into one little-endian int32 (I low half, Q high) —
    (B, n_k, 1300) int32 whose byte stream equals the interleaved int16
    format; np.asarray(...).view(np.int16) is the free host-side
    flatten (synth_kp.packed_to_iq16).
    """
    if "vpack_rs" not in inputs:
        raise ValueError(
            "the Pallas engine needs the pre-resampled code table: call "
            "prepare_kp_inputs(..., pack_g=True)"
        )
    assert emit in ("f32", "int16", "i32pack"), emit
    cp0 = inputs["cp0"]
    B, C = cp0.shape
    # SMEM budget guard: the scalar-prefetch operands pad each row to
    # 128 lanes (B*128*4 bytes each); with the symbol windows bit-packed
    # into one int32 per (B, C) there are 13 such scalars (incl. the
    # per-channel gain), independent of C — against the v5e's 1 MB SMEM
    # (shared with runtime bookkeeping; with the unpacked f32 windows
    # B=64 failed at C=12 with "Used 1.31M of 1.00M smem").  Fail with
    # advice instead of an opaque XLA compile OOM.
    smem_bytes = B * 4 * 13 * 128
    if smem_bytes > 480_000:
        raise ValueError(
            f"(B={B}, C={C}) scalar operands need ~{smem_bytes // 1024} KB"
            " of padded SMEM (v5e budget ~470 KB after runtime overhead):"
            " lower block_epochs (production streaming uses 8) or split "
            "the epoch axis over a mesh"
        )
    assert n_k % ROWS == 0, n_k
    n_kap = n_k // ROWS
    # the symbol windows cover SYM_WIN=32 wraps; the kernel reads up to
    # kap+2 (same bound the unpacked windows had, now a bit-shift bound)
    assert n_kap + 2 <= 32, (
        f"n_k={n_k} needs {n_kap + 2} symbol-window entries > 32; "
        "split the call into <= 0.1 s epochs"
    )
    C_pre = inputs["cp0"].shape[1]
    if kap_tile is None:
        # grid-program count is a real per-call fixed cost (a few us per
        # Mosaic program instance); kap_tile trades program count
        # against unrolled kernel size (the kt x C inner loops are
        # Python-unrolled, and their live temporaries count against the
        # 16 MB scoped-VMEM stack).  Largest divisor with C*tile <= 200
        # cut B=64 C<=8 from 320 to 64 programs: measured 5.41 -> 4.73
        # ms/call (+13%) same-session, bit-identical (round 4); C=16
        # with tile 25 exceeded scoped VMEM by 1.96 MB, so wide channel
        # counts keep the smaller tile.
        kap_tile = next(
            t for t in (25, 20, 15, 10, 5, 4, 3, 2, 1)
            if n_kap % t == 0 and C_pre * t <= 200
        )
    assert n_kap % kap_tile == 0, (n_kap, kap_tile)

    if vec_kt is None:
        # v5 per-kt loop is the default: the vectorized-kt v6 variant
        # measured 1.4-2.3x slower on hardware (docs/kernel_design.md
        # "Negative result"; tools/probe_vec_kt.py)
        vec_kt = False
    g0, o, r = _window_anchors(inputs)
    o128 = (o // 128) * 128
    phase = o - o128

    cboc = "cboc_ab" in inputs
    ab = (
        inputs["cboc_ab"].astype(jnp.float32)
        if cboc
        else jnp.zeros((2,), jnp.float32)
    )
    use_gain = "chan_gain" in inputs
    gain = (
        inputs["chan_gain"].astype(jnp.float32)
        if use_gain
        else jnp.ones((B, C), jnp.float32)
    )

    sspec = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    out_spec = pl.BlockSpec(
        (1, ROWS * kap_tile, P_PAD), lambda b, kap: (b, kap, 0),
        memory_space=pltpu.VMEM,
    )
    if emit == "i32pack":
        out_specs = out_spec
        out_shape = jax.ShapeDtypeStruct((B, n_k, P_PAD), jnp.int32)
    else:
        out_dtype = jnp.int16 if emit == "int16" else jnp.float32
        out_specs = (out_spec, out_spec)
        out_shape = (
            jax.ShapeDtypeStruct((B, n_k, P_PAD), out_dtype),
            jax.ShapeDtypeStruct((B, n_k, P_PAD), out_dtype),
        )
    f32 = lambda k: inputs[k].astype(jnp.float32)  # noqa: E731
    outs = pl.pallas_call(
        functools.partial(
            _kernel_v5, C=C, kap_tile=kap_tile, emit=emit,
            cboc=cboc, use_gain=use_gain, vec_kt=vec_kt,
            sections=_sections,
        ),
        grid=(B, n_kap // kap_tile),
        in_specs=[sspec()] * 14 + [
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((C, _PL_ROWS, P_PAD), jnp.float32),
            pltpu.VMEM((C, W_RS, W_WIN), jnp.int8),
            pltpu.SemaphoreType.DMA((C,)),
        ],
        # the vectorized-kt main loop's whole-tile temporaries exceed
        # the 16 MB default scoped-VMEM stack at large kap_tile; the
        # v5e has far more physical VMEM, so raise the limit for it
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
            if (vec_kt and not interpret)
            else None
        ),
        interpret=interpret,
    )(
        f32("cp0"), f32("two_a"), f32("mu"), g0.astype(jnp.float32),
        o128.astype(jnp.int32), phase.astype(jnp.int32),
        r.astype(jnp.float32), f32("carr0"), f32("fc"), f32("fc_k"),
        _pack_pm1_bits(inputs["sym_win"]),
        _pack_pm1_bits(inputs["pilot_win"]), ab, gain,
        inputs["vpack_rs"],
    )

    if emit == "i32pack":
        # lane-ALIGNED crop only (each (b, k) row keeps its tile
        # alignment); the flatten to the byte stream is a free host
        # .view(int16) — packed_to_iq16
        return outs[:, :, :P_GRID]
    out_i, out_q = outs
    iq = jnp.stack([out_i[:, :, :P_GRID], out_q[:, :, :P_GRID]], axis=-1)
    if emit == "int16":
        return iq.reshape(B, 2 * n_k * P_GRID)
    return iq.reshape(B, n_k * P_GRID, 2)
