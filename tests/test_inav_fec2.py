"""FEC2 Reed-Solomon CED words 17-20 (beyond the reference, which emits
dummy 63 in those schedule slots — reference src/inav-msg.cpp:377-384).

The ICD v2.0 FEC2 annex is not retrievable in this environment (zero
egress) and no tv/ capture contains FEC2 words, so — like word 16 —
correctness is pinned by construction + round trip: the RS(118, 58)
codeword must survive arbitrary <= 60-position erasures, and a receiver
must reconstruct the EXACT quantized CED from modulated pages with CED
words missing (the feature's whole point: TTFF under erasures)."""

import numpy as np
import pytest

from galileo_sdr_sim_tpu.fec2 import (
    K_INFO,
    N_CODE,
    N_PARITY,
    ced_info_octets,
    codeword_from_words,
    info_octets_to_ced,
    rs_decode_erasures,
    rs_encode,
)
from galileo_sdr_sim_tpu.gnss_time import GalTime
from galileo_sdr_sim_tpu.inav import (
    AlmanacContext,
    ced_raw_fields,
    fec2_parity_octets,
    generate_inav_page,
    generate_page_pair,
    word_type_for,
)
from galileo_sdr_sim_tpu.rx import decode_page_pair
from galileo_sdr_sim_tpu.rx_pvt import (
    assemble_ephemeris,
    page_content,
    parse_word,
    reconstruct_ced_fec2,
)


def _eph(nav, grx, n=1):
    out = []
    for sv in range(36):
        i = nav.epoch_match(sv, grx)
        if i >= 0:
            out.append(nav.eph[sv][i])
            if len(out) == n:
                break
    return out if n > 1 else out[0]


def test_rs_round_trip_random_erasures():
    rng = np.random.default_rng(7)
    info = rng.integers(0, 256, K_INFO).astype(np.uint8)
    cw = rs_encode(info)
    for _ in range(20):
        k = int(rng.integers(1, N_PARITY + 1))
        pos = rng.choice(N_CODE, size=k, replace=False)
        corrupted = cw.copy()
        corrupted[pos] = rng.integers(0, 256, k)
        assert np.array_equal(rs_decode_erasures(corrupted, list(pos)), cw)
    # every information octet erased: parity alone reconstructs the CED
    corrupted = cw.copy()
    corrupted[:K_INFO] = 0
    assert np.array_equal(
        rs_decode_erasures(corrupted, list(range(K_INFO))), cw
    )
    with pytest.raises(ValueError):
        rs_decode_erasures(cw, list(range(N_PARITY + 1)))
    bad = cw.copy()
    bad[100] ^= 0x55
    with pytest.raises(ValueError):
        rs_decode_erasures(bad, [3])


def test_info_octets_round_trip(nav, g0):
    eph = _eph(nav, g0)
    o = ced_info_octets(eph.svid, eph.iode, ced_raw_fields(eph))
    svid, iod, fields = info_octets_to_ced(o)
    assert svid == eph.svid and iod == eph.iode
    assert fields == {
        k: v & ((1 << dict(
            __import__("galileo_sdr_sim_tpu.fec2", fromlist=["CED_FIELDS"])
            .CED_FIELDS)[k]) - 1)
        for k, v in ced_raw_fields(eph).items()
    }


def test_no_dummy_slots_in_nominal_schedule(nav, g0):
    """Real-data mode: every slot of a 60 s period carries a real word
    (the last dummy-63 slots, 17/19, now emit FEC2 parity; 18/20 ride
    the alternate sub-frame), and all four FEC2 words appear."""
    eph = _eph(nav, g0)
    alm = AlmanacContext(nav).for_time(g0)
    base = float(int(g0.sec) // 60 * 60)
    seen = set()
    for sec in range(0, 60, 2):
        g = GalTime(g0.week, base + sec)
        page = generate_inav_page(g, eph, nav.iono, almanac=alm)
        dec = decode_page_pair(page)
        assert dec.crc_ok, sec
        assert dec.word_type != 63, f"dummy word at schedule second {sec}"
        seen.add(dec.word_type)
    assert {17, 18, 19, 20} <= seen, seen


def test_parity_switch_keeps_reference_dummies(nav, g0):
    """Without real-data mode (dummy_almanac parity), the 17/19 slots
    still emit dummy 63 exactly like the reference."""
    eph = _eph(nav, g0)
    base = float(int(g0.sec) // 60 * 60)
    for sec in (10, 12, 40, 42):  # the 17/19 slots of both sub-frames
        g = GalTime(g0.week, base + sec)
        assert word_type_for(g.sec) in (17, 19)
        page = generate_inav_page(g, eph, nav.iono, almanac=None)
        dec = decode_page_pair(page)
        assert dec.crc_ok and dec.word_type == 63


def _contents_for(nav, g0, eph, word_types):
    alm = AlmanacContext(nav).for_time(g0)
    contents = {}
    for wt in word_types:
        even, odd = generate_page_pair(g0, eph, nav.iono, wt, almanac=alm)
        page = np.concatenate([even[:114], odd[:114]])
        # writer stream = even[:114] ++ odd[2:114] (page_content inverse)
        from galileo_sdr_sim_tpu.rx import DecodedPage

        dp = DecodedPage(even=even, odd=odd, page=page,
                         word_type=wt, crc_ok=True, ssp=0)
        parsed = parse_word(page_content(dp))
        assert parsed["word_type"] == wt
        contents[wt] = page_content(dp)
    return contents


def test_reconstruct_ced_with_lost_words(nav, g0):
    """The receiver-side payoff, full chain: CED words 3 and 4 never
    received; the RS erasure decoder reconstructs the ephemeris from
    words 1, 2 + the four FEC2 words, EXACTLY equal (bit-level
    quantized fields) to the ephemeris assembled from all four CED
    words."""
    for eph in _eph(nav, g0, n=4):
        full = _contents_for(nav, g0, eph, [1, 2, 3, 4, 17, 18, 19, 20])
        direct_words = {
            wt: parse_word(full[wt]) for wt in (1, 2, 3, 4)
        }
        truth = assemble_ephemeris(direct_words, g0.week, eph.svid)

        lost34 = {wt: full[wt] for wt in (1, 2, 17, 18, 19, 20)}
        rec = reconstruct_ced_fec2(lost34, g0.week)
        for f in ("svid", "iode", "m0", "ecc", "sqrta", "omg0", "inc0",
                  "aop", "idot", "omgdot", "deltan", "cuc", "cus", "crc",
                  "crs", "cic", "cis", "af0", "af1", "af2"):
            assert getattr(rec, f) == getattr(truth, f), (f, eph.svid)
        assert rec.toe.sec == truth.toe.sec
        assert rec.toc.sec == truth.toc.sec


def test_reconstruct_ced_parity_only_plus_two(nav, g0):
    """Harsher erasure patterns: with all four parity words present,
    even the complete loss of ALL CED words is recoverable (58 erasures
    <= 60 checks); past the limit — three CED words AND two parity
    words lost (~72 erasures) — must raise, not hallucinate."""
    eph = _eph(nav, g0)
    full = _contents_for(nav, g0, eph, [1, 2, 3, 4, 17, 18, 19, 20])
    direct_words = {wt: parse_word(full[wt]) for wt in (1, 2, 3, 4)}
    truth = assemble_ephemeris(direct_words, g0.week, eph.svid)

    rec = reconstruct_ced_fec2(
        {wt: full[wt] for wt in (17, 18, 19, 20)}, g0.week
    )
    assert rec.m0 == truth.m0 and rec.af0 == truth.af0
    assert rec.svid == truth.svid

    with pytest.raises(ValueError):
        reconstruct_ced_fec2(
            {wt: full[wt] for wt in (2, 17, 18)}, g0.week
        )


def test_codeword_from_words_matches_encoder(nav, g0):
    """The info octets recovered from the transmitted word bits equal
    the encoder's ced_info_octets — the RS information really is
    bit-consistent with the CED words on air."""
    eph = _eph(nav, g0)
    full = _contents_for(nav, g0, eph, [1, 2, 3, 4, 17, 18, 19, 20])
    code, erased = codeword_from_words(full)
    assert erased == []
    info = ced_info_octets(eph.svid, eph.iode, ced_raw_fields(eph))
    assert np.array_equal(code[:K_INFO], info)
    assert np.array_equal(
        code[K_INFO:], fec2_parity_octets(eph).reshape(-1)
    )
    # and the assembled codeword is a valid RS codeword
    rs_decode_erasures(code, [])


def test_rs_errors_and_erasures_decoding():
    """Full errors-AND-erasures decoding (Berlekamp-Massey + Chien +
    Forney): any pattern with 2t + e <= 60 corrects exactly; beyond
    capacity the decoder raises rather than miscorrecting."""
    from galileo_sdr_sim_tpu.fec2 import rs_decode

    rng = np.random.default_rng(3)
    info = rng.integers(0, 256, K_INFO).astype(np.uint8)
    cw = rs_encode(info)

    def corrupt(x, pos, rng):
        for p in pos:
            v = x[p]
            while x[p] == v:
                x[p] = rng.integers(0, 256)

    for t in (1, 5, 17, 30):  # unknown-position errors only
        bad = cw.copy()
        corrupt(bad, rng.choice(N_CODE, size=t, replace=False), rng)
        assert np.array_equal(rs_decode(bad), cw), t

    for e, t in ((10, 25), (40, 10), (58, 1), (20, 20)):  # mixed
        bad = cw.copy()
        pos = rng.choice(N_CODE, size=e + t, replace=False)
        era, err = pos[:e], pos[e:]
        bad[era] = rng.integers(0, 256, e)
        corrupt(bad, err, rng)
        assert np.array_equal(rs_decode(bad, list(era)), cw), (e, t)

    for seed in range(3):  # t = 31: 2t > 60, must not silently pass
        r2 = np.random.default_rng(100 + seed)
        bad = cw.copy()
        corrupt(bad, r2.choice(N_CODE, size=31, replace=False), r2)
        with pytest.raises(ValueError):
            rs_decode(bad)
