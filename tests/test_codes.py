"""Code-table layer tests (reference: src/gal-sig.cpp:9-233)."""

import numpy as np

from galileo_sdr_sim_tpu import codes


def test_primary_shapes_and_values():
    for comp in ("E1B", "E1C"):
        chips = codes.primary_chips(comp)
        assert chips.shape == (50, 4092)
        assert set(np.unique(chips)) <= {-1, 1}


def test_hex_decode_convention():
    # PRN 1 E1B begins "F5D7..." -> F = 1111 -> chips -1,-1,-1,-1;
    # 5 = 0101 -> +1,-1,+1,-1 (bit 0 -> +1, bit 1 -> -1).
    c = codes.primary_chips("E1B")[0]
    assert list(c[:8]) == [-1, -1, -1, -1, 1, -1, 1, -1]


def test_boc_expansion():
    for comp in ("E1B", "E1C"):
        chips = codes.primary_chips(comp)
        boc = codes.boc_chips(comp)
        assert boc.shape == (50, 8184)
        # each chip becomes the half-chip pair (-c, +c) (sboc, gal-sig.cpp:198)
        assert np.array_equal(boc[:, 0::2], -chips)
        assert np.array_equal(boc[:, 1::2], chips)


def test_codes_are_balanced_and_distinct():
    chips = codes.primary_chips("E1B")
    # memory codes are roughly balanced
    assert np.all(np.abs(chips.sum(axis=1)) < 200)
    # distinct PRNs have low cross-correlation at zero lag
    x = chips.astype(np.int32)
    gram = x @ x.T
    off = gram - np.diag(np.diag(gram))
    assert np.all(np.abs(off) < 500)
    assert np.all(np.diag(gram) == 4092)


def test_secondary_code():
    sec = codes.secondary_code()
    assert sec.shape == (25,)
    # bit pattern 0011100000001010110110010 with 1 -> -1 mapping
    bits = (sec == -1).astype(int)
    assert "".join(map(str, bits)) == "0011100000001010110110010"


def test_sync_pattern():
    assert "".join(map(str, codes.sync_pattern())) == "0101100000"


def test_carrier_lut_symmetry():
    cos512, sin512 = codes.carrier_lut()
    assert cos512.shape == sin512.shape == (512,)
    assert cos512.max() == 250 and cos512.min() == -250
    # quarter-wave relation between the tables
    assert np.array_equal(sin512[:256], -cos512[128:384])


def test_crc24q_vs_bit_serial():
    """Table-driven CRC24Q equals an independent bit-serial computation
    (poly 0x1864CFB, zero init, MSB-first) on random bit lengths, including
    the non-byte-aligned 196-bit I/NAV span."""
    from galileo_sdr_sim_tpu.inav import crc24q

    def bit_serial(bits):
        crc = 0
        for b in bits:
            top = (crc >> 23) & 1
            crc = (crc << 1) & 0xFFFFFF
            if top ^ int(b):
                crc ^= 0x864CFB
        return crc

    rng = np.random.default_rng(7)
    for n in (8, 24, 100, 196, 200, 1000):
        bits = rng.integers(0, 2, n).astype(np.uint8)
        assert crc24q(bits) == bit_serial(bits), n
