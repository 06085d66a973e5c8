"""Time-system tests (reference: src/gnss-time.cpp)."""

from galileo_sdr_sim_tpu.gnss_time import DateTime, GalTime, date2gal, gal2date


def test_known_epoch():
    # 2022-02-20 is a Sunday in GPS week 2198.
    g = date2gal(DateTime(2022, 2, 20, 8, 0, 1.0))
    assert g.week == 2198
    assert g.sec == 8 * 3600 + 1


def test_gps_epoch_origin():
    g = date2gal(DateTime(1980, 1, 6, 0, 0, 0.0))
    assert g.week == 0 and g.sec == 0.0


def test_roundtrip():
    for y, m, d, hh, mm, ss in [
        (2020, 12, 15, 10, 0, 1.0),
        (2022, 2, 20, 23, 59, 59.0),
        (2024, 2, 29, 12, 30, 30.0),  # leap day
        (1999, 8, 22, 0, 0, 0.0),
    ]:
        g = date2gal(DateTime(y, m, d, hh, mm, ss))
        t = gal2date(g)
        assert (t.y, t.m, t.d, t.hh, t.mm) == (y, m, d, hh, mm)
        assert abs(t.sec - ss) < 1e-9


def test_arithmetic():
    g = GalTime(2198, 100.0)
    g2 = g + 0.5
    assert g2.sec == 100.5 and g2.week == 2198
    assert (g2 - g) == 0.5
    assert (GalTime(2199, 0.0) - GalTime(2198, 0.0)) == 604800.0
