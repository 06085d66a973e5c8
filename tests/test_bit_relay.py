"""Live navigation-bit relay tests (reference: include/socket.h:84-150,
src/galileo-sdr.cpp:389-416,599-616, monitoring-client bridge).

The reference fills per-channel queues from UDP 7531 but never drains them
in the hot loop; our build completes the advertised feature: relayed
symbols replace synthesized I/NAV pages, and the one-shot TOW correction
shifts grx on first reception.
"""

import socket
import struct
import time

import numpy as np
import pytest

from galileo_sdr_sim_tpu.constants import EPOCH_DT, N_SYM_PAGE
from galileo_sdr_sim_tpu.io.udp import (
    INCOMING_SIZE,
    LiveState,
    UdpServers,
    _on_bits,
)
from galileo_sdr_sim_tpu.scenario import PositionProvider, ScenarioEngine

STATIC = np.array([42.3601, -71.0589, 100.0])


def _datagram(pairs, tow_ms=0.0):
    """pairs = [(prn, bit), ...] padded to 8 slots; 9th double = TOW ms."""
    vals = [float(prn * 10 + bit) for prn, bit in pairs]
    vals += [0.0] * (INCOMING_SIZE - 1 - len(vals))
    vals.append(tow_ms)
    return struct.pack(f"<{INCOMING_SIZE}d", *vals)


def test_wire_decode_and_one_shot_tow():
    st = LiveState(STATIC)
    _on_bits(st, _datagram([(11, 1), (12, 0), (13, 5)], tow_ms=2500.0))
    # 1 -> +1, 0 -> -1, other -> 0 (socket.h:127-133)
    assert st.pop_bits(11, 10) == [1]
    assert st.pop_bits(12, 10) == [-1]
    assert st.pop_bits(13, 10) == [0]
    assert st.tow_correction == pytest.approx(2.5)
    # TOW is one-shot: later datagrams must not overwrite (socket.h:140-147)
    _on_bits(st, _datagram([(11, 1)], tow_ms=9000.0))
    assert st.tow_correction == pytest.approx(2.5)


def test_relayed_page_replaces_synthesized(nav, g0):
    from galileo_sdr_sim_tpu.channels import regenerate_page

    eng = ScenarioEngine(
        nav, PositionProvider(llh_deg=STATIC), g0, duration_s=0.5
    )
    chan = next(c for c in eng.bank.channels if c.prn > 0)
    st = LiveState(STATIC)
    want = np.tile([1, -1], N_SYM_PAGE // 2)
    for v in want:
        st.push_bits(chan.prn, 1 if v == 1 else 0)
    regenerate_page(chan, eng.grx, nav, st)
    np.testing.assert_array_equal(chan.page, (want == 1).astype(chan.page.dtype))
    # queue drained
    assert st.pop_bits(chan.prn, 1) == []


def test_relay_underrun_backfills_from_ephemeris(nav, g0):
    from galileo_sdr_sim_tpu.channels import regenerate_page

    eng = ScenarioEngine(
        nav, PositionProvider(llh_deg=STATIC), g0, duration_s=0.5
    )
    chan = next(c for c in eng.bank.channels if c.prn > 0)

    # synthesized page for the same epoch = expected tail
    ref = ScenarioEngine(
        nav, PositionProvider(llh_deg=STATIC), g0, duration_s=0.5
    )
    rchan = next(c for c in ref.bank.channels if c.prn == chan.prn)
    regenerate_page(rchan, ref.grx, nav)

    st = LiveState(STATIC)
    for _ in range(100):
        st.push_bits(chan.prn, 1)
    regenerate_page(chan, eng.grx, nav, st)
    np.testing.assert_array_equal(chan.page[:100], np.ones(100, chan.page.dtype))
    np.testing.assert_array_equal(chan.page[100:], rchan.page[100:])


def test_engine_applies_tow_once(nav, g0):
    st = LiveState(STATIC)
    st.tow_correction = 2.0
    eng = ScenarioEngine(
        nav, PositionProvider(llh_deg=STATIC), g0, duration_s=1.0,
        bit_source=st,
    )
    it = eng.epochs()
    tab = next(it)
    # first epoch: grx was g0 + 2 dt, shifted by +2 s
    assert tab.grx_sec == pytest.approx(g0.sec + 2 * EPOCH_DT + 2.0)
    st.tow_correction = 99.0  # must not re-apply
    tab2 = next(it)
    assert tab2.grx_sec == pytest.approx(tab.grx_sec + EPOCH_DT)


def test_udp_server_roundtrip():
    # ephemeral ports to avoid collisions with a real run
    ports = (17533, 17531, 17532)
    servers = UdpServers(STATIC, ports=ports).start()
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        tx.sendto(_datagram([(7, 1), (9, 0)], tow_ms=1200.0),
                  ("127.0.0.1", ports[1]))
        tx.sendto(struct.pack("<3d", 10.0, 20.0, 30.0), ("127.0.0.1", ports[0]))
        tx.close()
        deadline = time.monotonic() + 5.0
        while time.monotonic() < deadline:
            if servers.state.bit_queues and servers.state.llh[0] == 10.0:
                break
            time.sleep(0.05)
        assert servers.state.pop_bits(7, 5) == [1]
        assert servers.state.pop_bits(9, 5) == [-1]
        assert servers.state.tow_correction == pytest.approx(1.2)
        np.testing.assert_allclose(servers.state.llh, [10.0, 20.0, 30.0])
    finally:
        servers.stop()
