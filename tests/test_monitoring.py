"""Monitoring-bridge loop test: GNSS-SDR Monitor protobuf -> monitoring
client -> UDP 7531 relay -> simulator bit queues.

Closes the full live-relay ("real-time navigation message relay",
reference README.md:6) chain in-process: a synthetic `Observables`
datagram exactly like GNSS-SDR's Monitor output is parsed by the client
(reference: monitoring-client/gnss_synchro_udp_source.cc), re-encoded as
the 9-double wire format and delivered into the simulator's LiveState,
where the engine's page generator consumes it (tests/test_bit_relay.py).
"""

import socket
import time

import numpy as np
import pytest

from galileo_sdr_sim_tpu.io.udp import UdpServers
from galileo_sdr_sim_tpu.monitoring import gnss_synchro_pb2
from galileo_sdr_sim_tpu.monitoring.client import MonitoringClient

STATIC = np.array([42.3601, -71.0589, 100.0])


def _observables(entries, tow_ms):
    """entries = [(channel_id, prn, nav_symbol)]"""
    obs = gnss_synchro_pb2.Observables()
    for channel_id, prn, sym in entries:
        ch = obs.observable.add()
        ch.channel_id = channel_id
        ch.prn = prn
        ch.nav_symbol = sym
        ch.fs = 2600000
        ch.tow_at_current_symbol_ms = tow_ms
        ch.cn0_db_hz = 45.0
        ch.carrier_doppler_hz = 1000.0
    return obs.SerializeToString()


def test_monitor_to_simulator_loop(tmp_path):
    relay_ports = (27533, 27531, 27532)
    servers = UdpServers(STATIC, ports=relay_ports).start()
    client = MonitoringClient(
        listen_port=21234,
        relay_port=relay_ports[1],
        record_path=str(tmp_path / "rx_bits.dat"),
        display=False,
    )
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        # two TOW epochs: symbol flips on channel 0
        tx.sendto(_observables([(0, 11, 1), (1, 24, -1)], 1000),
                  ("127.0.0.1", 21234))
        assert client.step(timeout=5.0)
        tx.sendto(_observables([(0, 11, -1), (1, 24, -1)], 1004),
                  ("127.0.0.1", 21234))
        assert client.step(timeout=5.0)
        tx.close()

        deadline = time.monotonic() + 5.0
        while time.monotonic() < deadline:
            if len(servers.state.bit_queues.get(11, [])) >= 2:
                break
            time.sleep(0.05)
        # wire mapping: nav_symbol>0 -> bit 1 -> +1; else bit 0 -> -1
        assert servers.state.pop_bits(11, 4) == [1, -1]
        assert servers.state.pop_bits(24, 4) == [-1, -1]
        # one-shot TOW from the first relay datagram, in seconds
        assert servers.state.tow_correction == pytest.approx(1.0)
        # record file holds both 9-double datagrams
        assert (tmp_path / "rx_bits.dat").stat().st_size == 2 * 9 * 8
    finally:
        client.close()
        servers.stop()


def test_invalid_datagram_rejected():
    client = MonitoringClient(listen_port=21235, relay_port=27531,
                              record_path=None, display=False)
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        tx.sendto(b"\xff\xfe\x01garbage", ("127.0.0.1", 21235))
        tx.close()
        assert client.step(timeout=5.0) is False
    finally:
        client.close()
