"""I/O layer tests: sinks, streaming executor, UDP side-channels
(reference: src/fifo.cpp, src/main.cpp:55-127, include/socket.h)."""

import socket
import struct
import time

import numpy as np
import pytest

from galileo_sdr_sim_tpu.io.sinks import FileSink, NullSink, UdpSink
from galileo_sdr_sim_tpu.io.stream import StreamingSynthesizer
from galileo_sdr_sim_tpu.io.udp import LiveState, UdpServers
from galileo_sdr_sim_tpu.scenario import PositionProvider, ScenarioEngine

NS = 8192
TILE = 512


def test_file_sink(tmp_path):
    path = tmp_path / "out.ishort"
    data = np.arange(-8, 8, dtype=np.int16)
    with FileSink(path) as sink:
        sink.write(data)
        sink.write(data)
    back = np.fromfile(path, dtype=np.int16)
    assert np.array_equal(back, np.tile(data, 2))


def test_streaming_synthesizer(nav, g0):
    eng = ScenarioEngine(
        nav, PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0, duration_s=0.5,
    )
    sink = NullSink()
    synth = StreamingSynthesizer(
        eng, sink, mode="lut512", tile=TILE, block_epochs=2, nsamples=NS
    )
    stats = synth.run()
    assert stats.epochs == 4
    assert sink.samples == 4 * NS
    assert stats.samples == 4 * NS


def test_streaming_matches_direct(nav, g0):
    """Streamed (padded, code-cached) output == direct per-batch synth."""
    from galileo_sdr_sim_tpu.ops.synth import prepare_device_inputs, synth_block

    def mk_engine():
        return ScenarioEngine(
            nav, PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
            g0, duration_s=0.5,
        )

    chunks = []

    class Collect(NullSink):
        def write(self, iq):
            super().write(iq)
            chunks.append(np.array(iq))

    synth = StreamingSynthesizer(
        mk_engine(), Collect(), mode="lut512", tile=TILE, block_epochs=3,
        nsamples=NS,
    )
    synth.run()
    streamed = np.concatenate([c.reshape(-1) for c in chunks])

    direct = []
    for batch in mk_engine().batches(1):
        inp = prepare_device_inputs(batch, TILE, NS)
        out = np.asarray(synth_block(inp, tile=TILE, mode="lut512"))
        direct.append(out[:, : 2 * NS].reshape(-1))
    direct = np.concatenate(direct)
    assert np.array_equal(streamed, direct)


def test_udp_sink_and_servers(unused_tcp_port_factory=None):
    # pick free ports
    def free_port():
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    ports = (free_port(), free_port(), free_port())
    servers = UdpServers(np.array([1.0, 2.0, 3.0]), ports=ports).start()
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        vals = [31.0, 30.0, 52.0, 0.0, 0.0, 0.0, 0.0, 0.0, 123456.0]
        deadline = time.time() + 10
        while time.time() < deadline:
            # retry sends until all three listeners have bound and consumed
            if servers.state.llh[0] != 42.0:
                # position update (wire format of coord_update_cli.py)
                tx.sendto(struct.pack("<3d", 42.0, -71.0, 50.0),
                          ("127.0.0.1", ports[0]))
            if servers.state.tow_correction is None:
                # bit relay datagram: 8 channels of prn*10+bit, then TOW ms
                tx.sendto(struct.pack("<9d", *vals), ("127.0.0.1", ports[1]))
            if servers.state.dynamic_dt != 0.25:
                tx.sendto(struct.pack("<d", 0.25), ("127.0.0.1", ports[2]))
            if (
                servers.state.llh[0] == 42.0
                and servers.state.tow_correction is not None
                and servers.state.dynamic_dt == 0.25
            ):
                break
            time.sleep(0.1)
        assert np.allclose(servers.state.llh, [42.0, -71.0, 50.0])
        assert servers.state.tow_correction == pytest.approx(123.456)
        assert servers.state.dynamic_dt == 0.25
        assert servers.state.pop_bits(3, 2) == [1, -1]  # bit 1 -> +1, 0 -> -1
        assert servers.state.pop_bits(5, 1) == [0]  # wire bit 2 -> 0
    finally:
        servers.stop()


def test_udp_sink_chunks():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]
    sink = UdpSink("127.0.0.1", port, samples_per_packet=64)
    data = np.arange(200, dtype=np.int16)  # 100 samples -> 2 packets
    sink.write(data)
    pkt1, _ = rx.recvfrom(65536)
    pkt2, _ = rx.recvfrom(65536)
    got = np.frombuffer(pkt1 + pkt2, dtype=np.int16)
    assert np.array_equal(got, data)
    sink.close()
    rx.close()


def test_live_state_queues_bounded():
    st = LiveState(np.zeros(3))
    for i in range(5000):
        st.push_bits(4, 1)
    assert len(st.bit_queues[4]) == 4096  # bounded
    assert st.pop_bits(99, 10) == []  # unknown prn -> empty


def test_mu_envelope_fallback_is_per_epoch(nav, g0, monkeypatch):
    """A block with an out-of-envelope code-Doppler epoch (teleport /
    reallocation transition) falls back to the direct engine ONE EPOCH
    AT A TIME: a full-B direct graph on a CPU host allocates ~5 GB of
    gather buffers (it blew the 600 s soak's peak RSS to 5.7 GB), while
    B=1 slices stay ~0.1 GB.  Asserts every direct call in the fallback
    ran at B=1 and that the streamed output equals per-epoch direct
    synthesis of the same (corrupted) batches."""
    from galileo_sdr_sim_tpu.io import stream as stream_mod
    from galileo_sdr_sim_tpu.ops.synth import prepare_device_inputs

    NSK = 10400  # kp engines need whole (8 x 1300)-sample row cycles

    def corrupt(batches):
        out = []
        for i, b in enumerate(batches):
            if i == 1:  # second block: one mega-Doppler epoch
                b.f_code[0, 0] = 1023000.0 + 10.0  # mu = 0.01 > MU_MAX
            out.append(b)
        return out

    def mk_batches():
        eng = ScenarioEngine(
            nav, PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
            g0, duration_s=0.6,
        )
        return corrupt(list(eng.batches(2)))

    batches = mk_batches()

    class FakeEngine:
        model = type("M", (), {"code_subdiv": 2})()

        def batches(self, n, start=1):
            yield from batches

    seen_B = []
    real_synth_block = stream_mod.synth_block

    def spy(inputs, tile, mode):
        seen_B.append(inputs["cp_base"].shape[0])
        return real_synth_block(inputs, tile=tile, mode=mode)

    monkeypatch.setattr(stream_mod, "synth_block", spy)

    chunks = []

    class Collect(NullSink):
        def write(self, iq):
            super().write(iq)
            chunks.append(np.array(iq))

    synth = StreamingSynthesizer(
        FakeEngine(), Collect(), synth_engine="kp", block_epochs=2,
        nsamples=NSK, tile=TILE,
    )
    stats = synth.run()
    assert stats.epochs == 5  # 0.6 s -> 5 yielded epochs (ref timing)
    assert seen_B and all(b == 1 for b in seen_B), seen_B
    assert len(seen_B) == 2  # only the corrupted block fell back

    streamed = np.concatenate([c.reshape(-1) for c in chunks])
    direct = []
    for batch in mk_batches():
        for e in range(batch.f_code.shape[0]):
            sl = stream_mod._slice_epoch(batch, e)
            inp = prepare_device_inputs(sl, TILE, NSK, pad_epochs=1)
            out = np.asarray(real_synth_block(inp, tile=TILE, mode="float"))
            direct.append(out[:, : 2 * NSK].reshape(-1))
    direct = np.concatenate(direct)
    # the in-envelope blocks ran on the kp engine (timing-ULP tolerance
    # vs direct); the fallback block must match direct exactly
    n_blk = 2 * 2 * NSK  # samples*2 per 2-epoch block
    assert np.array_equal(streamed[n_blk : 2 * n_blk], direct[n_blk : 2 * n_blk])
    match = (streamed == direct).mean()
    assert match > 0.99, match


def test_pipeline_depth_preserves_order_and_output(nav, g0):
    """The producer-thread pipeline (input-side double buffer): any
    pipeline_depth yields the byte-identical stream in order, and a slow
    sink exerts backpressure (bounded in-flight blocks) without loss."""
    import time as _time

    def mk_engine():
        return ScenarioEngine(
            nav, PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
            g0, duration_s=0.9,
        )

    def run(depth, slow=False):
        chunks = []

        class Collect(NullSink):
            def write(self, iq):
                if slow:
                    _time.sleep(0.03)
                super().write(iq)
                chunks.append(np.array(iq))

        synth = StreamingSynthesizer(
            mk_engine(), Collect(), mode="lut512", tile=TILE,
            block_epochs=2, nsamples=NS, pipeline_depth=depth,
        )
        synth.run()
        return np.concatenate([c.reshape(-1) for c in chunks])

    base = run(1)
    assert np.array_equal(base, run(4))
    assert np.array_equal(base, run(3, slow=True))


def test_pipeline_stop_terminates_promptly(nav, g0):
    """stop() from the sink callback ends the threaded run without
    draining the whole scenario."""
    eng = ScenarioEngine(
        nav, PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
        g0, duration_s=5.0,
    )
    sink = NullSink()
    synth = StreamingSynthesizer(
        eng, sink, mode="lut512", tile=TILE, block_epochs=2, nsamples=NS,
        pipeline_depth=2,
    )

    writes = []
    orig = sink.write

    def write(iq):
        orig(iq)
        writes.append(1)
        if len(writes) == 2:
            synth.stop()

    sink.write = write
    stats = synth.run()
    assert 2 <= len(writes) <= 3  # stopped after the 2nd block
    assert stats.epochs < 49


def test_device_resident_drain(nav, g0):
    """drain_host=False hands device arrays to the sink (no D2H sample
    fetch); a checksum-style sink must see the same totals as a host
    drain."""
    import jax.numpy as jnp

    def mk_engine():
        return ScenarioEngine(
            nav, PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
            g0, duration_s=0.5,
        )

    class DevSink(NullSink):
        def __init__(self):
            super().__init__()
            self.totals = []

        def write(self, blk):
            assert not isinstance(blk, np.ndarray), "device array expected"
            self.totals.append(float(jnp.sum(jnp.abs(blk.astype(jnp.int32)))))
            self.samples += blk.shape[0] * blk.shape[1] // 2

    dsink = DevSink()
    StreamingSynthesizer(
        mk_engine(), dsink, mode="lut512", tile=TILE, block_epochs=2,
        nsamples=NS, drain_host=False,
    ).run()

    chunks = []

    class Collect(NullSink):
        def write(self, iq):
            super().write(iq)
            chunks.append(np.abs(np.array(iq, np.int32)).sum())

    StreamingSynthesizer(
        mk_engine(), Collect(), mode="lut512", tile=TILE, block_epochs=2,
        nsamples=NS,
    ).run()
    assert len(dsink.totals) == len(chunks)
    assert [int(t) for t in dsink.totals] == [int(c) for c in chunks]


def test_pipeline_equality_across_reallocation(nav, g0):
    """Threaded (depth 4) vs serial (depth 1) streams must stay
    byte-identical across the 30 s ephemeris-refresh/reallocation
    boundary and the page rollovers inside it (producer-thread scenario
    stepping must not reorder or double-step engine state)."""
    def run(depth):
        chunks = []

        class Collect(NullSink):
            def write(self, iq):
                super().write(iq)
                chunks.append(np.array(iq))

        eng = ScenarioEngine(
            nav, PositionProvider(llh_deg=np.array([42.3601, -71.0589, 100.0])),
            g0, duration_s=31.0,
        )
        StreamingSynthesizer(
            eng, Collect(), mode="lut512", tile=TILE, block_epochs=8,
            nsamples=2600, pipeline_depth=depth,
        ).run()
        return np.concatenate([c.reshape(-1) for c in chunks])

    a = run(1)
    b = run(4)
    assert a.size == 309 * 2 * 2600
    assert np.array_equal(a, b)
