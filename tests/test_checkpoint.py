"""Checkpoint/resume tests: a resumed run must produce the identical
state trajectory (the reference cannot resume at all — SURVEY §5)."""

import numpy as np

from galileo_sdr_sim_tpu.checkpoint import load_state, save_state
from galileo_sdr_sim_tpu.scenario import PositionProvider, ScenarioEngine

STATIC = np.array([42.3601, -71.0589, 100.0])


def _mk(nav, g0, duration=1.5):
    return ScenarioEngine(
        nav, PositionProvider(llh_deg=STATIC), g0, duration_s=duration
    )


def test_snapshot_roundtrip(nav, g0, tmp_path):
    eng = _mk(nav, g0)
    gen = eng.epochs()
    tabs_a = [next(gen) for _ in range(6)]
    save_state(eng, tmp_path / "ckpt")

    eng2 = _mk(nav, g0)
    done = load_state(eng2, tmp_path / "ckpt")
    assert done == 6

    rest_a = list(gen)
    rest_b = list(eng2.epochs(start=done + 1))
    assert len(rest_a) == len(rest_b)
    for ta, tb in zip(rest_a, rest_b):
        assert np.array_equal(ta.prn, tb.prn)
        assert np.array_equal(ta.f_carr, tb.f_carr)
        assert np.array_equal(ta.carr_phase0, tb.carr_phase0)
        assert np.array_equal(ta.code_phase0, tb.code_phase0)
        assert np.array_equal(ta.sym_win, tb.sym_win)
        assert np.array_equal(ta.ibit0, tb.ibit0)


def test_streaming_resume(nav, g0, tmp_path):
    from galileo_sdr_sim_tpu.io.sinks import NullSink
    from galileo_sdr_sim_tpu.io.stream import StreamingSynthesizer

    ck = str(tmp_path / "stream_ckpt")
    NS = 10400

    # run the first part, checkpointing every 4 epochs
    s1 = StreamingSynthesizer(
        _mk(nav, g0, 1.0), NullSink(), synth_engine="kp", nsamples=NS,
        block_epochs=2, checkpoint_path=ck, checkpoint_every=4,
    )
    stats1 = s1.run()
    assert stats1.epochs == 9

    # a new run resumes past the last snapshot instead of restarting
    s2 = StreamingSynthesizer(
        _mk(nav, g0, 1.0), NullSink(), synth_engine="kp", nsamples=NS,
        block_epochs=2, checkpoint_path=ck, checkpoint_every=4,
    )
    assert s2._start_epoch > 1
    stats2 = s2.run()
    assert stats2.epochs == 9 - (s2._start_epoch - 1)


def test_pipelined_resume_does_not_skip_inflight_blocks(nav, g0, tmp_path):
    """With a threaded producer running pipeline_depth blocks ahead of
    the sink, a snapshot must record the SINK's position and re-buffer
    the in-flight epochs; crash+resume then replays them instead of
    silently skipping their samples (advisor r4, io/stream.py).  Pinned
    bit-exactly: drained-before-crash + resumed output == one serial
    uninterrupted run."""
    from galileo_sdr_sim_tpu.io.stream import StreamingSynthesizer

    NS = 10400

    from conftest import CollectSink as Collect

    ref_sink = Collect()
    StreamingSynthesizer(
        _mk(nav, g0, 2.0), ref_sink, synth_engine="kp", nsamples=NS,
        block_epochs=2, pipeline_depth=1,
    ).run()
    ref = np.concatenate(ref_sink.blocks)

    # crash mid-run: snapshot every block, sink dies after 3 blocks
    # (6 epochs) while the producer is up to 4 blocks ahead
    ck = str(tmp_path / "pipe_ckpt")
    s1_sink = Collect(stop_after=3)
    s1 = StreamingSynthesizer(
        _mk(nav, g0, 2.0), s1_sink, synth_engine="kp", nsamples=NS,
        block_epochs=2, pipeline_depth=3, checkpoint_path=ck,
        checkpoint_every=2,
    )
    s1_sink.synth = s1
    s1.run()
    drained = sum(b.shape[0] for b in s1_sink.blocks)
    assert drained == 6

    s2_sink = Collect()
    s2 = StreamingSynthesizer(
        _mk(nav, g0, 2.0), s2_sink, synth_engine="kp", nsamples=NS,
        block_epochs=2, pipeline_depth=3, checkpoint_path=ck,
        checkpoint_every=10_000,
    )
    # the old snapshot recorded the PRODUCER's position (epochs ahead of
    # the sink); the fixed one resumes exactly after the drained epochs
    assert s2._start_epoch == drained + 1
    s2.run()
    combined = np.concatenate(s1_sink.blocks + s2_sink.blocks)
    assert combined.shape == ref.shape
    np.testing.assert_array_equal(combined, ref)


def test_live_position_resume_replays_inflight_epochs(nav, g0):
    """The live-position epochs() path must REPLAY pending tabs from a
    rewound snapshot instead of re-stepping those epochs — grx is
    committed past them, so re-stepping would emit wrong-time signal
    and skip the in-flight samples (advisor r5 review finding)."""
    from galileo_sdr_sim_tpu.checkpoint import load_state, save_state
    from galileo_sdr_sim_tpu.scenario import PositionProvider, ScenarioEngine
    import tempfile

    def mk():
        return ScenarioEngine(
            nav,
            PositionProvider(live=lambda: STATIC),  # live source, fixed pos
            g0, duration_s=1.5,
        )

    eng = mk()
    eng._replay_keep = 16
    gen = eng.epochs()
    tabs = [next(gen) for _ in range(8)]  # producer 8 epochs ahead
    ck = tempfile.mktemp()
    save_state(eng, ck, drained_iumd=4)  # sink only received 4

    eng2 = mk()
    done = load_state(eng2, ck)
    assert done == 4
    resumed = list(eng2.epochs(start=done + 1))
    # epochs 5..8 are replayed in-flight tabs: identical to the first
    # run's; epochs 9+ continue live stepping
    assert len(resumed) == len(tabs) - 4 + (len(list(mk().epochs())) - 8)
    for ta, tb in zip(tabs[4:8], resumed[:4]):
        assert np.array_equal(ta.f_carr, tb.f_carr)
        assert np.array_equal(ta.code_phase0, tb.code_phase0)
        assert np.array_equal(ta.carr_phase0, tb.carr_phase0)
        assert np.array_equal(ta.sym_win, tb.sym_win)
        assert ta.grx_sec == tb.grx_sec
