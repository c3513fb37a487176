"""StiPipeline + SpectrogramProcessor: headless end-to-end over the public
event surface (the GUI-equivalent tests of SURVEY.md section 4.5)."""

import numpy as np
import pytest

from pyspectrogram_tpu.io.reader import RFDataset
from pyspectrogram_tpu.models.sti import StiPipeline, assemble_device_block
from pyspectrogram_tpu.ops import reference as oracle
from pyspectrogram_tpu.runtime import (
    ProcessorCallbacks,
    SpectrogramProcessor,
)
from pyspectrogram_tpu.utils.config import SpectrogramConfig
from pyspectrogram_tpu.utils.errors import TerminateReason


def _collector():
    events = {"iterated": [], "stats": [], "terminated": []}
    cb = ProcessorCallbacks(
        on_iterated=events["iterated"].append,
        on_stats=events["stats"].append,
        on_terminated=events["terminated"].append,
    )
    return events, cb


def test_pipeline_matches_oracle_end_to_end(tone_capture):
    """Full request path (disk -> device -> result) vs the numpy oracle fed
    by the reference-equivalent read_sti block."""
    top, meta = tone_capture
    ds = RFDataset(top)
    chan = meta["channel"]
    cfg = SpectrogramConfig(nfft=256, nint=2, ntime=11, mode="parity")
    pipe = StiPipeline(ds, cfg)
    res = pipe.compute()

    lo, hi = ds.bnds[chan]
    n_st, block = ds.read_sti(lo, chan, hi, cfg.nfft, cfg.nint, cfg.ntime)
    f, sxx, med = oracle.sti_proc(block, ds.sr_dict[chan], cfg.nfft,
                                  nint=cfg.nint, mode="parity")
    np.testing.assert_array_equal(res.frame_starts, n_st)
    np.testing.assert_allclose(res.freqs, f, rtol=1e-12)
    # float32 device vs float64 oracle on a 60 dB dynamic-range signal:
    # worst-case disagreement sits near the noise floor; 0.1 dB bound.
    np.testing.assert_allclose(res.sxx_dbfs, oracle.to_dbfs(sxx), atol=0.1)
    np.testing.assert_allclose(res.sxx_med_dbfs, oracle.to_dbfs(med), atol=0.1)
    assert res.sxx_dbfs.shape == (cfg.nfft, cfg.ntime, 2)
    assert res.mask.all()
    # times are per-column datetime64[us] (reference: drfProc.py:303-306)
    assert res.times.shape == (cfg.ntime,)
    assert res.times.dtype == np.dtype("datetime64[us]")
    assert np.datetime64("2016-01-01") <= res.times[0] < np.datetime64("2017")


def test_pipeline_int16_capture(int16_capture):
    """Raw int16 captures ship unconverted; dBFS ref folds into the scale."""
    top, meta = int16_capture
    ds = RFDataset(top)
    cfg = SpectrogramConfig(nfft=512, ntime=8, window="boxcar")
    res = StiPipeline(ds, cfg).compute()
    # tone at amp 2**14 vs ref 2**15.5 -> peak at 20*log10(2**-1.5) ~ -9.03 dBFS
    peak = res.sxx_med_dbfs.max()
    assert abs(peak - 20 * np.log10(2.0 ** -1.5)) < 0.05


def test_assemble_device_block_int16_dtype(int16_capture):
    top, meta = int16_capture
    ds = RFDataset(top)
    chan = meta["channel"]
    lo, _ = ds.bnds[chan]
    n_st = np.asarray([lo, lo + 1000], dtype=np.int64)
    pm, starts, mask = assemble_device_block(ds, chan, None, n_st, 256)
    assert pm.dtype == np.int16 and pm.shape == (2, 512)
    assert list(starts) == [0, 256] and mask.all()
    # plane rows carry the raw r/i values of the requested frames
    raw = ds.reader.read_vector_raw(lo + 1000, 256, chan)
    np.testing.assert_array_equal(pm[0, 256:], raw["r"][:, 0])
    np.testing.assert_array_equal(pm[1, 256:], raw["i"][:, 0])


def test_processor_loop_emits_and_stops(tone_capture):
    top, meta = tone_capture
    events, cb = _collector()
    cfg = SpectrogramConfig(nfft=128, ntime=6)
    proc = SpectrogramProcessor(
        "written", top, tab_id=7, config=cfg, callbacks=cb,
        written_sleep=0.0, max_iterations=3,
    )
    assert proc.is_running
    assert proc.chan_listing == [meta["channel"]]
    proc.run()  # synchronous for determinism
    assert [e.i for e in events["iterated"]] == [0, 1, 2]
    assert events["terminated"][-1].reason == TerminateReason.OK
    it = events["iterated"][-1]
    assert it.tab_id == 7
    assert it.sxx_dbfs.shape == (128, 6, 2)
    assert len(events["stats"]) >= 3
    st = events["stats"][-1]
    assert (st.nfft, st.ntime) == (128, 6)
    stats = proc.latency_stats()
    assert stats["n"] == 3 and stats["p50_s"] > 0


def test_processor_missing_path():
    events, cb = _collector()
    proc = SpectrogramProcessor(
        "written", "/nonexistent/drf", tab_id=1,
        config=SpectrogramConfig(), callbacks=cb,
    )
    assert not proc.is_running
    assert events["terminated"][0].reason == TerminateReason.MISSING_PATH
    import time as _time

    t0 = _time.perf_counter()
    proc.run()  # must return immediately, no further events
    # pre-fix this silently blocked for the full 10 s init timeout:
    # _terminate never released the _ready gate run() waits on
    assert _time.perf_counter() - t0 < 1.0
    assert len(events["terminated"]) == 1
    # settings updates on a failed-init processor fail soft (no
    # AttributeError from the missing dataset/pipeline), like every
    # other reason-code path
    proc.update_settings(nfft=256, bnd_beg=0.0)
    proc.select_channel("nope:0")


def test_latencies_bounded():
    """The per-iteration latency log is a bounded deque — a weeks-long
    streaming session must not grow host memory without end."""
    events, cb = _collector()
    p = SpectrogramProcessor("written", "/nonexistent/drf", tab_id=1,
                             config=SpectrogramConfig(), callbacks=cb)
    assert p.latencies_s.maxlen is not None and p.latencies_s.maxlen >= 1024


def test_processor_settings_update_threadsafe(tone_capture):
    """Settings swap mid-run: later iterations use the new snapshot and the
    new effective stats are echoed (reference round-trip:
    drfview.py:933-940 -> drfProc.py:329-345)."""
    top, meta = tone_capture
    events, cb = _collector()
    seen_shapes = []
    proc = SpectrogramProcessor(
        "written", top, tab_id=2, config=SpectrogramConfig(nfft=128, ntime=4),
        callbacks=cb, written_sleep=0.0, max_iterations=4,
    )

    def see_and_flip(e):
        seen_shapes.append(e.sxx_dbfs.shape)
        if len(seen_shapes) == 2:
            # swap settings mid-run, from the consumer side (the GUI's
            # Update Settings path); the NEXT tick must pick up the new
            # snapshot — incl. through the delta-aware skip cache
            proc.update_settings(nfft=64, ntime=5)

    cb.on_iterated = see_and_flip
    proc.run()
    assert seen_shapes[0] == (128, 4, 2)
    assert seen_shapes[-1] == (64, 5, 2)
    assert events["stats"][-1].nfft == 64


def test_processor_streaming_mode_chases_tail(tone_capture):
    top, meta = tone_capture
    events, cb = _collector()
    proc = SpectrogramProcessor(
        "streaming", top, tab_id=3,
        config=SpectrogramConfig(nfft=128, ntime=4, stream_seconds=0.01),
        callbacks=cb, streaming_sleep=0.0, max_iterations=2,
    )
    assert proc.config.streaming
    proc.run()
    it = events["iterated"][-1]
    # trailing window: last frame ends at the dataset tail
    sr = float(meta["sample_rate"])
    lo, hi = proc.ds.bnds[meta["channel"]]
    last_start = proc.pipeline.compute(proc.config).frame_starts[-1]
    assert hi - (last_start + 128) < sr * 0.02


def test_streaming_window_clamps_to_young_capture(tone_capture):
    """A trailing window longer than the capture clamps its start to the
    data start, so every STI column covers real data instead of
    pre-capture void (improvement over the reference's wall-clock window,
    drfProc.py:291-293, which shows nothing for a paused capture)."""
    top, meta = tone_capture
    proc = SpectrogramProcessor(
        "streaming", top, tab_id=9,
        config=SpectrogramConfig(nfft=128, ntime=6, stream_seconds=3600.0),
        callbacks=ProcessorCallbacks(),
    )
    res = proc.pipeline.compute(proc.config)
    lo, hi = proc.ds.bnds[meta["channel"]]
    assert res.frame_starts[0] >= lo
    assert res.frame_starts[-1] + 128 <= hi + 1
    assert res.mask.all()  # no gap columns


def test_processor_thread_start_abort(tone_capture):
    top, _ = tone_capture
    events, cb = _collector()
    proc = SpectrogramProcessor(
        "written", top, tab_id=4, config=SpectrogramConfig(nfft=128, ntime=4),
        callbacks=cb, written_sleep=0.01,
    ).start()
    import time

    deadline = time.time() + 20
    while not events["iterated"] and time.time() < deadline:
        time.sleep(0.01)
    proc.abort()
    proc.join(10)
    assert events["terminated"][-1].reason == TerminateReason.OK
    assert events["iterated"]


def test_processor_loop_exception_reports_code4(tone_capture):
    top, _ = tone_capture
    events, cb = _collector()
    proc = SpectrogramProcessor(
        "written", top, tab_id=5, config=SpectrogramConfig(nfft=128, ntime=4),
        callbacks=cb, written_sleep=0.0,
    )
    proc.pipeline.compute = lambda cfg: (_ for _ in ()).throw(RuntimeError("boom"))
    proc.run()
    assert events["terminated"][-1].reason == TerminateReason.LOOP_EXCEPTION


def test_pipeline_with_mesh_matches_single_device(tone_capture):
    """StiPipeline(mesh=...) shards the request over the CPU mesh and
    returns arrays identical to the single-device path (incl. when ntime
    needs time-axis padding)."""
    from pyspectrogram_tpu.parallel import make_mesh

    top, meta = tone_capture
    ds = RFDataset(top)
    cfg = SpectrogramConfig(nfft=128, nint=2, ntime=13)  # 13 % 4 != 0
    want = StiPipeline(RFDataset(top), cfg).compute()
    mesh = make_mesh(time_parallel=4, chan_parallel=2)
    got = StiPipeline(ds, cfg, mesh=mesh).compute()
    assert got.sxx_dbfs.shape == want.sxx_dbfs.shape == (128, 13, 2)
    np.testing.assert_allclose(got.sxx_dbfs, want.sxx_dbfs, atol=2e-3)
    np.testing.assert_allclose(got.sxx_med_dbfs, want.sxx_med_dbfs, atol=2e-3)


def test_processor_settings_hammer_threadsafe(tone_capture):
    """Concurrent settings updates from another thread must never corrupt
    a running loop — every emitted result is internally consistent with
    SOME config snapshot (the reference has a data race here;
    drfview.py:933-940 vs drfProc.py:335-341)."""
    import threading

    top, _ = tone_capture
    results = []
    cb = ProcessorCallbacks(
        on_iterated=lambda e: results.append(
            (e.sxx_dbfs.shape[0], e.sxx_dbfs.shape[1])))
    proc = SpectrogramProcessor(
        "written", top, tab_id=9, config=SpectrogramConfig(nfft=64, ntime=4),
        callbacks=cb, written_sleep=0.0, max_iterations=12,
    )
    stop = threading.Event()

    def hammer():
        sizes = [(64, 4), (128, 5), (256, 6)]
        i = 0
        while not stop.is_set():
            nfft, ntime = sizes[i % 3]
            proc.update_settings(nfft=nfft, ntime=ntime)
            i += 1

    t = threading.Thread(target=hammer, daemon=True)
    t.start()
    proc.run()
    stop.set()
    t.join(5)
    assert len(results) == 12
    # every result must be one of the coherent (nfft, ntime) pairs —
    # never a torn combination like (128, 6)
    assert set(results) <= {(64, 4), (128, 5), (256, 6)}


def test_processor_runs_meshed(tone_capture):
    """SpectrogramProcessor(mesh=...) routes every iteration through the
    multi-chip dispatch — written mode via the sharded StiPipeline,
    streaming mode via the chan-sharded live ring (CPU mesh)."""
    from pyspectrogram_tpu.parallel import make_mesh

    top, meta = tone_capture
    mesh = make_mesh(time_parallel=4, chan_parallel=2)  # 2 subchannels
    events, cb = _collector()
    proc = SpectrogramProcessor(
        "written", top, tab_id=11,
        config=SpectrogramConfig(nfft=128, ntime=6),
        callbacks=cb, written_sleep=0.0, max_iterations=2, mesh=mesh,
    )
    assert proc.pipeline.mesh is mesh
    proc.run()
    it = events["iterated"][-1]
    assert it.sxx_dbfs.shape == (128, 6, 2)
    assert np.isfinite(it.sxx_dbfs).all()

    # streaming: the live engine inherits the mesh (chan-sharded ring)
    events2, cb2 = _collector()
    proc2 = SpectrogramProcessor(
        "streaming", top, tab_id=12,
        config=SpectrogramConfig(nfft=128, ntime=6, stream_seconds=0.005),
        callbacks=cb2, streaming_sleep=0.0, max_iterations=2, mesh=mesh,
    )
    proc2.run()
    assert proc2._live.engine.sti.mesh is mesh
    it2 = events2["iterated"][-1]
    assert it2.sxx_med_dbfs.shape == (128, 2)
    assert np.isfinite(it2.sxx_med_dbfs).all()


def test_stop_mid_compute_delivers_first_frame_only(tone_capture):
    """Stop during an in-flight iteration: the run's FIRST frame is still
    delivered (a cold compile can hold it for minutes — dropping it would
    throw away the only result), but a later in-flight frame is dropped
    (it would overwrite state the client captured at stop time)."""
    top, _ = tone_capture
    cfg = SpectrogramConfig(nfft=128, nint=1, ntime=8)

    # stop lands inside the FIRST compute -> that frame still arrives
    events, cb = _collector()
    proc = SpectrogramProcessor("written", top, 0, cfg, callbacks=cb)
    orig = proc.pipeline.compute

    def abort_during(c, **kw):
        res = orig(c, **kw)
        proc.abort()  # while this iteration is conceptually in flight
        return res

    proc.pipeline.compute = abort_during
    proc.run()
    assert len(events["iterated"]) == 1

    # stop lands inside the SECOND compute -> the stale frame is dropped
    events2, cb2 = _collector()
    proc2 = SpectrogramProcessor("written", top, 1, cfg, callbacks=cb2)
    orig2 = proc2.pipeline.compute
    calls = []
    # defeat the delta-aware skip cache so the SECOND tick really
    # computes (this test is about an in-flight compute racing a stop)
    proc2.pipeline.request_key = lambda c: len(calls)

    def abort_on_second(c, **kw):
        res = orig2(c, **kw)
        calls.append(1)
        if len(calls) == 2:
            proc2.abort()
        return res

    proc2.pipeline.compute = abort_on_second
    proc2.run()
    assert len(events2["iterated"]) == 1  # second frame never delivered


def test_save_live_state_guards(tone_capture, tmp_path):
    """save/preload_live_state fail with the documented ValueError on a
    failed-init or non-streaming processor (never AttributeError)."""
    top, _ = tone_capture
    cfg = SpectrogramConfig(nfft=128, ntime=8)
    bad = SpectrogramProcessor("streaming", "/nonexistent-dir", 0, cfg)
    assert not bad.has_live_state
    with pytest.raises(ValueError, match="no live engine"):
        bad.save_live_state(tmp_path / "x.npz")
    with pytest.raises(ValueError, match="streaming mode"):
        bad.preload_live_state(tmp_path / "x.npz")
    written = SpectrogramProcessor("written", top, 0, cfg)
    assert not written.has_live_state
    with pytest.raises(ValueError, match="no live engine"):
        written.save_live_state(tmp_path / "x.npz")


def test_processor_init_failure_reports_real_error(tmp_path):
    """An existing-but-unopenable directory terminates with the REAL
    error (LOOP_EXCEPTION + detail), not the reference's blanket
    missing-path code — the dir plainly exists, so 'directory does not
    exist' would misdirect the user and hide the cause."""
    bad = tmp_path / "empty"
    bad.mkdir()
    events, cb = _collector()
    proc = SpectrogramProcessor("written", bad, tab_id=0,
                                config=SpectrogramConfig(), callbacks=cb)
    assert not proc.is_running
    t = events["terminated"][0]
    assert t.reason == TerminateReason.LOOP_EXCEPTION
    assert t.detail and "Failed to open the dataset" in t.detail
    proc.run()  # still returns immediately, no further events
    assert len(events["terminated"]) == 1


def test_loop_error_survives_raising_terminate_callback(tone_capture,
                                                        capsys):
    """A loop failure whose on_terminated callback ITSELF raises must
    neither escape run() nor swallow the root cause: the original loop
    traceback prints BEFORE the terminate emit (the emit used to run
    first, so its raise propagated and the real error vanished)."""
    top, _ = tone_capture

    def boom(_payload):
        raise RuntimeError("terminate slot torn down")

    proc = SpectrogramProcessor(
        "written", top, tab_id=3, config=SpectrogramConfig(nfft=128),
        callbacks=ProcessorCallbacks(on_terminated=boom),
        written_sleep=0.0, max_iterations=3,
    )
    proc.pipeline.compute = lambda *a, **k: (_ for _ in ()).throw(
        OSError("disk pulled"))
    proc.run()                          # must not raise
    assert proc.reason == TerminateReason.LOOP_EXCEPTION
    err = capsys.readouterr().err
    assert "disk pulled" in err         # the ROOT cause is reported
    assert "terminate slot torn down" in err


def test_pipeline_one_sided_time_span(tone_capture):
    """A time_span with a None side means that edge of the capture: the
    CLI's lone --tstart/--tend crashed with Fraction(None) before."""
    top, meta = tone_capture
    ds = RFDataset(top)
    t0, t1 = ds.time_bnds
    mid = t0 + (t1 - t0) / 2
    base = SpectrogramConfig(nfft=256, ntime=8)
    open_end = StiPipeline(ds, base.replace(time_span=(mid, None))).compute()
    both = StiPipeline(ds, base.replace(time_span=(mid, t1))).compute()
    np.testing.assert_array_equal(open_end.frame_starts, both.frame_starts)
    open_start = StiPipeline(ds, base.replace(time_span=(None, mid))).compute()
    full = StiPipeline(ds, base.replace(time_span=(t0, mid))).compute()
    np.testing.assert_array_equal(open_start.frame_starts,
                                  full.frame_starts)


def test_pipeline_sample_span_exact_resume(tone_capture, tmp_path):
    """compute(sample_span=) reproduces a saved run's frame starts
    EXACTLY even after the capture grows (cmd_resume passes the session
    checkpoint's sample_bounds through this)."""
    import shutil

    top, meta = tone_capture
    grown = tmp_path / "grown"
    shutil.copytree(top, grown)
    ds = RFDataset(grown)
    cfg = SpectrogramConfig(nfft=256, ntime=8)
    res = StiPipeline(ds, cfg).compute()
    bounds = (int(res.frame_starts[0]), int(res.frame_starts[-1]))

    # grow the capture past the original end
    from pyspectrogram_tpu.io.synthetic import tone_signal
    from pyspectrogram_tpu.io.writer import DigitalRFWriter

    sr = int(meta["sample_rate"])
    w = DigitalRFWriter(
        grown, meta["channel"], np.complex64,
        start_global_index=meta["start_global_index"] + meta["n_samples"],
        sample_rate_numerator=sr, file_cadence_millisecs=1000,
        subdir_cadence_secs=3600, num_subchannels=2,
    )
    w.rf_write(np.repeat(tone_signal(1 << 14, sr, [1000.0]), 2,
                         axis=1).astype(np.complex64))

    ds2 = RFDataset(grown)
    res2 = StiPipeline(ds2, cfg).compute(sample_span=bounds)
    np.testing.assert_array_equal(res2.frame_starts, res.frame_starts)
    np.testing.assert_allclose(res2.sxx_dbfs, res.sxx_dbfs, atol=1e-6)
    # without sample_span the grown capture re-spans (different frames)
    res3 = StiPipeline(ds2, cfg).compute()
    assert int(res3.frame_starts[-1]) != int(res.frame_starts[-1])


@pytest.mark.parametrize("base,scale", [(np.int8, 2 ** 6),
                                        (np.int32, 2 ** 30)])
def test_pipeline_compound_non_int16_capture(tmp_path, base, scale):
    """Compound ('r','i') int8/int32 captures — legal Digital RF storage
    the io layer reads and normalizes — must flow through the pipeline
    (structured dtypes cannot astype to complex64, which crashed every
    ingest route; the field-wise converter in native.ingest handles
    them). A tone scaled below full scale must land exactly at the dBFS
    the channel's integer reference (io.drf_format.get_ref) predicts."""
    from pyspectrogram_tpu.io.synthetic import write_capture

    top = tmp_path / f"cap_{np.dtype(base).name}"
    write_capture(
        top, channel="chC", kind="tone", n_samples=1 << 14,
        sample_rate_numerator=250_000, num_subchannels=1,
        dtype=np.dtype([("r", base), ("i", base)]), scale=scale,
    )
    ds = RFDataset(top)
    res = StiPipeline(ds, SpectrogramConfig(nfft=256, ntime=8)).compute()
    peak = float(res.sxx_med_dbfs[:, 0].max())
    assert np.isfinite(res.sxx_dbfs).all()
    want = 20 * np.log10(scale / ds.ref_dict["chC"])
    assert abs(peak - want) < 0.5, (peak, want)


def test_streaming_anchors_at_channel_end_not_global(tmp_path):
    """A streaming compute on a channel whose capture ends EARLIER than
    another channel's must anchor the trailing window at ITS OWN data
    end — the dataset-global time_bnds end lies past its data and every
    column would be zero-filled void."""
    from pyspectrogram_tpu.io.synthetic import write_capture

    sr = 250_000
    t0 = 1_451_661_840
    write_capture(tmp_path, channel="early", kind="tone",
                  n_samples=1 << 14, sample_rate_numerator=sr,
                  start_global_index=t0 * sr)
    write_capture(tmp_path, channel="late", kind="tone",
                  n_samples=1 << 14, sample_rate_numerator=sr,
                  start_global_index=(t0 + 3600) * sr)  # an hour later
    ds = RFDataset(tmp_path)
    cfg = SpectrogramConfig(nfft=256, ntime=8, channel="early",
                            streaming=True, stream_seconds=0.02)
    res = StiPipeline(ds, cfg).compute()
    # anchored at 'early's own end: frames land on real data
    assert int(res.frame_starts[-1]) <= ds.bnds["early"][1]
    assert int(res.frame_starts[0]) >= ds.bnds["early"][0]
    assert float(res.sxx_med_dbfs[:, 0].max()) > -5.0  # tone visible


def _count_raw_reads(ds):
    """Wrap read_vector_raw to record each read's sample span."""
    spans = []
    orig = ds.reader.read_vector_raw

    def counting(start, n, chan, **kw):
        spans.append(int(n))
        return orig(start, n, chan, **kw)

    ds.reader.read_vector_raw = counting
    return spans


def test_written_loop_skips_unchanged_requests(tone_capture):
    """Round-5 pin: on a STATIC capture with an unchanged config, the
    written loop reads/computes once and re-emits the cached result on
    every later tick — the reference re-reads, re-ships and recomputes
    the identical request every 0.1 s (drfProc.py:275-321)."""
    top, meta = tone_capture
    events, cb = _collector()
    # ntime dense enough that the capture-wide request coalesces into ONE
    # bulk read (models.sti.assemble_device_block)
    cfg = SpectrogramConfig(nfft=128, ntime=256)
    proc = SpectrogramProcessor(
        "written", top, tab_id=1, config=cfg, callbacks=cb,
        written_sleep=0.0, max_iterations=5,
    )
    spans = _count_raw_reads(proc.ds)
    bnds_calls = []
    orig_bnds = proc.ds.bnds_update
    proc.ds.bnds_update = lambda: (bnds_calls.append(1), orig_bnds())[1]
    proc.run()
    # every tick emits (payload parity with the reference loop) ...
    assert [e.i for e in events["iterated"]] == [0, 1, 2, 3, 4]
    # ... but only the FIRST tick touched the disk or the device
    assert proc.skipped_recomputes == 4
    assert len(spans) == 1
    # all five emissions carry the same arrays (the cached result)
    first = events["iterated"][0]
    for e in events["iterated"][1:]:
        assert e.sxx_dbfs is first.sxx_dbfs
    # round-5 pin for the double-stat fix: ONE bounds refresh per tick
    # (the processor's), not a second inside StiPipeline.compute
    assert len(bnds_calls) == 5


def test_written_loop_recomputes_when_bounds_grow(tmp_path):
    """Growth chase is preserved: a tick whose resolved span moved (the
    capture grew) recomputes; ticks in between (no growth) skip."""
    from pyspectrogram_tpu.io.synthetic import tone_signal
    from pyspectrogram_tpu.io.writer import DigitalRFWriter

    sr = 100_000
    n0 = 40_000
    w = DigitalRFWriter(
        tmp_path, "grow", np.complex64,
        start_global_index=1_451_661_840 * sr,
        sample_rate_numerator=sr, file_cadence_millisecs=100,
        subdir_cadence_secs=1,
    )
    w.rf_write(tone_signal(n0, sr, [12_500.0]).astype(np.complex64))

    events, cb = _collector()
    cfg = SpectrogramConfig(nfft=64, ntime=8)
    proc = SpectrogramProcessor(
        "written", tmp_path, tab_id=2, config=cfg, callbacks=cb,
        written_sleep=0.0, max_iterations=2,
    )
    spans = _count_raw_reads(proc.ds)
    proc.run()
    # tick 1 read (ntime sparse frames -> per-frame reads), tick 2 skipped
    assert proc.skipped_recomputes == 1
    assert len(spans) == cfg.ntime
    end0 = events["iterated"][-1].times[-1]

    # grow the capture; a fresh loop pass must recompute and chase
    w.rf_write(tone_signal(20_000, sr, [12_500.0],
                           start_sample=n0).astype(np.complex64))
    proc2 = SpectrogramProcessor(
        "written", tmp_path, tab_id=2, config=cfg, callbacks=cb,
        written_sleep=0.0, max_iterations=1,
    )
    proc2.run()
    assert events["iterated"][-1].times[-1] > end0
    # (settings changes invalidating the cache is pinned by
    # test_processor_settings_update_threadsafe: the post-flip tick
    # recomputes through the skip cache at the new shape)


def test_request_key_sees_interior_backfill(tmp_path):
    """An out-of-order writer filling a gap BETWEEN unchanged bounds must
    dirty the delta-aware request key: the resolved span doesn't move, so
    a bounds-only key would re-emit the stale gap-masked columns forever
    (the reference re-read every tick, drfProc.py:275-321, and showed the
    filled data). io.reader.data_version carries the interior
    fingerprint that makes the skip cache see such writes."""
    from pyspectrogram_tpu.io.synthetic import tone_signal, write_capture
    from pyspectrogram_tpu.io.writer import DigitalRFWriter

    sr = 100_000
    # 1 s cadence -> the 3 s capture spans 3+ subdirs; the gap sits in
    # second #1, an INTERIOR subdir (the fingerprint's documented blind
    # spot is a backfill confined to the FINAL subdir)
    start = 1_451_661_840 * sr
    g_off, g_len = int(1.4 * sr), int(0.2 * sr)
    write_capture(tmp_path, channel="ant0", kind="tone", n_samples=3 * sr,
                  sample_rate_numerator=sr, start_global_index=start,
                  gap=(g_off, g_len), subdir_cadence_secs=1,
                  file_cadence_millisecs=200)
    ds = RFDataset(tmp_path)
    cfg = SpectrogramConfig(nfft=128, ntime=16)
    pipe = StiPipeline(ds, cfg)
    bnds0 = ds.bnds["ant0"]
    k0 = pipe.request_key(cfg)
    res0 = pipe.compute(cfg)
    assert not res0.mask.all()          # the gap shows as masked columns
    # static capture: refreshes keep the key equal (the skip cache holds)
    ds.bnds_update()
    assert pipe.request_key(cfg) == k0

    # backfill: a second writer opened AT the gap start — the upstream
    # out-of-order write pattern — lands new files in the interior
    # cadence dir without moving (first, last)
    w = DigitalRFWriter(tmp_path, "ant0", np.complex64,
                        start_global_index=start + g_off,
                        sample_rate_numerator=sr, subdir_cadence_secs=1,
                        file_cadence_millisecs=200)
    w.rf_write(tone_signal(g_len, sr, [12_500.0],
                           start_sample=g_off).astype(np.complex64))
    ds.bnds_update()
    assert ds.bnds["ant0"] == bnds0     # bounds really didn't move
    k1 = pipe.request_key(cfg)
    assert k1 != k0                     # ... but the key went dirty
    res1 = pipe.compute(cfg)
    assert res1.mask.all()              # and a recompute shows the fill


def test_prefetch_assembly_matches_direct(tone_capture, monkeypatch):
    """The chunked PrefetchFeeder assembly (overlapping read/assemble with
    host->device transfer) is bit-identical to the direct path."""
    from pyspectrogram_tpu.models import sti as sti_mod

    top, meta = tone_capture
    ds = RFDataset(top)
    # ntime dense enough that each chunk's read coalesces into one span
    cfg = SpectrogramConfig(nfft=128, nint=1, ntime=512)
    direct = StiPipeline(ds, cfg).compute()

    monkeypatch.setattr(sti_mod, "PREFETCH_MIN_BYTES", 0)
    ds2 = RFDataset(top)
    spans = _count_raw_reads(ds2)
    pre = StiPipeline(ds2, cfg).compute()
    # one coalesced read per chunk
    assert len(spans) == sti_mod.PREFETCH_CHUNKS
    np.testing.assert_array_equal(pre.sxx_dbfs, direct.sxx_dbfs)
    np.testing.assert_array_equal(pre.sxx_med_dbfs, direct.sxx_med_dbfs)
    np.testing.assert_array_equal(pre.frame_starts, direct.frame_starts)
    assert pre.mask.shape == direct.mask.shape and pre.mask.all()
