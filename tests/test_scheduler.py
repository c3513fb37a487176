"""Shared refresh scheduler (runtime.scheduler): same-shape written tabs
merge into ONE batched device launch per cycle, with per-tab delta
skipping, shape-mismatch fallback, and processor lifecycle parity."""

import numpy as np
import pytest

from pyspectrogram_tpu.models import StiPipeline
from pyspectrogram_tpu.runtime import (
    ProcessorCallbacks,
    SharedRefreshScheduler,
    SpectrogramProcessor,
)
from pyspectrogram_tpu.utils.config import SpectrogramConfig
from pyspectrogram_tpu.utils.errors import TerminateReason


def _collector():
    seen = {"iterated": [], "stats": [], "terminated": []}
    cbs = ProcessorCallbacks(
        on_iterated=seen["iterated"].append,
        on_stats=seen["stats"].append,
        on_terminated=seen["terminated"].append,
    )
    return cbs, seen


def _proc(top, sched, tab_id, cfg, **kw):
    cbs, seen = _collector()
    p = SpectrogramProcessor("written", top, tab_id, cfg, callbacks=cbs,
                             scheduler=sched, **kw)
    assert p.is_running
    p.start()  # registers with the scheduler, no per-tab thread
    assert p._thread is None
    return p, seen


CFG = SpectrogramConfig(nfft=256, nint=1, ntime=16)


def test_merged_launch_and_delta_skip(tone_capture):
    """Three same-shape tabs = ONE merged launch per cycle; a second
    cycle on a static capture skips all device work and re-emits."""
    top, _ = tone_capture
    sched = SharedRefreshScheduler(autostart=False)
    tabs = [_proc(top, sched, i, CFG) for i in range(3)]

    sched.tick_once()
    assert sched.merged_launches == 1 and sched.merged_requests == 3
    assert sched.solo_launches == 0
    for p, seen in tabs:
        assert len(seen["iterated"]) == 1 and len(seen["stats"]) == 1
        assert seen["iterated"][0].i == 0

    # differential: the merged payload equals a standalone pipeline's
    want = StiPipeline(tabs[0][0].ds, CFG).compute()
    got = tabs[0][1]["iterated"][0]
    np.testing.assert_allclose(got.sxx_dbfs, want.sxx_dbfs, atol=1e-4)
    np.testing.assert_allclose(got.sxx_med_dbfs, want.sxx_med_dbfs,
                               atol=1e-4)
    np.testing.assert_array_equal(got.times, want.times)

    # static capture: cycle 2 recomputes nothing, re-emits everything
    sched.tick_once()
    assert sched.merged_launches == 1 and sched.solo_launches == 0
    for p, seen in tabs:
        assert p.skipped_recomputes == 1
        assert len(seen["iterated"]) == 2
        assert seen["iterated"][1].i == 1
    for p, _ in tabs:
        p.abort()


def test_shape_mismatch_falls_back_to_solo(tone_capture):
    """Two same-shape tabs merge; the odd-shape tab dispatches solo."""
    top, _ = tone_capture
    sched = SharedRefreshScheduler(autostart=False)
    a = _proc(top, sched, 0, CFG)
    b = _proc(top, sched, 1, CFG)
    c = _proc(top, sched, 2, CFG.replace(nfft=512))

    sched.tick_once()
    assert sched.merged_launches == 1 and sched.merged_requests == 2
    assert sched.solo_launches == 1
    for p, seen in (a, b, c):
        assert len(seen["iterated"]) == 1
    assert c[1]["iterated"][0].freqs.shape == (512,)
    # the solo result still matches its own standalone pipeline
    want = StiPipeline(c[0].ds, CFG.replace(nfft=512)).compute()
    np.testing.assert_allclose(c[1]["iterated"][0].sxx_dbfs, want.sxx_dbfs,
                               atol=1e-4)
    for p, _ in (a, b, c):
        p.abort()


def test_tile_mode_merged_matches_solo_tiles(tone_capture):
    """GUI-shaped tabs (display_tile=True) with DIFFERENT color ranges
    still merge into one launch — colors are per-request runtime operands
    — and each tile is bit-identical to the standalone tile tier."""
    top, _ = tone_capture
    base = CFG.replace(display_tile=True)
    cfgs = [base.replace(color_range_db=(-110.0, -40.0)),
            base.replace(color_range_db=(-95.0, -25.0)),
            base.replace(color_range_db=(-120.0, -60.0))]
    sched = SharedRefreshScheduler(autostart=False)
    tabs = [_proc(top, sched, i, c) for i, c in enumerate(cfgs)]

    sched.tick_once()
    assert sched.merged_launches == 1 and sched.merged_requests == 3
    for (p, seen), cfg in zip(tabs, cfgs):
        got = seen["iterated"][0]
        assert got.sxx_dbfs is None and got.tile is not None
        want = StiPipeline(p.ds, cfg).compute()
        np.testing.assert_array_equal(got.tile, want.tile)
        np.testing.assert_allclose(got.plot_freqs, want.plot_freqs)
        np.testing.assert_allclose(got.sxx_med_dbfs, want.sxx_med_dbfs,
                                   atol=1e-4)
    for p, _ in tabs:
        p.abort()


def test_subchannel_entries_merge(tone_capture):
    """Single-subchannel entries of the same channel batch together
    (nsub=1 each) and each gets its own subchannel's spectra."""
    top, meta = tone_capture
    chan = meta["channel"]
    sched = SharedRefreshScheduler(autostart=False)
    a = _proc(top, sched, 0, CFG.replace(channel=f"{chan}:0"))
    b = _proc(top, sched, 1, CFG.replace(channel=f"{chan}:1"))
    sched.tick_once()
    assert sched.merged_launches == 1 and sched.merged_requests == 2
    for (p, seen), isub in ((a, 0), (b, 1)):
        got = seen["iterated"][0]
        assert got.sxx_dbfs.shape[-1] == 1
        want = StiPipeline(p.ds, p.config).compute()
        np.testing.assert_allclose(got.sxx_dbfs, want.sxx_dbfs, atol=1e-4)
    for p, _ in (a, b):
        p.abort()


def test_settings_change_recomputes_and_regroups(tone_capture):
    """update_settings marks a tab dirty (request key changes) so the
    next cycle recomputes it — solo, since its shape left the group."""
    top, _ = tone_capture
    sched = SharedRefreshScheduler(autostart=False)
    a = _proc(top, sched, 0, CFG)
    b = _proc(top, sched, 1, CFG)
    sched.tick_once()
    assert sched.merged_launches == 1

    a[0].update_settings(nfft=512)
    sched.tick_once()
    # b skipped (unchanged); a recomputed solo at its new shape
    assert sched.merged_launches == 1 and sched.solo_launches == 1
    assert b[0].skipped_recomputes == 1
    assert a[1]["iterated"][-1].freqs.shape == (512,)
    for p, _ in (a, b):
        p.abort()


def test_abort_unregisters_and_stops_emission(tone_capture):
    top, _ = tone_capture
    sched = SharedRefreshScheduler(autostart=False)
    a = _proc(top, sched, 0, CFG)
    b = _proc(top, sched, 1, CFG)
    sched.tick_once()
    a[0].abort()
    assert a[0].reason == TerminateReason.OK
    assert len(a[1]["terminated"]) == 1
    n_before = len(a[1]["iterated"])
    sched.tick_once()
    assert len(a[1]["iterated"]) == n_before  # no emission after abort
    assert len(b[1]["iterated"]) == 2          # the live tab continues
    b[0].abort()
    sched.tick_once()
    with sched._lock:
        assert sched._procs == []


def test_max_iterations_terminates_in_scheduler_mode(tone_capture):
    top, _ = tone_capture
    sched = SharedRefreshScheduler(autostart=False)
    p, seen = _proc(top, sched, 0, CFG, max_iterations=2)
    sched.tick_once()
    assert p.is_running and len(seen["iterated"]) == 1
    sched.tick_once()
    assert not p.is_running
    assert p.reason == TerminateReason.OK
    assert len(seen["iterated"]) == 2 and len(seen["terminated"]) == 1
    sched.tick_once()  # no further emission
    assert len(seen["iterated"]) == 2


def test_autostart_thread_delivers_without_manual_ticks(tone_capture):
    import time

    top, _ = tone_capture
    sched = SharedRefreshScheduler(refresh_s=0.02)
    p, seen = _proc(top, sched, 0, CFG)
    t0 = time.time()
    while time.time() - t0 < 30 and len(seen["iterated"]) < 2:
        time.sleep(0.02)
    assert len(seen["iterated"]) >= 2  # cached re-emits keep flowing
    assert p.skipped_recomputes >= 1
    p.abort()
    p.join(5)  # drain returns promptly
    sched.stop()
    assert not sched._thread.is_alive()


def test_growing_capture_recomputes(tmp_path):
    """Bounds growth changes the resolved span -> the scheduler
    recomputes instead of skipping (the delta check chases bounds)."""
    from pyspectrogram_tpu.io.synthetic import tone_signal
    from pyspectrogram_tpu.io.writer import DigitalRFWriter

    sr = 100_000
    start = 1_451_661_840 * sr
    block = 1 << 14
    w = DigitalRFWriter(
        tmp_path, "g0", np.complex64, start_global_index=start,
        sample_rate_numerator=sr, file_cadence_millisecs=100,
        subdir_cadence_secs=1,
    )
    w.rf_write(tone_signal(block, sr, [12_500.0]).astype(np.complex64))

    sched = SharedRefreshScheduler(autostart=False)
    cfg = SpectrogramConfig(nfft=128, nint=1, ntime=8)
    p, seen = _proc(tmp_path, sched, 0, cfg)
    sched.tick_once()
    assert sched.solo_launches == 1

    w.rf_write(tone_signal(block, sr, [12_500.0],
                           start_sample=block).astype(np.complex64))
    sched.tick_once()
    assert sched.solo_launches == 2  # recomputed, not skipped
    assert p.skipped_recomputes == 0
    t0 = seen["iterated"][0].times
    t1 = seen["iterated"][1].times
    assert t1[-1] > t0[-1]  # the window chased the new data
    p.abort()


def test_merged_failure_falls_back_to_solo(tone_capture, monkeypatch):
    """A merged-launch failure must not take down the tabs: the scheduler
    falls back to per-tab solo dispatches in the same cycle."""
    import pyspectrogram_tpu.models.batch as batch_mod

    top, _ = tone_capture
    sched = SharedRefreshScheduler(autostart=False)
    a = _proc(top, sched, 0, CFG)
    b = _proc(top, sched, 1, CFG)

    class Boom(batch_mod.BatchedStiPipeline):
        def compute(self, *args, **kw):
            raise RuntimeError("merged boom")

    monkeypatch.setattr(batch_mod, "BatchedStiPipeline", Boom)
    sched.tick_once()
    assert sched.merged_launches == 0 and sched.solo_launches == 2
    for p, seen in (a, b):
        assert p.is_running and len(seen["iterated"]) == 1
        assert seen["iterated"][0].sxx_dbfs is not None
    for p, _ in (a, b):
        p.abort()


def test_meshed_tab_keeps_sharded_dispatch(tone_capture):
    """A meshed pipeline never batches (group key None): it keeps its
    own sharded dispatch while single-chip tabs group normally, and the
    meshed result matches the single-chip one."""
    from pyspectrogram_tpu.parallel import make_mesh

    top, _ = tone_capture
    mesh = make_mesh(time_parallel=4, chan_parallel=2)
    sched = SharedRefreshScheduler(autostart=False)
    a = _proc(top, sched, 0, CFG)
    cbs, seen = _collector()
    b = SpectrogramProcessor("written", top, 1, CFG, callbacks=cbs,
                             scheduler=sched, mesh=mesh)
    assert b.is_running
    b.start()
    sched.tick_once()
    assert sched.merged_launches == 0 and sched.solo_launches == 2
    np.testing.assert_allclose(seen["iterated"][0].sxx_dbfs,
                               a[1]["iterated"][0].sxx_dbfs, atol=2e-3)
    a[0].abort()
    b.abort()


def test_one_broken_member_terminates_only_its_tab(tone_capture,
                                                   monkeypatch):
    """When a merged launch fails because ONE member's reads raise, the
    solo fallback lets healthy tabs deliver and terminates only the
    broken one (LOOP_EXCEPTION), like the per-tab thread loop would."""
    top, _ = tone_capture
    sched = SharedRefreshScheduler(autostart=False)
    a = _proc(top, sched, 0, CFG)
    b = _proc(top, sched, 1, CFG)

    def boom(*args, **kw):
        raise OSError("disk pulled")

    monkeypatch.setattr(b[0].ds.reader, "read_vector_raw", boom)
    sched.tick_once()
    # a delivered via the solo fallback; b terminated with the real code
    assert a[0].is_running and len(a[1]["iterated"]) == 1
    assert not b[0].is_running
    assert b[0].reason == TerminateReason.LOOP_EXCEPTION
    assert len(b[1]["terminated"]) == 1
    # the next cycle serves the healthy tab alone (b unregistered)
    sched.tick_once()
    assert len(a[1]["iterated"]) == 2
    a[0].abort()


def test_double_raising_callbacks_cost_only_their_tab(tone_capture):
    """A tab whose on_iterated AND on_terminated callbacks BOTH raise
    (e.g. its widgets were torn down) must cost only itself: in thread
    mode the double-raise killed that tab's own thread — here it must
    not escape the cycle and skip every later tab's refresh."""
    top, _ = tone_capture
    sched = SharedRefreshScheduler(autostart=False)

    def boom(_payload):
        raise RuntimeError("widget torn down")

    broken = SpectrogramProcessor(
        "written", top, 0, CFG, scheduler=sched,
        callbacks=ProcessorCallbacks(on_iterated=boom, on_terminated=boom))
    broken.start()
    healthy, seen = _proc(top, sched, 1, CFG)

    sched.tick_once()   # must not raise out of the cycle
    # the broken tab terminated and left the registry ...
    assert not broken.is_running
    assert broken.reason == TerminateReason.LOOP_EXCEPTION
    assert broken not in sched._procs
    # ... and the tab AFTER it in the same cycle still got served
    assert len(seen["iterated"]) == 1 and len(seen["stats"]) == 1
    sched.tick_once()
    assert len(seen["iterated"]) == 2
    healthy.abort()
