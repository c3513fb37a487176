"""Aux subsystems: checkpoint/resume, async ingest feeder, stage timing."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyspectrogram_tpu.io.ingest import PrefetchFeeder, stream_blocks
from pyspectrogram_tpu.io.reader import RFDataset
from pyspectrogram_tpu.models.streaming import StreamingSti
from pyspectrogram_tpu.runtime import checkpoint
from pyspectrogram_tpu.utils.config import SpectrogramConfig
from pyspectrogram_tpu.utils.profiling import StageTimer


def test_session_checkpoint_roundtrip(tmp_path):
    cfg = SpectrogramConfig(nfft=2048, nint=3, ntime=50, mode="parity",
                            window=("kaiser", 8.6), channel="ch0:1",
                            time_span=(100.0, 200.0))
    p = checkpoint.save_session(tmp_path / "sess.npz", "/data/capture", cfg,
                                sample_bounds=(10 ** 15, 10 ** 15 + 12345),
                                extra={"note": "x"})
    h = checkpoint.load_session(p)
    assert h["dataset_dir"] == "/data/capture"
    assert h["config"] == cfg
    assert h["sample_bounds"] == (10 ** 15, 10 ** 15 + 12345)
    assert h["extra"] == {"note": "x"}


def test_stream_state_checkpoint_resume(tmp_path):
    """Interrupt a stream mid-way, checkpoint, resume: columns must be
    identical to an uninterrupted run (incl. the carry across the cut)."""
    nfft, nsub = 64, 1
    hop = 32
    block_len = 128
    s = StreamingSti(nfft=nfft, nsub=nsub, block_len=block_len, hop=hop,
                     ring_len=16, mode="parity")
    rng = np.random.default_rng(0)
    blocks = [rng.standard_normal((2, block_len)).astype(np.float32)
              for _ in range(4)]

    # uninterrupted
    st = s.init_state()
    want = []
    for b in blocks:
        st, c = s.push(st, jnp.asarray(b))
        want.append(np.asarray(c))

    # interrupted after 2 blocks
    st1 = s.init_state()
    for b in blocks[:2]:
        st1, c = s.push(st1, jnp.asarray(b))
    p = checkpoint.save_stream_state(tmp_path / "stream.npz", st1,
                                     meta={"nfft": nfft, "hop": hop})
    st2, meta = checkpoint.load_stream_state(p)
    assert meta["nfft"] == nfft
    got = []
    for b in blocks[2:]:
        st2, c = s.push(st2, jnp.asarray(b))
        got.append(np.asarray(c))
    np.testing.assert_allclose(np.concatenate(got),
                               np.concatenate(want[2:]), atol=1e-6)


def test_prefetch_feeder_order_and_error():
    out = list(PrefetchFeeder(lambda i: i * 10, 5, depth=2, device_put=False))
    assert out == [0, 10, 20, 30, 40]

    def boom(i):
        if i == 2:
            raise RuntimeError("io failed")
        return i

    f = PrefetchFeeder(boom, 5, depth=1, device_put=False)
    with pytest.raises(RuntimeError, match="io failed"):
        list(f)


def test_stream_blocks_feeds_streaming_sti(tone_capture):
    """Disk -> prefetch feeder -> streaming ring, end to end."""
    top, meta = tone_capture
    ds = RFDataset(top)
    chan = meta["channel"]
    lo, hi = ds.bnds[chan]
    nfft, block_len = 256, 1024
    n_blocks = 8
    s = StreamingSti(nfft=nfft, nsub=2, block_len=block_len, ring_len=64)
    state = s.init_state()
    with stream_blocks(ds, chan, lo, block_len, n_blocks) as feeder:
        for blk in feeder:
            assert blk.shape == (4, block_len)
            state, _ = s.push(state, blk)
    assert int(state.total_cols) == n_blocks * (block_len // nfft)
    med = s.median_psd(state)
    # tone capture: both subchannel PSD peaks near 0 dBFS
    assert med.max() > -1.0


def test_stage_timer():
    t = StageTimer()
    with t.stage("read"):
        pass
    with t.stage("read"):
        pass
    with t.stage("compute"):
        pass
    st = t.stats()
    assert st["read"]["n"] == 2 and st["compute"]["n"] == 1
    assert t.stats("read")["p50_s"] >= 0
    t.reset()
    assert t.stats("read") == {"n": 0}


def test_structured_logging(capsys, monkeypatch):
    import importlib
    import json as _json
    import logging

    from pyspectrogram_tpu.utils import log as logmod

    monkeypatch.setenv("PSTPU_LOG_JSON", "1")
    logger = logging.getLogger("pstpu.test_json")
    logger.handlers.clear()
    lg = logmod.get_logger.__wrapped__("pstpu.test_json") if hasattr(
        logmod.get_logger, "__wrapped__") else logmod.get_logger(
        "pstpu.test_json")
    import io as _io

    buf = _io.StringIO()
    lg.handlers[0].stream = buf
    logmod.log_event(lg, "unit event", tab_id=3, reason=0)
    line = buf.getvalue().strip()
    rec = _json.loads(line)
    # fields are top-level keys ONLY — a rendered dict inside msg would
    # break message-based grouping, JSON mode's stated purpose
    assert rec["msg"] == "unit event"
    assert rec["tab_id"] == 3 and rec["level"] == "INFO"


def test_human_logging_appends_fields(monkeypatch):
    import io as _io
    import logging

    from pyspectrogram_tpu.utils import log as logmod

    monkeypatch.delenv("PSTPU_LOG_JSON", raising=False)
    logging.getLogger("pstpu.test_human").handlers.clear()
    lg = logmod.get_logger("pstpu.test_human")
    buf = _io.StringIO()
    lg.handlers[0].stream = buf
    logmod.log_event(lg, "unit event", tab_id=3)
    assert "unit event {'tab_id': 3}" in buf.getvalue()


def test_config_time_span_validation():
    import pytest

    from pyspectrogram_tpu.utils.config import resolve_time_span

    # reversed span refused like every other range knob
    with pytest.raises(ValueError, match="greater than start"):
        SpectrogramConfig(time_span=(10.0, 5.0))
    with pytest.raises(ValueError, match="finite"):
        SpectrogramConfig(time_span=(float("nan"), 5.0))
    with pytest.raises(ValueError, match="finite"):
        SpectrogramConfig(time_span=("soon", 5.0))
    with pytest.raises(ValueError, match="pair"):
        SpectrogramConfig(time_span=(1.0, 2.0, 3.0))
    # a None SIDE is legal (that edge of the capture) and resolves
    cfg = SpectrogramConfig(time_span=(5.0, None))
    assert resolve_time_span(cfg.time_span, (0.0, 30.0)) == (5.0, 30.0)
    assert resolve_time_span(None, (0.0, 30.0)) == (0.0, 30.0)
    assert resolve_time_span((None, 8.0), (2.0, 30.0)) == (2.0, 8.0)


def test_checkpoint_non_npz_suffix_roundtrips(tmp_path):
    """np.savez APPENDS .npz to foreign suffixes; the returned path must be
    the file that actually exists, and loading by the ORIGINAL name must
    work too (ADVICE round 1: `pstpu resume sess.ckpt` used to fail)."""
    cfg = SpectrogramConfig(nfft=512, nint=2, ntime=32)
    p = checkpoint.save_session(tmp_path / "sess.ckpt", "/data/cap", cfg,
                                sample_bounds=(10, 99))
    assert p.exists() and p.name == "sess.ckpt.npz"
    for name in (p, tmp_path / "sess.ckpt"):
        h = checkpoint.load_session(name)
        assert h["config"].nfft == 512
        assert h["sample_bounds"] == (10, 99)

    s = StreamingSti(nfft=256, nint=1, nsub=1, block_len=1024, ring_len=8)
    st = s.init_state()
    q = checkpoint.save_stream_state(tmp_path / "stream.state", st,
                                     {"nfft": 256})
    assert q.exists() and q.name == "stream.state.npz"
    st2, meta = checkpoint.load_stream_state(tmp_path / "stream.state")
    assert meta["nfft"] == 256
    assert st2.ring.shape == st.ring.shape


def test_legacy_v1_stream_state_midwrap_is_refused(tmp_path):
    """v1 checkpoints carry no ring_layout flag and v1 WRITERS differed
    (original canonical oldest-at-tail vs the interim circular code's
    rotated storage), so a mid-wrap v1 ring is genuinely ambiguous: the
    loader must refuse it loudly instead of guessing a layout and
    silently scrambling resume (review r3; supersedes the ADVICE-r2
    assume-canonical fix)."""
    import json

    nfft, hop, block_len = 64, 32, 128
    s = StreamingSti(nfft=nfft, nsub=1, block_len=block_len, hop=hop,
                     ring_len=16, mode="parity")
    rng = np.random.default_rng(3)

    st = s.init_state()
    for _ in range(7):  # 7*4 = 28 cols -> mid-wrap (28 % 16 = 12)
        st, _ = s.push(st, jnp.asarray(
            rng.standard_normal((2, block_len)).astype(np.float32)))

    canonical = np.asarray(s._ordered_ring(st))
    header = {"format_version": 1, "meta": {"nfft": nfft}}
    p = tmp_path / "legacy.npz"
    np.savez(p,
             header=np.frombuffer(json.dumps(header).encode(), np.uint8),
             carry=np.asarray(st.carry),
             ring=canonical,
             total_cols=np.asarray(st.total_cols))
    with pytest.raises(ValueError, match="ambiguous"):
        checkpoint.load_stream_state(p)


def test_legacy_v1_stream_state_rotation_identity_loads(tmp_path):
    """A v1 ring at a rotation-identity point (total_cols % ring_len == 0)
    reads the same under both historical layouts — it must load and
    resume exactly."""
    import json

    nfft, hop, block_len = 64, 32, 128
    s = StreamingSti(nfft=nfft, nsub=1, block_len=block_len, hop=hop,
                     ring_len=16, mode="parity")
    rng = np.random.default_rng(3)

    st = s.init_state()
    for _ in range(8):  # 8*4 = 32 cols -> 32 % 16 == 0, unambiguous
        st, _ = s.push(st, jnp.asarray(
            rng.standard_normal((2, block_len)).astype(np.float32)))
    want_snap, _ = s.snapshot(st)

    canonical = np.asarray(s._ordered_ring(st))
    header = {"format_version": 1, "meta": {"nfft": nfft}}
    p = tmp_path / "legacy.npz"
    np.savez(p,
             header=np.frombuffer(json.dumps(header).encode(), np.uint8),
             carry=np.asarray(st.carry),
             ring=canonical,
             total_cols=np.asarray(st.total_cols))

    st2, meta = checkpoint.load_stream_state(p)
    assert meta["nfft"] == nfft
    snap2, _ = s.snapshot(st2)
    np.testing.assert_array_equal(snap2, want_snap)
    # resumed pushes must match the uninterrupted stream exactly
    st_ref = st
    for b in [rng.standard_normal((2, block_len)).astype(np.float32)
              for _ in range(3)]:
        st_ref, c_ref = s.push(st_ref, jnp.asarray(b))
        st2, c2 = s.push(st2, jnp.asarray(b))
        np.testing.assert_array_equal(np.asarray(c2), np.asarray(c_ref))
    a, _ = s.snapshot(st_ref)
    b_, _ = s.snapshot(st2)
    np.testing.assert_array_equal(a, b_)


def test_v2_stream_state_roundtrip_preserves_rotation(tmp_path):
    """v2 states store the rotated layout verbatim; save->load->snapshot
    must be bit-identical mid-wrap."""
    s = StreamingSti(nfft=32, nsub=1, block_len=96, hop=32, ring_len=8)
    rng = np.random.default_rng(5)
    st = s.init_state()
    for _ in range(4):  # 12 cols through an 8-ring: wrapped + rotated
        st, _ = s.push(st, jnp.asarray(
            rng.standard_normal((2, 96)).astype(np.float32)))
    want, nvalid = s.snapshot(st)
    p = checkpoint.save_stream_state(tmp_path / "v2.npz", st, {"x": 1})
    st2, _ = checkpoint.load_stream_state(p)
    got, nvalid2 = s.snapshot(st2)
    assert nvalid == nvalid2
    np.testing.assert_array_equal(want, got)


def test_newer_stream_state_version_rejected(tmp_path):
    import json

    header = {"format_version": 99, "meta": {}}
    p = tmp_path / "future.npz"
    np.savez(p,
             header=np.frombuffer(json.dumps(header).encode(), np.uint8),
             carry=np.zeros((2, 0), np.float32),
             ring=np.zeros((4, 1, 8), np.float32),
             total_cols=np.asarray(0))
    with pytest.raises(ValueError, match="newer format"):
        checkpoint.load_stream_state(p)


def test_device_trace_writes_profile(tmp_path):
    """utils.profiling.device_trace captures a jax profiler trace (the
    bench CLI exposes it as --trace DIR)."""
    import jax.numpy as jnp

    from pyspectrogram_tpu.utils.profiling import device_trace

    with device_trace(str(tmp_path / "prof")):
        jnp.sum(jnp.arange(128.0)).block_until_ready()
    files = list((tmp_path / "prof").rglob("*"))
    assert any(f.is_file() for f in files)
