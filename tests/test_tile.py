"""On-device display-tile path (display.tile): device crop + decimate +
quantize must match the host plan bit-exactly, and the pipeline/streaming/
clients must consume tiles without reading back float spectra
(north-star display path, BASELINE.md; reference: drfview.py:1006-1023,
drfview.py:1057)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyspectrogram_tpu.display import (
    freq_crop_decimate,
    make_tile_spec,
    quantize_on_device,
    save_tile_png,
    tile_freqs,
    tile_from_db,
)
from pyspectrogram_tpu.io.reader import RFDataset
from pyspectrogram_tpu.models.sti import StiPipeline
from pyspectrogram_tpu.models.streaming import StreamingSti
from pyspectrogram_tpu.ops import stft
from pyspectrogram_tpu.utils.config import SpectrogramConfig

CRANGE = (-110.0, -40.0)


def _pm(nsamp, nsub, seed=0):
    rng = np.random.default_rng(seed)
    return 0.01 * rng.standard_normal((nsub * 2, nsamp)).astype(np.float32)


def test_tile_spec_matches_decimation_plan():
    freqs = stft.shifted_freqs(4096, 1_000_000)
    for frange, maxn in [((-200.0, 200.0), 64), ((-500.0, 500.0), 4096),
                         ((10.0, 450.0), 100)]:
        idx, plotf = freq_crop_decimate(freqs, frange, maxn)
        spec = make_tile_spec(freqs, frange, CRANGE, max_nfreqs=maxn)
        np.testing.assert_array_equal(spec.plot_indices, idx)
        np.testing.assert_array_equal(tile_freqs(spec, freqs), plotf)


def test_tile_spec_empty_window_is_none():
    freqs = stft.shifted_freqs(256, 10_000)  # Nyquist 5 kHz
    assert make_tile_spec(freqs, (100.0, 200.0), CRANGE) is None


def test_device_tile_matches_host_quantized_floats():
    """The VERDICT done-criterion: device tile == host quantize_on_device
    of the float result, bit-exact."""
    nfft, ntime, nsub = 256, 12, 2
    freqs = stft.shifted_freqs(nfft, 100_000)
    spec = make_tile_spec(freqs, (-20.0, 30.0), CRANGE, max_nfreqs=37)
    fn = stft.make_sti_fn_pm(nfft=nfft, tile=spec)
    pm = _pm(nfft * ntime, nsub)
    starts = (np.arange(ntime) * nfft).astype(np.int32)
    out = fn(jnp.asarray(pm), jnp.asarray(starts))
    # tile mode swaps the float spectra for the uint8 tile — the oracle
    # comes from a separate non-tile program
    assert "sxx_dbfs" not in out
    db = stft.make_sti_fn_pm(nfft=nfft)(
        jnp.asarray(pm), jnp.asarray(starts))["sxx_dbfs"]
    want = quantize_on_device(
        np.asarray(db)[..., spec.plot_indices], CRANGE, 256)
    got = np.asarray(out["tile"])
    assert got.dtype == np.uint8
    assert got.shape == (ntime, nsub, spec.plot_n)
    np.testing.assert_array_equal(got, want)


def test_tile_from_db_device_and_host_agree():
    freqs = stft.shifted_freqs(128, 50_000)
    spec = make_tile_spec(freqs, (-20.0, 20.0), CRANGE, max_nfreqs=19)
    rng = np.random.default_rng(2)
    db = (-120 + 90 * rng.random((5, 2, 128))).astype(np.float32)
    np.testing.assert_array_equal(
        tile_from_db(db, spec), tile_from_db(jnp.asarray(db), spec))


def test_color_range_change_reuses_compiled_program():
    """Specs differing only in cmin/cmax must share ONE compiled device
    program (the color range is a runtime operand — a live-view re-clim
    must not trigger a 20-80 s remote recompile; review r3), and the
    tiles must still quantize against their own ranges bit-exactly."""
    nfft, ntime, nsub = 256, 6, 1
    freqs = stft.shifted_freqs(nfft, 100_000)
    s1 = make_tile_spec(freqs, (-20.0, 30.0), (-110.0, -40.0), max_nfreqs=37)
    s2 = make_tile_spec(freqs, (-20.0, 30.0), (-90.0, -10.0), max_nfreqs=37)
    assert s1.crop_key() == s2.crop_key()

    before = stft._make_sti_fn_pm.cache_info()
    f1 = stft.make_sti_fn_pm(nfft=nfft, tile=s1)
    after1 = stft._make_sti_fn_pm.cache_info()
    f2 = stft.make_sti_fn_pm(nfft=nfft, tile=s2)
    after2 = stft._make_sti_fn_pm.cache_info()
    # the second spec must NOT create a second compiled-program entry
    assert after1.currsize - before.currsize <= 1
    assert after2.currsize == after1.currsize

    pm = _pm(nfft * ntime, nsub)
    starts = (np.arange(ntime) * nfft).astype(np.int32)
    o1 = f1(jnp.asarray(pm), jnp.asarray(starts))
    o2 = f2(jnp.asarray(pm), jnp.asarray(starts))
    db = np.asarray(stft.make_sti_fn_pm(nfft=nfft)(
        jnp.asarray(pm), jnp.asarray(starts))["sxx_dbfs"])
    w1 = quantize_on_device(db[..., s1.plot_indices], (-110.0, -40.0), 256)
    w2 = quantize_on_device(db[..., s2.plot_indices], (-90.0, -10.0), 256)
    np.testing.assert_array_equal(np.asarray(o1["tile"]), w1)
    np.testing.assert_array_equal(np.asarray(o2["tile"]), w2)
    # explicit qparams operand overrides the factory default
    o3 = f1(jnp.asarray(pm), jnp.asarray(starts), s2.qparams)
    np.testing.assert_array_equal(np.asarray(o3["tile"]), w2)


def test_pipeline_display_tile_mode(tone_capture):
    """display_tile=True: result carries tile/plot_freqs, no float sxx;
    levels match the float pipeline quantized on host."""
    top, meta = tone_capture
    cfg = SpectrogramConfig(nfft=512, nint=2, ntime=16,
                            color_range_db=CRANGE)
    full = StiPipeline(RFDataset(top), cfg).compute()
    res = StiPipeline(RFDataset(top), cfg.replace(display_tile=True)).compute()
    assert res.sxx_dbfs is None
    assert res.tile is not None and res.tile.dtype == np.uint8
    spec = make_tile_spec(res.freqs, cfg.freq_window_khz, CRANGE)
    np.testing.assert_array_equal(res.plot_freqs, tile_freqs(spec, res.freqs))
    want = quantize_on_device(
        full.sxx_time_major[..., spec.plot_indices], CRANGE, 256)
    np.testing.assert_array_equal(res.tile, want)
    # median PSD still ships (the GUI's PSD panel needs it)
    np.testing.assert_array_equal(res.sxx_med_dbfs, full.sxx_med_dbfs)


def test_pipeline_display_tile_sharded_mesh(tone_capture):
    """Mesh tier: the uint8 quantization is fused into the sharded
    program per shard (parallel.sharded tile=), so the mesh tile is
    bit-identical to the single-chip fused program's tile — the
    elementwise epilogue (display.tile.quantize_tile_linear) is the same
    traced code in both."""
    from pyspectrogram_tpu.parallel import make_mesh

    top, meta = tone_capture
    cfg = SpectrogramConfig(nfft=256, ntime=16, color_range_db=CRANGE,
                            display_tile=True)
    mesh = make_mesh(time_parallel=4, chan_parallel=2)
    res = StiPipeline(RFDataset(top), cfg, mesh=mesh).compute()
    want = StiPipeline(RFDataset(top), cfg).compute()
    assert res.sxx_dbfs is None and res.tile.dtype == np.uint8
    np.testing.assert_array_equal(res.tile, want.tile)


def test_streaming_snapshot_quantized_matches_float_snapshot():
    nfft, nsub = 128, 2
    s = StreamingSti(nfft=nfft, nsub=nsub, block_len=512, ring_len=8)
    freqs = stft.shifted_freqs(nfft, 100_000)
    spec = make_tile_spec(freqs, (-30.0, 30.0), CRANGE, max_nfreqs=23)
    rng = np.random.default_rng(4)
    st = s.init_state()
    for _ in range(5):  # 20 cols through an 8-ring: wrapped
        st, _ = s.push(st, jnp.asarray(
            0.05 * rng.standard_normal((nsub * 2, 512)).astype(np.float32)))
    db, nvalid = s.snapshot(st)
    tile, nvalid2 = s.snapshot_quantized(st, spec)
    assert nvalid == nvalid2 == 8
    assert tile.shape == (8, nsub, spec.plot_n) and tile.dtype == np.uint8
    want = quantize_on_device(db[..., spec.plot_indices], CRANGE, 256)
    np.testing.assert_array_equal(tile, want)


def test_save_tile_png(tmp_path):
    rng = np.random.default_rng(1)
    tile = rng.integers(0, 256, size=(16, 33)).astype(np.uint8)
    p = save_tile_png(str(tmp_path / "t"), tile)
    assert p.endswith(".png")
    from PIL import Image

    img = np.asarray(Image.open(p))
    assert img.shape == (16, 33, 4)
    # bottom row of the image is the OLDEST (time ascends upward)
    from pyspectrogram_tpu.display import apply_lut

    np.testing.assert_array_equal(img[-1], apply_lut(tile[0]))


def test_processor_emits_tiles_in_display_mode(tone_capture):
    from pyspectrogram_tpu.runtime import (
        ProcessorCallbacks,
        SpectrogramProcessor,
    )

    top, meta = tone_capture
    got = []
    cfg = SpectrogramConfig(nfft=256, ntime=8, display_tile=True)
    proc = SpectrogramProcessor(
        "written", top, 1, cfg,
        callbacks=ProcessorCallbacks(on_iterated=got.append),
        max_iterations=2, written_sleep=0.0,
    )
    assert proc.is_running
    proc.run()
    assert len(got) == 2
    e = got[-1]
    assert e.sxx_dbfs is None
    assert e.tile is not None and e.tile.dtype == np.uint8
    assert e.plot_freqs is not None
    # the tone still shows up through the quantized path
    assert e.tile.max() > 0


def test_make_tile_spec_rejects_nonuniform_plan():
    """An unshifted (raw fftfreq-ordered) axis makes the decimation plan
    non-strided; the spec must refuse (a silent TileSpec would lax.slice
    the wrong bins on device)."""
    import pytest

    from pyspectrogram_tpu.display.tile import make_tile_spec

    freqs = np.fft.fftfreq(64, 1e-6)  # +f block then -f block
    with pytest.raises(ValueError, match="stride"):
        make_tile_spec(freqs, (-200.0, 200.0), (-80.0, -20.0), max_nfreqs=8)
