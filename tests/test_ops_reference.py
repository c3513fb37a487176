"""Oracle vs scipy: prove our NumPy reference math IS the reference's math.

The reference computes PSDs with scipy.signal.periodogram on a Kaiser
beta=1.7 window, two-sided, 'spectrum'-scaled, axis 0, then fftshift and a
time-median (reference: drfProc.py:364-403). These tests pin our oracle to
scipy itself, including the verified nint-truncation semantics.
"""

import numpy as np
import pytest
import scipy.signal as sig

from pyspectrogram_tpu.ops import reference as ref
from pyspectrogram_tpu.ops.windows import get_window


def _reference_sti(d1, sr, nfft):
    """Literal reference chain via scipy (same calls as drfProc.py:386-401)."""
    win = sig.get_window(("kaiser", 1.7), nfft)
    f, pxx = sig.periodogram(
        d1, sr, window=win, nfft=nfft, detrend=False,
        return_onesided=False, scaling="spectrum", axis=0,
    )
    f = np.fft.fftshift(f)
    sxx = np.fft.fftshift(pxx, axes=0)
    sxx_med = np.median(sxx, axis=1)
    return f, sxx, sxx_med


@pytest.mark.parametrize("window,nfft", [
    (("kaiser", 1.7), 64), (("kaiser", 1.7), 1024), (("kaiser", 8.6), 256),
    ("hann", 128), ("hamming", 128), ("blackman", 128), ("boxcar", 128),
])
def test_windows_match_scipy(window, nfft):
    ours = get_window(window, nfft)
    theirs = sig.get_window(window if isinstance(window, str) else tuple(window), nfft)
    np.testing.assert_allclose(ours, theirs, rtol=1e-14, atol=1e-15)


@pytest.mark.parametrize("nint", [1, 3])
@pytest.mark.parametrize("nsub", [1, 2])
def test_oracle_matches_scipy_chain(nint, nsub):
    rng = np.random.default_rng(0)
    nfft, ntime, sr = 128, 11, 1e5
    d1 = (rng.standard_normal((nfft * nint, ntime, nsub))
          + 1j * rng.standard_normal((nfft * nint, ntime, nsub)))
    f_s, sxx_s, med_s = _reference_sti(d1, sr, nfft)
    f_o, sxx_o, med_o = ref.sti_proc(d1, sr, nfft, nint=nint, mode="parity")
    np.testing.assert_allclose(f_o, f_s, rtol=1e-12)
    np.testing.assert_allclose(sxx_o, sxx_s, rtol=1e-10, atol=1e-300)
    np.testing.assert_allclose(med_o, med_s, rtol=1e-10, atol=1e-300)


def test_parity_mode_truncates_like_scipy():
    """With nint>1 the reference silently discards all but the first nfft
    samples of each column (verified scipy behavior, SURVEY.md section 2
    row 4): parity(nint=4) == parity(nint=1) on the truncated block."""
    rng = np.random.default_rng(1)
    nfft, nint, ntime = 64, 4, 5
    d1 = rng.standard_normal((nfft * nint, ntime, 1)) + 0j
    full = ref.sti_psd(d1, nfft, nint=nint, mode="parity")
    trunc = ref.sti_psd(d1[:nfft], nfft, nint=1, mode="parity")
    np.testing.assert_array_equal(full, trunc)
    # and it matches scipy run on the full block
    _, sxx_s, _ = _reference_sti(d1, 1.0, nfft)
    np.testing.assert_allclose(full, sxx_s, rtol=1e-10)


def test_welch_mode_averages_segments():
    rng = np.random.default_rng(2)
    nfft, nint, ntime = 64, 8, 3
    d1 = (rng.standard_normal((nfft * nint, ntime, 1))
          + 1j * rng.standard_normal((nfft * nint, ntime, 1)))
    got = ref.sti_psd(d1, nfft, nint=nint, mode="welch")
    # manual average of per-segment parity PSDs
    parts = [
        ref.sti_psd(d1[k * nfft : (k + 1) * nfft], nfft, nint=1, mode="parity")
        for k in range(nint)
    ]
    np.testing.assert_allclose(got, np.mean(parts, axis=0), rtol=1e-12)


def test_tone_psd_peak_location_and_power():
    """A full-scale complex exponential at an exact bin concentrates all
    'spectrum'-scaled power (=amplitude^2) in that bin."""
    nfft, sr = 256, 1e6
    k = 37
    f_tone = k * sr / nfft
    n = np.arange(nfft)
    x = np.exp(2j * np.pi * f_tone * n / sr)[:, None, None]
    f, sxx, med = ref.sti_proc(x, sr, nfft, mode="parity", window="boxcar")
    peak = np.argmax(sxx[:, 0, 0])
    assert f[peak] == pytest.approx(f_tone)
    assert sxx[peak, 0, 0] == pytest.approx(1.0, rel=1e-9)
    # off-peak leakage for boxcar at exact bin is ~0
    rest = np.delete(sxx[:, 0, 0], peak)
    assert np.max(rest) < 1e-20


def test_to_dbfs():
    np.testing.assert_allclose(ref.to_dbfs(np.array([1.0])), [10 * np.log10(1 + 1e-15)])
    assert ref.to_dbfs(np.array([0.0])) == pytest.approx(-150.0)


def test_spectrogram_proc_matches_scipy_spectrogram():
    """Capability parity with the reference's alternate proc_data path
    (reference: drfProc.py:406-453): non-overlapping Kaiser spectrogram."""
    rng = np.random.default_rng(3)
    sr, nfft = 1e4, 128
    x = rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
    win = sig.get_window(("kaiser", 1.7), nfft)
    f_s, t_s, sxx_s = sig.spectrogram(
        x, sr, window=win, noverlap=0, nperseg=nfft, detrend=False,
        return_onesided=False, scaling="spectrum",
    )
    t, f, sxx, med, mn, mx = ref.spectrogram_proc(x, sr, nfft, noverlap=0)
    np.testing.assert_allclose(f, np.fft.fftshift(f_s), rtol=1e-12)
    np.testing.assert_allclose(t, t_s, rtol=1e-12)
    np.testing.assert_allclose(sxx, np.fft.fftshift(sxx_s, axes=0), rtol=1e-10)
    np.testing.assert_allclose(med, np.median(np.fft.fftshift(sxx_s, axes=0), axis=-1))


def test_spectrogram_proc_default_overlap_matches_scipy_default():
    """With no noverlap argument, both scipy.signal.spectrogram and
    spectrogram_proc use nperseg//8 overlap — the semantics the reference's
    proc_data inherits by omitting noverlap (drfProc.py:425-433)."""
    rng = np.random.default_rng(7)
    sr, nfft = 1e4, 128
    x = rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
    win = sig.get_window(("kaiser", 1.7), nfft)
    f_s, t_s, sxx_s = sig.spectrogram(
        x, sr, window=win, nperseg=nfft, detrend=False,
        return_onesided=False, scaling="spectrum",
    )
    t, f, sxx, med, mn, mx = ref.spectrogram_proc(x, sr, nfft)
    np.testing.assert_allclose(t, t_s, rtol=1e-12)
    np.testing.assert_allclose(sxx, np.fft.fftshift(sxx_s, axes=0), rtol=1e-10)


def test_spectrogram_proc_time_integration():
    """integration_dt averages dt-sized chunks of segments (the reference
    proc_data's n_int mean, drfProc.py:439-445)."""
    rng = np.random.default_rng(4)
    sr, nfft = 1e4, 64
    x = rng.standard_normal(nfft * 12) + 1j * rng.standard_normal(nfft * 12)
    t_full, f, sxx_full, *_ = ref.spectrogram_proc(x, sr, nfft, noverlap=0)
    # 3.5 segments worth of time -> n_int truncates to 3 (int(dt/seg_dt),
    # the same truncation the reference's proc_data applies,
    # drfProc.py:439; an exact 3.0 would be float-fragile: 2.999.. -> 2)
    dt = 3.5 * nfft / sr
    t, f2, sxx, med, mn, mx = ref.spectrogram_proc(x, sr, nfft, noverlap=0,
                                                   integration_dt=dt)
    assert sxx.shape == (nfft, 3)  # 12 segs -> 3 full 3-seg chunks (+rest)
    np.testing.assert_allclose(sxx[:, 0], sxx_full[:, :3].mean(axis=1),
                               rtol=1e-12)
    np.testing.assert_allclose(t, t_full[[0, 3, 6]], rtol=1e-12)
    np.testing.assert_allclose(med, np.median(sxx, axis=-1))
    np.testing.assert_allclose(mn, sxx.min(axis=-1))
    np.testing.assert_allclose(mx, sxx.max(axis=-1))
