"""Spectral filtering + inverse-STFT regeneration (README wishlist parity)."""

import numpy as np
import pytest

from pyspectrogram_tpu.ops.filters import (
    band_mask,
    filter_signal,
    make_istft_fn,
    make_stft_fn,
    regenerate_signal,
)


def _two_tone(n, sr, f1, f2):
    t = np.arange(n) / sr
    return np.exp(2j * np.pi * f1 * t) + np.exp(2j * np.pi * f2 * t)


def test_band_mask_shapes_and_kinds():
    sr, nfft = 1e6, 256
    lp = band_mask(nfft, sr, "lowpass", 100e3)
    hp = band_mask(nfft, sr, "highpass", 100e3)
    f = np.fft.fftfreq(nfft, 1 / sr)
    assert lp[np.abs(f) <= 100e3].all() and not lp[np.abs(f) > 100e3].any()
    np.testing.assert_array_equal((lp.astype(bool) | hp.astype(bool)),
                                  np.ones(nfft, bool))
    bp = band_mask(nfft, sr, "bandpass", (-50e3, 50e3))
    bs = band_mask(nfft, sr, "bandstop", (-50e3, 50e3))
    np.testing.assert_array_equal(bp + bs, np.ones(nfft, np.float32))
    with pytest.raises(ValueError):
        band_mask(nfft, sr, "nope", 1.0)


def test_stft_istft_perfect_reconstruction():
    """Hann 50%-overlap analysis/synthesis reconstructs the interior
    exactly (COLA)."""
    rng = np.random.default_rng(0)
    n, nfft, hop = 4096, 256, 128
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    packed = x.view(np.float32).reshape(-1, 2)
    stft = make_stft_fn(nfft=nfft, hop=hop)
    spectra = stft(packed)
    nframes = (n - nfft) // hop + 1
    assert spectra.shape == (nframes, nfft, 2)
    y = regenerate_signal(np.asarray(spectra), nfft, hop)
    # boundary samples have single-window coverage where the 1/w^2 COLA
    # normalization amplifies fp error (standard ISTFT edge behavior, same
    # as scipy.signal.istft) — assert exactness on the fully-covered region
    sl = slice(hop, len(y) - hop)
    np.testing.assert_allclose(y[sl], x[: len(y)][sl], atol=2e-5)


def test_lowpass_removes_high_tone():
    sr, n = 1e6, 1 << 14
    x = _two_tone(n, sr, 50e3, 300e3)
    y = filter_signal(x, sr, "lowpass", 120e3, nfft=1024)
    # remaining signal ~ pure 50 kHz tone: compare against the expected tone
    t = np.arange(len(y)) / sr
    expect = np.exp(2j * np.pi * 50e3 * t)
    # ignore edge taper (first/last nfft samples)
    sl = slice(1024, len(y) - 1024)
    err = np.abs(y[sl] - expect[sl])
    assert err.max() < 5e-3
    # and the high tone is >60 dB down
    spec = np.fft.fft(y[sl])
    f = np.fft.fftfreq(len(spec), 1 / sr)
    hi = np.abs(spec[np.argmin(np.abs(f - 300e3))])
    lo = np.abs(spec[np.argmin(np.abs(f - 50e3))])
    assert 20 * np.log10(hi / lo) < -60


def test_highpass_keeps_high_tone():
    sr, n = 1e6, 1 << 14
    x = _two_tone(n, sr, 50e3, 300e3)
    y = filter_signal(x, sr, "highpass", 120e3, nfft=1024)
    sl = slice(1024, len(y) - 1024)
    t = np.arange(len(y)) / sr
    expect = np.exp(2j * np.pi * 300e3 * t)
    assert np.abs(y[sl] - expect[sl]).max() < 5e-3


def test_regenerate_with_mask_subset():
    """Masked regeneration == filtering: zero a band, get the other tone."""
    sr, n, nfft, hop = 1e6, 1 << 13, 512, 256
    x = _two_tone(n, sr, -200e3, 100e3).astype(np.complex64)
    packed = x.view(np.float32).reshape(-1, 2)
    spectra = np.asarray(make_stft_fn(nfft=nfft, hop=hop)(packed))
    mask = band_mask(nfft, sr, "bandpass", (0, 250e3))
    y = regenerate_signal(spectra, nfft, hop, freq_mask=mask)
    t = np.arange(len(y)) / sr
    sl = slice(nfft, len(y) - nfft)
    np.testing.assert_allclose(
        y[sl], np.exp(2j * np.pi * 100e3 * t)[sl], atol=5e-3
    )


def test_save_wav(tmp_path):
    from scipy.io import wavfile

    from pyspectrogram_tpu.ops.filters import save_wav

    sr, n = 8000, 4000
    t = np.arange(n) / sr
    x = np.exp(2j * np.pi * 440 * t)
    p = save_wav(str(tmp_path / "tone"), x, sr)
    rate, data = wavfile.read(p)
    assert rate == sr and data.dtype == np.int16 and len(data) == n
    # 440 Hz must dominate the spectrum of the written audio
    spec = np.abs(np.fft.rfft(data.astype(float)))
    assert abs(np.fft.rfftfreq(n, 1 / sr)[np.argmax(spec)] - 440) < 2


def test_stft_rejects_short_signal():
    """Signals shorter than one frame refuse loudly instead of returning
    an unrelated-length all-zeros signal."""
    x = np.zeros(100, np.complex64)
    with pytest.raises(ValueError, match="too short"):
        filter_signal(x, 1e6, "lowpass", 100e3)  # default nfft=1024
    with pytest.raises(ValueError, match="at least one frame"):
        make_istft_fn(nfft=256, hop=128, nframes=0)
