"""JAX STI core vs the NumPy oracle (golden-value tests, SURVEY.md §4.1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyspectrogram_tpu.ops import reference as oracle
from pyspectrogram_tpu.ops import stft


def _random_buffer(nsamp, nsub, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((nsamp, nsub)).astype(np.float32)
            + 1j * rng.standard_normal((nsamp, nsub)).astype(np.float32)
            ).astype(np.complex64)


def _oracle_outputs(samples, starts, nfft, nint, mode, eps=1e-15):
    """Build the (nfft*nint, ntime, nsub) block the reference layout uses
    and run the oracle on it."""
    frame_len = nfft * nint
    block = np.stack([samples[s : s + frame_len] for s in starts], axis=1)
    sxx = oracle.sti_psd(block, nfft, nint=nint, mode=mode)  # (nfft,ntime,nsub)
    med = np.median(sxx, axis=1)
    return oracle.to_dbfs(sxx, eps), oracle.to_dbfs(med, eps)


@pytest.mark.parametrize("mode,nint", [("parity", 1), ("parity", 3), ("welch", 4)])
def test_sti_matches_oracle(mode, nint):
    nfft, ntime, nsub = 128, 9, 2
    samples = _random_buffer(nfft * nint * ntime + 64, nsub)
    starts = np.linspace(0, len(samples) - nfft * nint, ntime, dtype=int)

    fn = stft.make_sti_fn(nfft=nfft, nint=nint, mode=mode)
    out = fn(jnp.asarray(samples), jnp.asarray(starts, jnp.int32))

    got_sxx = stft.to_reference_layout(out["sxx_dbfs"])      # (nfft,ntime,nsub)
    got_med = np.moveaxis(np.asarray(out["sxx_med_dbfs"]), -1, 0)  # (nfft,nsub)
    want_sxx, want_med = _oracle_outputs(samples.astype(np.complex128), starts,
                                         nfft, nint, mode)
    # float32 device vs float64 oracle: dB-domain agreement
    np.testing.assert_allclose(got_sxx, want_sxx, atol=5e-3, rtol=0)
    np.testing.assert_allclose(got_med, want_med, atol=5e-3, rtol=0)


def test_sti_float64_tight_match():
    """complex128 on CPU must agree with the oracle to near machine eps."""
    with jax.enable_x64(True):
        nfft, nint, ntime, nsub = 64, 2, 7, 1
        samples = _random_buffer(nfft * nint * ntime, nsub, seed=5).astype(
            np.complex128
        )
        starts = np.linspace(0, len(samples) - nfft * nint, ntime, dtype=int)
        fn = stft.make_sti_fn(nfft=nfft, nint=nint, mode="welch",
                              compute_dtype=jnp.complex128)
        out = fn(jnp.asarray(samples), jnp.asarray(starts, jnp.int64))
        want_sxx, want_med = _oracle_outputs(samples, starts, nfft, nint, "welch")
        np.testing.assert_allclose(
            stft.to_reference_layout(out["sxx_dbfs"]), want_sxx, rtol=1e-12
        )
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(out["sxx_med_dbfs"]), -1, 0), want_med,
            rtol=1e-12,
        )


def test_packed_int16_input_normalization():
    """Raw int16 r/i planes with ref folded into the power scale must match
    normalizing on the host first (reference normalizes x/ref before the
    FFT, drfProc.py:129; scaling commutes through to power)."""
    rng = np.random.default_rng(7)
    nfft, ntime = 128, 5
    nsamp = nfft * ntime
    raw = rng.integers(-(2 ** 14), 2 ** 14, size=(nsamp, 1, 2)).astype(np.int16)
    ref_level = 2.0 ** 15.5
    starts = np.arange(ntime, dtype=np.int32) * nfft

    fn_raw = stft.make_sti_fn(nfft=nfft, ref=ref_level)
    out_raw = fn_raw(jnp.asarray(raw), jnp.asarray(starts))

    complex_host = (raw[..., 0].astype(np.float64)
                    + 1j * raw[..., 1].astype(np.float64)) / ref_level
    want_sxx, want_med = _oracle_outputs(complex_host, starts, nfft, 1, "welch")
    np.testing.assert_allclose(
        stft.to_reference_layout(out_raw["sxx_dbfs"]), want_sxx, atol=5e-3
    )


def test_gather_frames_layout():
    samples = jnp.arange(40, dtype=jnp.float32).reshape(20, 2)
    starts = jnp.asarray([0, 5, 12], jnp.int32)
    frames = stft.gather_frames(samples, starts, 4)
    assert frames.shape == (3, 2, 4)
    np.testing.assert_array_equal(frames[1, 0], [10, 12, 14, 16])
    np.testing.assert_array_equal(frames[2, 1], [25, 27, 29, 31])


def test_tone_peak_on_device():
    """End-to-end sanity: exact-bin tone lands all power in its bin."""
    nfft, sr, k = 256, 1e6, -40
    n = np.arange(nfft * 4)
    x = np.exp(2j * np.pi * k * n / nfft).astype(np.complex64)[:, None]
    starts = np.asarray([0, nfft, 2 * nfft], np.int32)
    fn = stft.make_sti_fn(nfft=nfft, window="boxcar")
    out = fn(jnp.asarray(x), jnp.asarray(starts))
    freqs = stft.shifted_freqs(nfft, sr)
    sxx = np.asarray(out["sxx_dbfs"])[0, 0]
    peak = int(np.argmax(sxx))
    assert freqs[peak] == pytest.approx(k * sr / nfft)
    assert sxx[peak] == pytest.approx(0.0, abs=1e-3)  # 0 dBFS


def test_welch_reduces_variance():
    """True nint averaging must reduce PSD variance on white noise —
    the behavioral fix over the reference's silent truncation."""
    rng = np.random.default_rng(11)
    nfft, nint, ntime = 64, 16, 4
    nsamp = nfft * nint * ntime
    x = ((rng.standard_normal((nsamp, 1)) + 1j * rng.standard_normal((nsamp, 1)))
         / np.sqrt(2)).astype(np.complex64)
    starts = np.arange(ntime, dtype=np.int32) * nfft * nint
    par = stft.make_sti_fn(nfft=nfft, nint=nint, mode="parity", return_linear=True)
    wel = stft.make_sti_fn(nfft=nfft, nint=nint, mode="welch", return_linear=True)
    p = np.asarray(par(jnp.asarray(x), jnp.asarray(starts))["sxx"])
    w = np.asarray(wel(jnp.asarray(x), jnp.asarray(starts))["sxx"])
    assert w.std() < p.std() / 2.5  # ~sqrt(16)=4x in expectation


@pytest.mark.parametrize("contiguous", [True, False])
def test_auto_impl_per_sub_big_kernel_when_multi_sub_overflows(
        monkeypatch, contiguous):
    """Big transforms whose MULTI-sub working set overflows the kernel's
    VMEM budget while one subchannel fits must run one pallas launch per
    plane pair (auto 'per-sub'), not drop to the 5-7x slower XLA FFT
    (2^20 nsub>=2 is the real case; budget shrunk here so 65536 nsub=2
    exercises it fast in interpret mode). Both the contiguous production
    layout and the gathered (arbitrary-start) path split correctly."""
    import jax as _jax

    from pyspectrogram_tpu.kernels import sti_pallas
    from pyspectrogram_tpu.ops import stft as stft_mod

    nfft, nint, nsub, ntime = 1 << 16, 2, 2, 2
    monkeypatch.setattr(sti_pallas, "BIG_VMEM_BUDGET", 7_000_000)
    assert sti_pallas.pallas_auto_profitable(nfft, nint, 1, "welch",
                                             contiguous=contiguous)
    assert not sti_pallas.pallas_supported(nfft, nint, nsub, "welch")

    # pretend we're on TPU so auto picks the kernel path, but force the
    # kernels themselves into interpret mode (we're really on CPU)
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    real_make = sti_pallas.make_pallas_sti_psd

    def make_interpret(**kw):
        return real_make(**{**kw, "interpret": True})

    monkeypatch.setattr(sti_pallas, "make_pallas_sti_psd", make_interpret)

    rng = np.random.default_rng(1)
    samples = rng.standard_normal(
        (nsub * 2, nfft * nint * ntime)).astype(np.float32)
    starts = np.arange(ntime, dtype=np.int32) * nfft * nint
    fn = stft_mod.make_sti_fn_pm(nfft=nfft, nint=nint, mode="welch",
                                 fft_impl="auto", contiguous=contiguous,
                                 eps=3e-15)
    got = fn(jnp.asarray(samples), jnp.asarray(starts))
    ref = stft_mod.make_sti_fn_pm(nfft=nfft, nint=nint, mode="welch",
                                  fft_impl="xla", contiguous=contiguous,
                                  eps=3e-15)(jnp.asarray(samples),
                                             jnp.asarray(starts))
    assert np.asarray(got["sxx_dbfs"]).shape == (ntime, nsub, nfft)
    np.testing.assert_allclose(np.asarray(got["sxx_dbfs"]),
                               np.asarray(ref["sxx_dbfs"]),
                               rtol=0, atol=2e-2)  # dB tolerance


def test_auto_impl_falls_back_to_xla_when_nsub_exceeds_vmem(monkeypatch):
    """fft_impl='auto' must re-evaluate pallas support with the ACTUAL nsub
    at trace time and fall back to XLA instead of raising (ADVICE round 1:
    nsub>=3 at nfft=32768/nint=4 crashed every auto-path consumer)."""
    import jax as _jax

    from pyspectrogram_tpu.kernels import sti_pallas
    from pyspectrogram_tpu.ops import stft as stft_mod

    nfft, nint, nsub, ntime = 4096, 4, 100, 4
    assert sti_pallas.pallas_auto_profitable(nfft, nint, 1, "welch")
    assert not sti_pallas.pallas_supported(nfft, nint, nsub, "welch")

    # pretend we're on TPU so auto would otherwise reach for the kernel,
    # and make any pallas build an immediate failure
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")

    def boom(**kw):  # pragma: no cover - failure path
        raise AssertionError("pallas kernel built for unsupported nsub")

    monkeypatch.setattr(sti_pallas, "make_pallas_sti_psd", boom)

    fn = stft_mod.make_sti_fn_pm(nfft=nfft, nint=nint, mode="welch",
                                 fft_impl="auto", eps=2e-15)
    rng = np.random.default_rng(0)
    samples = jnp.asarray(
        rng.standard_normal((nsub * 2, nfft * nint * ntime)).astype(np.float32))
    starts = jnp.asarray(
        np.arange(ntime, dtype=np.int32) * nfft * nint)
    out = fn(samples, starts)
    assert np.asarray(out["sxx_dbfs"]).shape == (ntime, nsub, nfft)
    assert np.isfinite(np.asarray(out["sxx_med_dbfs"])).all()


def test_reference_ntime_ceiling_structurally_supported():
    """The reference's ntime spinbox tops out at 100,000
    (drfview.py:501); a request at that ceiling must flow through the
    pipeline core + exact median without special-casing (the pallas
    median's VMEM gate routes this to the XLA bisection)."""
    nfft, ntime = 256, 100_000
    rng = np.random.default_rng(0)
    pm = (0.01 * rng.standard_normal((2, nfft * ntime))).astype(np.float32)
    starts = (np.arange(ntime) * nfft).astype(np.int32)
    out = stft.make_sti_fn_pm(nfft=nfft, contiguous=True)(
        jnp.asarray(pm), jnp.asarray(starts))
    sxx = np.asarray(out["sxx_dbfs"])
    assert sxx.shape == (ntime, 1, nfft)
    want = np.median(10 ** (sxx[:, 0, :] / 10), axis=0)
    got = 10 ** (np.asarray(out["sxx_med_dbfs"])[0] / 10)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_reference_nint_ceiling_structurally_supported():
    """The reference's nint spinbox tops out at 100,000 (drfview.py:489);
    true-welch averaging at that ceiling must run (the column kernel's
    block budget rejects it, so auto routes to XLA) and actually average:
    white noise over 1e5 segments leaves a near-flat PSD."""
    nfft, nint, ntime = 256, 100_000, 2
    rng = np.random.default_rng(0)
    pm = (0.01 * rng.standard_normal((2, nfft * nint * ntime))).astype(
        np.float32)
    starts = (np.arange(ntime) * nfft * nint).astype(np.int32)
    out = stft.make_sti_fn_pm(nfft=nfft, nint=nint, contiguous=True)(
        jnp.asarray(pm), jnp.asarray(starts))
    sxx = np.asarray(out["sxx_dbfs"])
    assert np.isfinite(sxx).all()
    assert sxx[0, 0].std() < 0.1  # ~0.013 dB measured; 1 seg is ~5.6 dB


@pytest.mark.parametrize("seed", [7, 19, 23])
def test_randomized_config_matches_oracle(seed):
    """Seeded random-config differential sweep: random (nfft, nint,
    ntime, nsub, mode, window) with random NON-CONTIGUOUS frame starts
    through make_sti_fn_pm must match the numpy oracle — the pinned-size
    tests cannot see interactions a random draw can (e.g. non-pow2 nfft
    x odd nint x hann)."""
    from pyspectrogram_tpu.ops import reference as oracle

    rng = np.random.default_rng(seed)
    nfft = int(rng.choice([32, 96, 128, 320, 512]))
    nint = int(rng.choice([1, 2, 3, 5]))
    ntime = int(rng.choice([2, 5, 13]))
    nsub = int(rng.choice([1, 3]))
    mode = str(rng.choice(["welch", "parity"]))
    window = ("kaiser", 1.7) if rng.random() < 0.5 else "hann"
    frame_len = nfft * nint
    nsamp = frame_len * ntime + int(rng.integers(0, frame_len))
    x = (rng.standard_normal((nsamp, nsub))
         + 1j * rng.standard_normal((nsamp, nsub))).astype(np.complex64)
    starts = np.sort(rng.choice(nsamp - frame_len + 1, size=ntime,
                                replace=False)).astype(np.int64)
    block = np.stack([x[s:s + frame_len] for s in starts], axis=1)
    _, sxx, med = oracle.sti_proc(block, 1e6, nfft, nint=nint, mode=mode,
                                  window=window)

    pm = np.empty((nsub * 2, nsamp), np.float32)
    pm[0::2] = x.real.T
    pm[1::2] = x.imag.T
    out = stft.make_sti_fn_pm(nfft=nfft, nint=nint, mode=mode,
                              window=window)(
        jnp.asarray(pm), jnp.asarray(starts.astype(np.int32)))
    got = stft.to_reference_layout(np.asarray(out["sxx_dbfs"]))
    np.testing.assert_allclose(got, oracle.to_dbfs(sxx), atol=0.05)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out["sxx_med_dbfs"]), -1, 0),
        oracle.to_dbfs(med), atol=0.05)
