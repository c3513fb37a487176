"""Distributed 4-step FFT on the virtual 8-device mesh vs np.fft."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyspectrogram_tpu.parallel import make_mesh
from pyspectrogram_tpu.parallel.dist_fft import (
    make_distributed_fft,
    reference_order,
    split_for_devices,
)


def test_split_for_devices():
    assert split_for_devices(1 << 16, 8) == (256, 256)
    assert split_for_devices(1 << 20, 8) == (1024, 1024)
    with pytest.raises(ValueError):
        split_for_devices(1000, 8)


def _run(fft, x):
    """Feed a complex (nfft,) host vector through the collective."""
    n1, n2 = fft.n1n2
    x2 = np.asarray(x).reshape(n1, n2)
    xr = jax.device_put(jnp.asarray(x2.real, jnp.float32), fft.input_sharding)
    xi = jax.device_put(jnp.asarray(x2.imag, jnp.float32), fft.input_sharding)
    Xr, Xi = fft(xr, xi)
    return (reference_order(np.asarray(Xr))
            + 1j * reference_order(np.asarray(Xi))), (Xr, Xi)


@pytest.mark.parametrize("nfft", [1 << 12, 1 << 16])
def test_distributed_fft_matches_numpy(nfft):
    mesh = make_mesh(time_parallel=8, chan_parallel=1)
    fft = make_distributed_fft(mesh, "time", nfft)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(nfft) + 1j * rng.standard_normal(nfft))
    got, (Xr, _) = _run(fft, x)
    want = np.fft.fft(x)
    # Tolerance derivation: f32 FFT stages + f32 twiddles give a relative
    # error ~ eps_f32 * sqrt(log2 N) per bin vs the f64 oracle, but the
    # error is ABSOLUTE in the column energy E = ||x|| * sqrt(N) (each
    # output bin sums N rotated inputs). For N=2^16 white noise that is
    # ~1.2e-7 * 256 * sqrt(16) ~ 1e-4 of |X|max; 2e-2*max bounds it with
    # two orders of margin while any layout/twiddle bug (wrong bin order,
    # conjugate twiddle) mis-places whole tones and fails by >50% of max.
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-2 * np.abs(want).max())
    # output sharded over rows
    assert Xr.sharding.spec == jax.sharding.PartitionSpec("time")


def test_distributed_fft_impulse_pins_bin_order():
    """delta[n0] -> X[k] = exp(-2i pi k n0 / N) exactly: a unit-magnitude
    spiral that is DIFFERENT in every bin, so any error in the
    X[n1*k2+k1] = Xm[k1,k2] output mapping (reference_order) or in the
    all-to-all transpose moves phases and fails loudly."""
    nfft = 1 << 12
    mesh = make_mesh(time_parallel=8, chan_parallel=1)
    fft = make_distributed_fft(mesh, "time", nfft)
    for n0 in (0, 1, 517, nfft - 1):
        x = np.zeros(nfft, np.complex64)
        x[n0] = 1.0
        got, _ = _run(fft, x)
        k = np.arange(nfft)
        want = np.exp(-2j * np.pi * k * n0 / nfft)
        np.testing.assert_allclose(got, want, atol=5e-6)


def test_distributed_fft_tone_pins_twiddle():
    """exp(+2i pi k0 n / N) -> N*delta[k0]. All off-bin energy comes from
    the twiddle multiply; a conjugated or mis-indexed twiddle spreads the
    tone across an entire k2 row instead of one bin."""
    nfft = 1 << 12
    mesh = make_mesh(time_parallel=8, chan_parallel=1)
    fft = make_distributed_fft(mesh, "time", nfft)
    n = np.arange(nfft)
    for k0 in (3, 1033, nfft // 2):  # k0=1033 exercises both k1 and k2 != 0
        x = np.exp(2j * np.pi * k0 * n / nfft).astype(np.complex64)
        got, _ = _run(fft, x)
        assert np.argmax(np.abs(got)) == k0
        np.testing.assert_allclose(got[k0], nfft, rtol=1e-5)
        off = np.abs(np.delete(got, k0))
        assert off.max() < 2e-3 * nfft  # f32 leakage floor, not a bug


def test_distributed_fft_parseval():
    nfft = 1 << 14
    mesh = make_mesh(time_parallel=8, chan_parallel=1)
    fft = make_distributed_fft(mesh, "time", nfft)
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(nfft) + 1j * rng.standard_normal(nfft))
    got, _ = _run(fft, x)
    np.testing.assert_allclose(np.sum(np.abs(got) ** 2) / nfft,
                               np.sum(np.abs(x) ** 2), rtol=1e-5)


@pytest.mark.parametrize("tp,cp", [(4, 2), (2, 4), (4, 1)])
def test_distributed_fft_on_2d_mesh(tp, cp):
    """The collective only names the `time` axis; on a 2D (time, chan)
    mesh the transform must replicate over chan and still match —
    this is exactly how big_sti uses it under a chan-sharded pipeline.
    (4,1) additionally pins a non-8 device count for the all-to-all."""
    nfft = 1 << 12
    mesh = make_mesh(devices=jax.devices()[: tp * cp],
                     time_parallel=tp, chan_parallel=cp)
    fft = make_distributed_fft(mesh, "time", nfft)
    rng = np.random.default_rng(9)
    x = (rng.standard_normal(nfft) + 1j * rng.standard_normal(nfft))
    got, _ = _run(fft, x)
    want = np.fft.fft(x)
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=2e-2 * np.abs(want).max())


def test_distributed_fft_full_reference_ceiling():
    """nfft = 2^20 — the reference GUI's spinbox maximum
    (reference: drfview.py:475) — splits 1024x1024 and matches numpy."""
    nfft = 1 << 20
    mesh = make_mesh(time_parallel=8, chan_parallel=1)
    fft = make_distributed_fft(mesh, "time", nfft)
    assert fft.n1n2 == (1024, 1024)
    rng = np.random.default_rng(11)
    x = (rng.standard_normal(nfft) + 1j * rng.standard_normal(nfft))
    got, _ = _run(fft, x)
    want = np.fft.fft(x)
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=2e-2 * np.abs(want).max())
