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


@pytest.mark.parametrize("nfft", [1 << 12, 1 << 16])
def test_distributed_fft_matches_numpy(nfft):
    mesh = make_mesh(time_parallel=8, chan_parallel=1)
    fft = make_distributed_fft(mesh, "time", nfft)
    n1, n2 = fft.n1n2
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(nfft) + 1j * rng.standard_normal(nfft))
    x2 = x.reshape(n1, n2)
    xr = jax.device_put(jnp.asarray(x2.real, jnp.float32), fft.input_sharding)
    xi = jax.device_put(jnp.asarray(x2.imag, jnp.float32), fft.input_sharding)
    Xr, Xi = fft(xr, xi)
    got = reference_order(np.asarray(Xr)) + 1j * reference_order(np.asarray(Xi))
    want = np.fft.fft(x)
    # float32 distributed vs float64 numpy
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-2 * np.abs(want).max())
    # output sharded over rows
    assert Xr.sharding.spec == jax.sharding.PartitionSpec("time")
