"""Multi-device sharding on the 8-device virtual CPU mesh (SURVEY.md §4.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pyspectrogram_tpu.io.reader import RFDataset
from pyspectrogram_tpu.ops import stft
from pyspectrogram_tpu.parallel import (
    make_mesh,
    make_sharded_sti_fn,
    pad_starts,
)


def _buffer(nsamp, nsub, seed=0):
    """time-major packed (for the single-device oracle) + plane-major."""
    rng = np.random.default_rng(seed)
    packed = rng.standard_normal((nsamp, nsub, 2)).astype(np.float32)
    pm = np.ascontiguousarray(
        np.moveaxis(packed, 0, -1).reshape(nsub * 2, nsamp))
    return packed, pm


def test_mesh_shapes():
    assert make_mesh().devices.shape == (8, 1)
    assert make_mesh(time_parallel=4, chan_parallel=2).devices.shape == (4, 2)
    assert make_mesh(chan_parallel=2).devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(time_parallel=3)


def test_pad_starts():
    s = np.asarray([0, 10, 20], np.int32)
    padded, n = pad_starts(s, 4)
    assert n == 3 and list(padded) == [0, 10, 20, 20]
    same, n2 = pad_starts(padded, 4)
    assert n2 == 4 and same is padded


@pytest.mark.parametrize("tp,cp", [(8, 1), (4, 2), (2, 4)])
def test_sharded_matches_single_device(tp, cp):
    nfft, nint, ntime, nsub = 64, 2, 16, 4
    nsamp = nfft * nint * ntime + 32
    packed, pm = _buffer(nsamp, nsub)
    starts = np.linspace(0, nsamp - nfft * nint, ntime, dtype=np.int32)

    single = stft.make_sti_fn(nfft=nfft, nint=nint, mode="welch")
    want = single(jnp.asarray(packed), jnp.asarray(starts))

    mesh = make_mesh(time_parallel=tp, chan_parallel=cp)
    sharded = make_sharded_sti_fn(
        mesh, nfft=nfft, nint=nint, ntime_valid=ntime, mode="welch"
    )
    got = sharded(jnp.asarray(pm), jnp.asarray(starts))

    np.testing.assert_allclose(
        np.asarray(got["sxx_dbfs"]), np.asarray(want["sxx_dbfs"]), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["sxx_med_dbfs"]), np.asarray(want["sxx_med_dbfs"]),
        atol=2e-3,
    )


def test_sharded_with_padded_time_axis():
    """ntime not divisible by the time axis: padded columns must not bias
    the median."""
    nfft, ntime, nsub = 64, 13, 2
    nsamp = nfft * ntime + 200
    packed, pm = _buffer(nsamp, nsub, seed=3)
    starts = np.linspace(0, nsamp - nfft, ntime, dtype=np.int32)
    padded, nvalid = pad_starts(starts, 8)
    assert nvalid == 13 and len(padded) == 16

    single = stft.make_sti_fn(nfft=nfft)
    want = single(jnp.asarray(packed), jnp.asarray(starts))

    mesh = make_mesh()
    sharded = make_sharded_sti_fn(mesh, nfft=nfft, ntime_valid=nvalid)
    got = sharded(jnp.asarray(pm), jnp.asarray(padded))
    np.testing.assert_allclose(
        np.asarray(got["sxx_dbfs"])[:nvalid], np.asarray(want["sxx_dbfs"]),
        atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got["sxx_med_dbfs"]), np.asarray(want["sxx_med_dbfs"]),
        atol=2e-3,
    )


def test_sharded_accepts_device_sharded_inputs():
    """Inputs pre-placed with the advertised shardings stay sharded."""
    nfft, ntime, nsub = 64, 16, 4
    nsamp = nfft * ntime
    packed, pm = _buffer(nsamp, nsub, seed=4)
    starts = np.linspace(0, nsamp - nfft, ntime, dtype=np.int32)
    mesh = make_mesh(time_parallel=4, chan_parallel=2)
    f = make_sharded_sti_fn(mesh, nfft=nfft, ntime_valid=ntime)
    s_sh, st_sh = f.input_shardings()
    samples_d = jax.device_put(jnp.asarray(pm), s_sh)
    starts_d = jax.device_put(jnp.asarray(starts), st_sh)
    out = f(samples_d, starts_d)
    assert out["sxx_dbfs"].sharding.spec == P("time", "chan")
    single = stft.make_sti_fn(nfft=nfft)
    want = single(jnp.asarray(packed), jnp.asarray(starts))
    np.testing.assert_allclose(
        np.asarray(out["sxx_dbfs"]), np.asarray(want["sxx_dbfs"]), atol=2e-3
    )


def test_sharded_pallas_impl_matches_xla():
    """Fused kernel inside shard_map (interpret mode on the CPU mesh)."""
    nfft, ntime, nsub = 256, 16, 2
    nsamp = nfft * ntime
    packed, pm = _buffer(nsamp, nsub, seed=6)
    starts = (np.arange(ntime) * nfft).astype(np.int32)
    mesh = make_mesh(time_parallel=8, chan_parallel=1)
    a = make_sharded_sti_fn(mesh, nfft=nfft, ntime_valid=ntime,
                            fft_impl="pallas")
    b = make_sharded_sti_fn(mesh, nfft=nfft, ntime_valid=ntime,
                            fft_impl="xla")
    out_a = a(jnp.asarray(pm), jnp.asarray(starts))
    out_b = b(jnp.asarray(pm), jnp.asarray(starts))
    np.testing.assert_allclose(np.asarray(out_a["sxx_dbfs"]),
                               np.asarray(out_b["sxx_dbfs"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_a["sxx_med_dbfs"]),
                               np.asarray(out_b["sxx_med_dbfs"]), atol=1e-3)


def test_sharded_ships_raw_int16_and_widens_on_device():
    """Raw int16 planes ship unconverted through the sharded path (half
    the transfer bytes, times one copy per replicated device) and widen
    per shard on device (VERDICT r2 weak #2)."""
    nfft, ntime, nsub = 64, 16, 2
    nsamp = nfft * ntime
    rng = np.random.default_rng(9)
    pm_i16 = rng.integers(-(1 << 12), 1 << 12,
                          size=(nsub * 2, nsamp)).astype(np.int16)
    starts = (np.arange(ntime) * nfft).astype(np.int32)
    ref = 2.0 ** 15.5  # the int16 dBFS rule (reference: drfProc.py:199-201)

    single = stft.make_sti_fn_pm(nfft=nfft, ref=ref)
    want = single(jnp.asarray(pm_i16), jnp.asarray(starts))

    mesh = make_mesh(time_parallel=4, chan_parallel=2)
    f = make_sharded_sti_fn(mesh, nfft=nfft, ntime_valid=ntime, ref=ref)
    s_sh, st_sh = f.input_shardings()
    samples_d = jax.device_put(jnp.asarray(pm_i16), s_sh)
    assert samples_d.dtype == jnp.int16  # raw across the boundary
    got = f(samples_d, jax.device_put(jnp.asarray(starts), st_sh))
    np.testing.assert_allclose(np.asarray(got["sxx_dbfs"]),
                               np.asarray(want["sxx_dbfs"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got["sxx_med_dbfs"]),
                               np.asarray(want["sxx_med_dbfs"]), atol=2e-3)


def test_pipeline_sharded_int16_capture_matches_single_device(
        int16_capture):
    """Full pipeline over the int16 fixture: mesh result == single-chip
    result, with the device block still int16 end to end."""
    from pyspectrogram_tpu.models.sti import StiPipeline
    from pyspectrogram_tpu.utils.config import SpectrogramConfig

    top, meta = int16_capture
    ds1, ds2 = RFDataset(top), RFDataset(top)
    cfg = SpectrogramConfig(nfft=128, nint=2, ntime=16)
    want = StiPipeline(ds1, cfg).compute()
    mesh = make_mesh(time_parallel=8, chan_parallel=1)
    got = StiPipeline(ds2, cfg, mesh=mesh).compute()
    np.testing.assert_allclose(got.sxx_dbfs, want.sxx_dbfs, atol=2e-3)
    np.testing.assert_allclose(got.sxx_med_dbfs, want.sxx_med_dbfs,
                               atol=2e-3)
