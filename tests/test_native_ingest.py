"""Native C++ ingest kernels vs numpy fallback (bit-identical)."""

import numpy as np
import pytest

from pyspectrogram_tpu.native import ingest


def test_native_builds_and_loads():
    # The toolchain is part of the supported environment; if g++ is absent
    # the numpy fallback covers functionality (other tests), but where a
    # compiler exists the native path must come up.
    import shutil

    if shutil.which("g++") is None:
        pytest.skip("no g++")
    assert ingest.native_available()


def test_assemble_plane_major_c64_matches_numpy():
    rng = np.random.default_rng(0)
    span = (rng.standard_normal((5000, 3)) + 1j * rng.standard_normal((5000, 3))
            ).astype(np.complex64)
    starts = np.asarray([0, 17, 1234, 4000], np.int64)
    frame_len = 1000
    got = ingest.assemble_plane_major(span, starts, frame_len)
    assert got.shape == (6, 4000) and got.dtype == np.float32
    want = np.empty_like(got)
    ingest._assemble_pm_numpy(span, starts, frame_len, want)
    np.testing.assert_array_equal(got, want)
    # spot-check semantics
    np.testing.assert_array_equal(got[2, 1000:1010], span[17:27, 1].real)
    np.testing.assert_array_equal(got[5, 3000:3005], span[4000:4005, 2].imag)


def test_assemble_plane_major_i16():
    rng = np.random.default_rng(1)
    dt = np.dtype([("r", np.int16), ("i", np.int16)])
    span = np.zeros((2000, 2), dt)
    span["r"] = rng.integers(-1000, 1000, (2000, 2))
    span["i"] = rng.integers(-1000, 1000, (2000, 2))
    starts = np.asarray([0, 512, 1024], np.int64)
    got = ingest.assemble_plane_major(span, starts, 512)
    assert got.dtype == np.int16 and got.shape == (4, 1536)
    np.testing.assert_array_equal(got[0, 512:520], span["r"][512:520, 0])
    np.testing.assert_array_equal(got[3, 1024:1030], span["i"][1024:1030, 1])


def test_deinterleave_plane_major():
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((777, 2)) + 1j * rng.standard_normal((777, 2))
         ).astype(np.complex64)
    out = ingest.deinterleave_plane_major(x)
    np.testing.assert_array_equal(out[0], x[:, 0].real)
    np.testing.assert_array_equal(out[1], x[:, 0].imag)
    np.testing.assert_array_equal(out[2], x[:, 1].real)
    np.testing.assert_array_equal(out[3], x[:, 1].imag)


def test_packaged_native_source_in_sync():
    """The in-package copy of the ingest kernels (shipped in wheels) must
    match the canonical csrc/ source byte-for-byte (csrc/Makefile `sync`
    refreshes it)."""
    from pathlib import Path

    import pyspectrogram_tpu.native as native_pkg

    pkg = Path(native_pkg.__file__).parent / "pstpu_ingest.cpp"
    dev = Path(native_pkg.__file__).parents[2] / "csrc" / "pstpu_ingest.cpp"
    if not dev.exists():
        import pytest

        pytest.skip("installed layout: no csrc/ tree to compare")
    assert pkg.read_bytes() == dev.read_bytes()


def test_assemble_plane_major_rejects_out_of_span():
    """The C kernels trust starts (a bad value is a silent heap overread)
    and the numpy path failed with an obscure broadcast error — both now
    share one explicit contract check."""
    span = np.zeros((100, 1), np.complex64)
    with pytest.raises(ValueError, match="out of span"):
        ingest.assemble_plane_major(span, np.asarray([50], np.int64), 64)
    with pytest.raises(ValueError, match="out of span"):
        ingest.assemble_plane_major(span, np.asarray([-1], np.int64), 10)
    # the boundary case is legal: last frame ends exactly at span end
    out = ingest.assemble_plane_major(span, np.asarray([36], np.int64), 64)
    assert out.shape == (2, 64)
