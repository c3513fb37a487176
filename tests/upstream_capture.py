"""Independent generator of upstream-`digital_rf`-shaped captures.

The upstream package is not installable in this environment, so format
interoperability is pinned from both directions without it:

* this module re-creates, with raw h5py and ONLY the published Digital RF
  v2 format rules (https://github.com/MITHaystack/digital_rf, also
  mirrored in docs/digital_rf_format.md), the exact on-disk artifacts the
  upstream writer produces — including attributes and layout variations
  our own writer never emits (longdouble ``samples_per_second``,
  ``H5Tget_order``/``H5Tget_offset``, uint64 cadence attrs, multi-run
  ``rf_data_index`` files, gapped non-continuous channels);
* tests/test_interop_upstream.py reads these "upstream golden" captures
  through our reader, and structurally checks our writer's output against
  the upstream reader's documented requirements.

This file is deliberately independent of ``pyspectrogram_tpu.io.writer`` /
``drf_format`` — the placement math is re-derived from the format spec so
a bug in the package cannot hide in the fixture.
"""

from __future__ import annotations

import datetime
from pathlib import Path

import numpy as np

SUBDIR_FMT = "%Y-%m-%dT%H-%M-%S"


def _storage(arr: np.ndarray) -> np.ndarray:
    """Upstream stores complex as an HDF5 compound {r, i} of the base
    scalar (h5py's native complex mapping for float bases)."""
    if arr.dtype.kind == "c":
        base = np.dtype(f"f{arr.dtype.itemsize // 2}")
        return np.ascontiguousarray(arr).view(np.dtype([("r", base), ("i", base)]))
    return arr


def _base_props(dtype: np.dtype):
    """(class, size, precision, is_complex) of the scalar base type,
    as upstream records them (H5T_INTEGER=0, H5T_FLOAT=1)."""
    dtype = np.dtype(dtype)
    if dtype.names is not None:
        base, is_complex = dtype["r"], True
    elif dtype.kind == "c":
        base, is_complex = np.dtype(f"f{dtype.itemsize // 2}"), True
    else:
        base, is_complex = dtype, False
    klass = 1 if base.kind == "f" else 0
    return klass, base.itemsize, base.itemsize * 8, is_complex


def write_upstream_capture(
    top,
    channel: str,
    blocks,
    *,
    sr_num: int,
    sr_den: int = 1,
    subdir_cadence_secs: int = 4,
    file_cadence_millisecs: int = 400,
    is_continuous: bool = True,
) -> None:
    """Write ``blocks`` = [(global_start_sample, (n, nsub) array), ...]
    (ascending, non-overlapping) exactly as the upstream writer lays them
    out on disk.
    """
    import h5py

    assert subdir_cadence_secs * 1000 % file_cadence_millisecs == 0
    top = Path(top)
    chan_dir = top / channel
    chan_dir.mkdir(parents=True, exist_ok=True)

    blocks = [(int(g), np.atleast_2d(np.asarray(a))) for g, a in blocks]
    nsub = blocks[0][1].shape[1]
    dtype = blocks[0][1].dtype
    klass, size, precision, is_complex = _base_props(dtype)

    # ---- channel properties, full upstream attribute set ----
    with h5py.File(chan_dir / "drf_properties.h5", "w") as f:
        a = f.attrs
        a["H5Tget_class"] = np.int64(klass)
        a["H5Tget_size"] = np.int64(size)
        a["H5Tget_order"] = np.int64(0)      # little-endian
        a["H5Tget_offset"] = np.int64(0)
        a["H5Tget_precision"] = np.int64(precision)
        a["subdir_cadence_secs"] = np.uint64(subdir_cadence_secs)
        a["file_cadence_millisecs"] = np.uint64(file_cadence_millisecs)
        a["sample_rate_numerator"] = np.uint64(sr_num)
        a["sample_rate_denominator"] = np.uint64(sr_den)
        a["samples_per_second"] = np.longdouble(sr_num) / np.longdouble(sr_den)
        a["is_complex"] = np.bool_(is_complex)
        a["is_continuous"] = np.bool_(is_continuous)
        a["num_subchannels"] = np.int64(nsub)
        a["epoch"] = "1970-01-01T00:00:00Z"
        a["digital_rf_time_description"] = (
            "All times in this format are in number of samples since the "
            "epoch in the epoch attribute."
        )
        a["digital_rf_version"] = "2.5.4"

    # ---- per-sample file placement (spec: floor-ms, align to cadence) ----
    per_file: dict = {}  # file_ms -> list of (global_start, rows)
    for g0, arr in blocks:
        n = arr.shape[0]
        g = g0 + np.arange(n, dtype=object)  # unbounded ints, spec-exact
        ms = np.array([(int(i) * 1000 * sr_den) // sr_num for i in g])
        fms = ms - ms % file_cadence_millisecs
        cut = np.flatnonzero(np.diff(fms)) + 1
        for seg_lo, seg_hi in zip(
            np.concatenate([[0], cut]), np.concatenate([cut, [n]])
        ):
            per_file.setdefault(int(fms[seg_lo]), []).append(
                (g0 + int(seg_lo), arr[seg_lo:seg_hi])
            )

    for file_ms, runs in sorted(per_file.items()):
        subdir_s = (file_ms // 1000) - (file_ms // 1000) % subdir_cadence_secs
        subdir = chan_dir / datetime.datetime.fromtimestamp(
            subdir_s, datetime.timezone.utc
        ).strftime(SUBDIR_FMT)
        subdir.mkdir(parents=True, exist_ok=True)
        name = f"rf@{file_ms // 1000}.{file_ms % 1000:03d}.h5"
        data = np.concatenate([_storage(r) for _, r in runs], axis=0)
        index, row = [], 0
        for g, r in runs:
            # merge runs contiguous in both sample index and rows
            if index and index[-1][0] + (row - index[-1][1]) == g:
                pass
            else:
                index.append((g, row))
            row += len(r)
        with h5py.File(subdir / name, "w") as f:
            f.create_dataset("rf_data", data=data)
            f.create_dataset(
                "rf_data_index", data=np.asarray(index, dtype=np.uint64)
            )
