"""TPU-native STI/PSD compute core (JAX/XLA).

This replaces the reference's compute chain — per-column reads, Kaiser
window, scipy periodogram, fftshift, median, dB (reference:
drfProc.py:300-310, drfProc.py:364-403) — with one jitted device program:

    strided frame gather -> window multiply -> batched complex FFT ->
    |X|^2 -> (Welch average) -> fftshift -> dB ; median PSD across time

Design choices (TPU-first, see SURVEY.md section 7):
* Static shapes everywhere: (ntime, nsub, nfft) with the FFT axis last, so
  XLA tiles the batch over lanes/sublanes and fuses all elementwise work
  into the FFT's neighborhood.
* dBFS normalization (x / full_scale_ref, reference: drfProc.py:129) is
  folded into the power scale (1/(ref^2 * win_sum^2)) — raw integer samples
  can be shipped to HBM unconverted (half the transfer bytes) and
  normalized for free.
* "parity" mode gathers only nfft samples per column, reproducing the
  reference's verified truncation semantics (scipy periodogram crops to the
  first nfft samples when nint > 1; reference: drfProc.py:387-396);
  "welch" gathers nfft*nint and truly averages nint segment powers.
* The FFT implementation is pluggable (`fft_impl`): "xla" uses the XLA FFT;
  "gemm" uses the fused Pallas GEMM-FFT kernel (pyspectrogram_tpu.kernels).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pyspectrogram_tpu.ops.windows import WindowSpec, get_window


def pack_complex_host(x: np.ndarray) -> np.ndarray:
    """complex (..., ) host array -> real (..., 2) plane-packed view (zero copy).

    The canonical host->device representation: some TPU transports do not
    implement complex-dtype transfers at all, packed planes halve transfer
    bytes for raw integer captures, and a complex64 array's memory IS
    (float32, float32) pairs — so this is free.
    """
    x = np.ascontiguousarray(x)
    if x.dtype.kind != "c":
        raise ValueError(f"expected complex array, got {x.dtype}")
    real = np.dtype(f"f{x.dtype.itemsize // 2}")
    return x.view(real).reshape(x.shape + (2,))


def gather_frames(samples: jax.Array, starts: jax.Array, frame_len: int) -> jax.Array:
    """Gather strided frames from a sample buffer.

    samples: (nsamp, nsub[, 2]) — trailing 2 = packed real/imag planes.
    starts:  (ntime,) int32 frame-start offsets (relative to buffer start).
    Returns (ntime, nsub, frame_len[, 2]).

    Equivalent of the reference's per-column HDF5 read loop
    (reference: drfProc.py:159-166), done on-device from a resident buffer.
    """
    offs = jnp.arange(frame_len, dtype=starts.dtype)
    idx = starts[:, None] + offs[None, :]            # (ntime, frame_len)
    frames = jnp.take(samples, idx, axis=0)          # (ntime, frame_len, nsub[,2])
    return jnp.moveaxis(frames, 1, 2)                # (ntime, nsub, frame_len[,2])


def _to_complex(frames: jax.Array, real_dtype) -> jax.Array:
    """(..., 2) packed real/imag planes or complex array -> complex."""
    if jnp.issubdtype(frames.dtype, jnp.complexfloating):
        return frames
    if frames.shape[-1] != 2:
        raise ValueError(
            "real-valued sample buffers must pack planes as (..., 2); got "
            f"shape {frames.shape} dtype {frames.dtype}"
        )
    return jax.lax.complex(
        frames[..., 0].astype(real_dtype), frames[..., 1].astype(real_dtype)
    )


def psd_frames(
    frames: jax.Array,
    window: jax.Array,
    power_scale: float,
    fft_fn=jnp.fft.fft,
) -> jax.Array:
    """Windowed two-sided 'spectrum'-scaled periodogram of (..., nfft)
    complex frames."""
    real_dtype = jnp.float64 if frames.dtype == jnp.complex128 else jnp.float32
    xw = frames * window.astype(real_dtype)
    X = fft_fn(xw)
    return (jnp.real(X) ** 2 + jnp.imag(X) ** 2) * jnp.asarray(
        power_scale, real_dtype
    )


@functools.lru_cache(maxsize=256)
def make_sti_fn(
    *,
    nfft: int,
    nint: int = 1,
    mode: str = "welch",
    window: WindowSpec = ("kaiser", 1.7),
    ref: float = 1.0,
    eps: float = 1e-15,
    fft_impl: str = "xla",
    return_linear: bool = False,
    compute_dtype=jnp.complex64,
):
    """Build a jitted STI function for fixed (nfft, nint, mode, window).

    The returned function has signature ``f(samples, starts)`` with
      samples: (nsamp, nsub) complex — or (nsamp, nsub, 2) packed
               real/imag planes in any real dtype (e.g. raw int16);
      starts:  (ntime,) int32 frame starts relative to the buffer;
    and returns a dict with
      sxx_dbfs:     (ntime, nsub, nfft)  fftshifted STI in dBFS;
      sxx_med_dbfs: (nsub, nfft)         median-over-time PSD in dBFS;
      (+ sxx, sxx_med linear power when ``return_linear``).

    Output layout is TPU-native (time-major); use
    :func:`to_reference_layout` for the reference's (nfft, ntime, nsub).
    """
    win64 = get_window(window, nfft)  # float64 on host
    inv_scale = 1.0 / (float(win64.sum()) ** 2 * float(ref) ** 2)
    frame_len = nfft * nint if mode == "welch" else nfft
    if mode not in ("parity", "welch"):
        raise ValueError(f"mode must be 'parity' or 'welch', got {mode!r}")

    if fft_impl == "xla":
        fft_fn = jnp.fft.fft
    elif fft_impl == "gemm":
        from pyspectrogram_tpu.kernels.gemm_fft import make_gemm_fft
        fft_fn = make_gemm_fft(nfft)
    else:
        raise ValueError(f"unknown fft_impl {fft_impl!r}")

    real_dtype = jnp.float64 if compute_dtype == jnp.complex128 else jnp.float32
    win = win64.astype(real_dtype)

    @jax.jit
    def sti_fn(samples: jax.Array, starts: jax.Array) -> dict:
        frames = gather_frames(samples, starts, frame_len)
        x = _to_complex(frames, real_dtype).astype(compute_dtype)
        if mode == "welch":
            x = x.reshape(x.shape[0], x.shape[1], nint, nfft)
            p = psd_frames(x, win, inv_scale, fft_fn).mean(axis=2)
        else:
            p = psd_frames(x, win, inv_scale, fft_fn)
        p = jnp.fft.fftshift(p, axes=-1)              # (ntime, nsub, nfft)
        p_med = jnp.median(p, axis=0)                 # (nsub, nfft)
        out = {
            "sxx_dbfs": to_dbfs(p, eps),
            "sxx_med_dbfs": to_dbfs(p_med, eps),
        }
        if return_linear:
            out["sxx"] = p
            out["sxx_med"] = p_med
        return out

    return sti_fn


def to_dbfs(x: jax.Array, eps: float = 1e-15) -> jax.Array:
    """10*log10(x + eps) — the reference's dB conversion
    (reference: drfProc.py:308-310)."""
    return 10.0 * jnp.log10(x + jnp.asarray(eps, x.dtype))


def to_reference_layout(sxx: np.ndarray) -> np.ndarray:
    """(ntime, nsub, nfft) device layout -> (nfft, ntime, nsub) reference
    layout (reference: drfProc.py:365)."""
    return np.moveaxis(np.asarray(sxx), -1, 0)


def shifted_freqs(nfft: int, sample_rate) -> np.ndarray:
    """fftshifted two-sided frequency axis in Hz, float64 on host
    (reference: drfProc.py:398, drfview.py:988)."""
    return np.fft.fftshift(np.fft.fftfreq(nfft, 1.0 / float(sample_rate)))
