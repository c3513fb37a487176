"""STI for giant FFTs: the transform itself sharded over the mesh.

For nfft beyond one core's VMEM budget (the reference allows up to 2^20,
reference: drfview.py:475), the per-column FFT runs as the distributed
4-step algorithm (see parallel.dist_fft): local DFT stage, twiddle, one
ICI all-to-all transpose, local DFT stage — SURVEY.md section 5's
"multi-device 4-step FFT" scaling tier. The rest of the STI chain
(window, |X|^2, Welch average, fftshift, median, dB) is elementwise over
the sharded frequency axis, so the all-to-all per segment is the only
collective; the time median needs none (time is unsharded).

Layout: a frame x reshapes to x2[p, q] = x[p*n2 + q] with the q axis
explicit and SHARDED (each device holds all p for its q-slice, which is
what makes stage 1 local). After the all-to-all the shard holds all q for
a k1-slice, making stage 2 local. Results come back as the "k-matrix"
(..., n1, n2) with X[n1*k2 + k1] = Xm[k1, k2], sharded over k1 rows —
contiguous shards of a coherent global array. ``to_freq_order`` converts
an assembled k-matrix to the natural fftshifted frequency axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pyspectrogram_tpu.ops.stft import median_over_time, to_dbfs
from pyspectrogram_tpu.ops.windows import WindowSpec, get_window
from pyspectrogram_tpu.parallel.dist_fft import split_for_devices


def frames_to_x2(frames_pm: np.ndarray, nfft: int, nseg: int, n1: int,
                 n2: int) -> np.ndarray:
    """Host reshape: (ntime, nsub, 2, nseg*nfft) plane-split frames ->
    (ntime, nsub, 2, nseg, n1, n2) — a free view (row-major)."""
    ntime, nsub = frames_pm.shape[:2]
    return frames_pm.reshape(ntime, nsub, 2, nseg, n1, n2)


def to_freq_order(kmatrix: np.ndarray) -> np.ndarray:
    """Assembled k-matrix (..., n1, n2) -> natural fftshifted (..., nfft).

    The distributed stages produce Xm[k1, k2] with frequency index
    k = n1*k2 + k1 (already rolled by nfft/2 along k2 on device), so the
    natural axis is the transpose-flatten.
    """
    a = np.asarray(kmatrix)
    n1, n2 = a.shape[-2:]
    return np.swapaxes(a, -1, -2).reshape(a.shape[:-2] + (n1 * n2,))


@functools.lru_cache(maxsize=16)
def make_bigfft_sti_fn(
    mesh: Mesh,
    axis: str,
    *,
    nfft: int,
    nint: int = 1,
    mode: str = "welch",
    window: WindowSpec = ("kaiser", 1.7),
    ref: float = 1.0,
    eps: float = 1e-15,
):
    """Jitted STI whose per-column FFT is distributed over ``mesh[axis]``.

    Returned ``f(x2)``:
      x2: (ntime, nsub, 2, nseg, n1, n2) float32 — or any real dtype
          (raw int16 planes transfer at half the bytes and widen on
          device) — see frames_to_x2; the last (q) axis sharded with
          ``f.input_sharding``;
    returns {"sxx_dbfs": (ntime, nsub, n1, n2) k-matrix dB, sharded over
    the n1 (k1) axis; "sxx_med_dbfs": (nsub, n1, n2) likewise} — convert
    assembled arrays with :func:`to_freq_order`.
    """
    ndev = mesh.shape[axis]
    n1, n2 = split_for_devices(nfft, ndev)
    nseg = nint if mode == "welch" else 1

    win64 = get_window(window, nfft)
    inv_scale = np.float32(
        1.0 / (float(win64.sum()) ** 2 * float(ref) ** 2 * nseg))
    win2 = win64.reshape(n1, n2).astype(np.float32)
    tw = np.exp(-2j * np.pi
                * np.outer(np.arange(n1), np.arange(n2)) / nfft)
    twr = tw.real.astype(np.float32)
    twi = tw.imag.astype(np.float32)

    def local(x2, winr, twr_s, twi_s):
        # x2 shard: (ntime, nsub, 2, nseg, n1, n2/ndev) — all p, a q-slice
        ntime, nsub = x2.shape[0], x2.shape[1]

        def one_seg(seg):
            # raw integer planes ship at half the bytes and widen here,
            # per shard (dBFS normalization rides inv_scale)
            xr = x2[:, :, 0, seg].astype(jnp.float32)
            xi = x2[:, :, 1, seg].astype(jnp.float32)
            c = jax.lax.complex(xr, xi) * winr
            # stage 1: DFT along p (full on this shard)
            y = jnp.fft.fft(c, axis=-2)
            y = y * jax.lax.complex(twr_s, twi_s)
            # all-to-all: trade the q shard for a k1 shard
            y = y.reshape(ntime, nsub, ndev, n1 // ndev, n2 // ndev)
            y = jax.lax.all_to_all(y, axis, split_axis=2, concat_axis=2,
                                   tiled=False)
            # axis 2 now indexes the SOURCE shard = global q block
            y = jnp.moveaxis(y, 2, 3).reshape(ntime, nsub, n1 // ndev, n2)
            # stage 2: DFT along q (full on this shard)
            X = jnp.fft.fft(y, axis=-1)
            return jnp.real(X) ** 2 + jnp.imag(X) ** 2

        p = one_seg(0)
        for seg in range(1, nseg):
            p = p + one_seg(seg)
        p = p * inv_scale                  # (ntime, nsub, n1/ndev, n2)
        # fftshift: k + nfft/2 <=> k2 += n2/2 — a local roll along k2
        p = jnp.roll(p, n2 // 2, axis=-1)
        p_med = median_over_time(p)        # (nsub, n1/ndev, n2)
        return to_dbfs(p, eps), to_dbfs(p_med, eps)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, None, None, None, axis),
                  P(None, axis), P(None, axis), P(None, axis)),
        out_specs=(P(None, None, axis, None), P(None, axis, None)),
        check_vma=False,
    )

    win_j = jnp.asarray(win2)
    twr_j = jnp.asarray(twr)
    twi_j = jnp.asarray(twi)

    @jax.jit
    def sti(x2: jax.Array) -> dict:
        sxx, med = fn(x2, win_j, twr_j, twi_j)
        return {"sxx_dbfs": sxx, "sxx_med_dbfs": med}

    sti.input_sharding = NamedSharding(
        mesh, P(None, None, None, None, None, axis))
    sti.n1n2 = (n1, n2)
    sti.nseg = nseg
    return sti
