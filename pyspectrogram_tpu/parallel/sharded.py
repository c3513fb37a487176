"""Multi-device STI via shard_map over a (time, chan) mesh.

Sharding layout (SURVEY.md section 2.3):
* sample buffer:  sharded over ``chan`` (subchannel slices), replicated
  over ``time`` — every device holds only its channels' samples;
* frame starts:   sharded over ``time`` — each device computes a disjoint
  block of STI columns (independent frame starts,
  reference: drfProc.py:159);
* sxx output:     sharded over (time, chan) — columns never leave their
  device unless the client asks for the assembled array;
* median PSD:     needs all columns per frequency bin, so the linear powers
  are all-gathered along ``time`` over ICI and reduced locally
  (replicated over time, sharded over chan).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax import shard_map

from pyspectrogram_tpu.ops.stft import (
    _to_complex,
    median_over_time,
    psd_frames,
    to_dbfs,
)
from pyspectrogram_tpu.ops.windows import WindowSpec, get_window
from pyspectrogram_tpu.parallel.mesh import CHAN_AXIS, TIME_AXIS


def make_sharded_sti_fn(
    mesh: Mesh,
    *,
    nfft: int,
    nint: int = 1,
    ntime_valid: int,
    mode: str = "welch",
    window: WindowSpec = ("kaiser", 1.7),
    ref: float = 1.0,
    eps: float = 1e-15,
    compute_dtype=jnp.complex64,
):
    """Jitted multi-device STI.

    Returned ``f(samples, starts)``:
      samples: (nsamp, nsub[, 2]) — nsub divisible by the chan-axis size;
      starts:  (ntime_padded,) int32 — divisible by the time-axis size;
               only the first ``ntime_valid`` columns count for the median.
    Returns {"sxx_dbfs": (ntime_padded, nsub, nfft) sharded (time, chan),
             "sxx_med_dbfs": (nsub, nfft) sharded (chan,)}.
    """
    win64 = get_window(window, nfft)
    inv_scale = 1.0 / (float(win64.sum()) ** 2 * float(ref) ** 2)
    real_dtype = jnp.float64 if compute_dtype == jnp.complex128 else jnp.float32
    win = jnp.asarray(win64.astype(real_dtype))
    frame_len = nfft * nint if mode == "welch" else nfft

    def local_sti(samples, starts):
        offs = jnp.arange(frame_len, dtype=starts.dtype)
        idx = starts[:, None] + offs[None, :]
        frames = jnp.moveaxis(jnp.take(samples, idx, axis=0), 1, 2)
        x = _to_complex(frames, real_dtype).astype(compute_dtype)
        if mode == "welch":
            x = x.reshape(x.shape[0], x.shape[1], nint, nfft)
            p = psd_frames(x, win, inv_scale).mean(axis=2)
        else:
            p = psd_frames(x, win, inv_scale)
        return jnp.fft.fftshift(p, axes=-1)  # (ntime_local, nsub_local, nfft)

    def sharded(samples, starts):
        p_local = local_sti(samples, starts)
        # gather all columns of my channel shard for the time median
        p_all = jax.lax.all_gather(p_local, TIME_AXIS, axis=0, tiled=True)
        p_med = median_over_time(p_all, ntime_valid)  # (nsub_local, nfft)
        return {
            "sxx_dbfs": to_dbfs(p_local, eps),
            "sxx_med_dbfs": to_dbfs(p_med, eps),
        }

    def specs_for(samples_ndim):
        in_specs = (
            # (nsamp, nsub) or (nsamp, nsub, 2): shard the subchannel axis
            P(*([None, CHAN_AXIS] + [None] * (samples_ndim - 2))),
            P(TIME_AXIS),
        )
        out_specs = {
            "sxx_dbfs": P(TIME_AXIS, CHAN_AXIS, None),
            "sxx_med_dbfs": P(CHAN_AXIS, None),
        }
        return in_specs, out_specs

    @functools.lru_cache(maxsize=8)
    def build(samples_ndim: int):
        in_specs, out_specs = specs_for(samples_ndim)
        fn = shard_map(
            sharded, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
        return jax.jit(fn)

    def apply(samples, starts):
        return build(np.ndim(samples))(samples, starts)

    apply.input_shardings = lambda samples_ndim=2: tuple(
        NamedSharding(mesh, s) for s in specs_for(samples_ndim)[0]
    )
    return apply
