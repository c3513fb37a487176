"""VMEM-resident exact time-median: the whole bisection on one HBM read.

The reference takes a median PSD across STI time columns
(reference: drfProc.py:401). The XLA-level selection in ops.stft
(`_kth_smallest_f32`) is exact and sort-free but re-reads the full
(ntime, nsub, nfft) buffer once per bisection step — 33 HBM passes — and
at big nfft x ntime > 32 that median dominates the whole STI step (e.g.
65536x128: ~2.8 ms of a ~9.8 ms step). A radix-16 rewrite made it WORSE
(XLA materializes sibling count-reductions; see the negative-result note
on `_kth_smallest_f32`).

This kernel is the TPU-native answer: grid over nfft column tiles, load
each (ntime, nsub, TW) tile into VMEM ONCE, and run all 33 compare+count
steps on the resident tile — HBM traffic drops from 33 reads to one read
+ one row write. The bisection itself is the same verified float-bit
scheme as `_kth_smallest_f32` (exact for all normal floats); the even-n
second value uses the same count/min trick.

Mosaic layout note: the block takes the FULL (n, m) leading dims and
tiles only the lane axis — TPU block specs require the last two dims to
divide (8, 128) or equal the array dims, so a (n, 1, TW) block over
(n, m, nfft) is not lowerable; (n, m, TW) is, for any m.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

#: per-tile VMEM target: the (ntime, m, TW) f32 tile is double-buffered
#: by the pipeline, plus the int32 key view and loop temps live
#: alongside — 4 MB keeps the working set well inside the 16 MB scoped
#: default
TILE_BYTES_MAX = 4 * 1024 * 1024

#: lane-width cap for the loop state. The bisection carries ~dozens of
#: (1, m*TW) temps (lo/hi/mid/cnt + loop plumbing) and Mosaic pads each
#: to 8 sublanes, so scoped VMEM scales with m*TW REGARDLESS of n:
#: measured 92 MB at m*TW = 65536 (n = 8) vs 21 MB at m*TW = 8192
#: (n = 128). 8 K lanes keeps each padded temp at 256 KB.
MAX_LANE_WIDTH = 8192


def pick_tile_width(n: int, m: int, nfft: int) -> int:
    """Widest power-of-two lane multiple whose (n, m, TW) tile AND
    padded loop temps fit."""
    tw = LANE
    while tw * 2 <= nfft and nfft % (tw * 2) == 0 \
            and n * m * tw * 2 * 4 <= TILE_BYTES_MAX \
            and m * tw * 2 <= MAX_LANE_WIDTH:
        tw *= 2
    return tw


def median_pallas_supported(n: int, m: int, nfft: int) -> bool:
    return (n >= 2 and 1 <= m <= MAX_LANE_WIDTH // LANE
            and nfft >= LANE and nfft % LANE == 0
            and n * m * LANE * 4 <= TILE_BYTES_MAX)


def _flip(kb):
    """Sign-magnitude -> total-order int32 key (involution; same scheme
    as ops.stft._float_order_key)."""
    return kb ^ (jax.lax.shift_right_arithmetic(kb, 31)
                 & jnp.int32(0x7FFFFFFF))


@functools.lru_cache(maxsize=64)
def _make_median_kernel(n: int, m: int, nfft: int, interpret: bool):
    """(n, m, nfft) f32 -> (m, nfft) exact time-median.

    m == 1 lowers as a 2-D (n, nfft) array: a (n, 1, TW) block gives the
    middle dim a degenerate T(1, 128) sublane tiling — 8x VMEM inflation
    of every buffer (measured: 72 MB scoped for a (256, 1, 4096) ring
    median that should cost ~10 MB).
    """
    tw = pick_tile_width(n, m, nfft)
    k = (n + 1) // 2

    def kernel(x_ref, out_ref):
        # (n, m, tw) -> (n, m*tw): row-major flatten of contiguous lane
        # groups, a layout no-op
        x = x_ref[...].reshape(n, m * tw)
        kb = _flip(jax.lax.bitcast_convert_type(x, jnp.int32))
        lo = jnp.full((1, m * tw), jnp.int32(-0x7F800001), jnp.int32)
        hi = jnp.full((1, m * tw), jnp.int32(0x7F800000), jnp.int32)

        def body(_, lh):
            lo, hi = lh
            mid = (lo & hi) + jax.lax.shift_right_arithmetic(lo ^ hi, 1)
            cnt = (kb <= mid).astype(jnp.int32).sum(axis=0, keepdims=True)
            go_hi = cnt >= k
            return (jnp.where(go_hi, lo, mid + 1), jnp.where(go_hi, mid, hi))

        lo, hi = jax.lax.fori_loop(0, 33, body, (lo, hi))
        v1 = jax.lax.bitcast_convert_type(_flip(hi), jnp.float32)
        if n % 2:
            med = v1
        else:
            # mean with the (k+1)-th value: if duplicates of v1 span the
            # midpoint it IS the next value; else take min of the strictly
            # bigger values
            cnt_le = (x <= v1).astype(jnp.int32).sum(axis=0, keepdims=True)
            bigger = jnp.where(x > v1, x, jnp.float32(np.inf))
            v2 = jnp.where(cnt_le > k, v1,
                           bigger.min(axis=0, keepdims=True))
            med = 0.5 * (v1 + v2)
        out_ref[...] = med.reshape(out_ref.shape)

    if m == 1:
        in_spec = pl.BlockSpec((n, tw), lambda c: (0, c),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, tw), lambda c: (0, c),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((1, nfft), jnp.float32)
    else:
        in_spec = pl.BlockSpec((n, m, tw), lambda c: (0, 0, c),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, m, tw), lambda c: (0, 0, c),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((1, m, nfft), jnp.float32)
    call = pl.pallas_call(
        kernel,
        grid=(nfft // tw,),
        in_specs=[in_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
        # the double-buffered tile + int32 key view + compare temps run
        # ~5x TILE_BYTES_MAX; lift the 16 MB scoped-vmem software default
        # like the big STI kernel does (v5e: 128 MB physical)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            # the point of the kernel: bytes ~= one read + one row write
            flops=34 * n * m * nfft,
            bytes_accessed=n * m * nfft * 4 + m * nfft * 4,
            transcendentals=0,
        ),
    )

    def median(p):
        if m == 1:
            return call(p.reshape(n, nfft))[0][None]
        return call(p)[0]

    return median


def median_over_time_pallas(p: jax.Array, interpret: bool = False) -> jax.Array:
    """Exact median over axis 0 of an f32 (n, ..., nfft) array (traced;
    call inside jit). Caller must check :func:`median_pallas_supported`
    on (n, middle-product, last-dim)."""
    n = p.shape[0]
    nfft = p.shape[-1]
    mid_shape = p.shape[1:-1]
    m = int(np.prod(mid_shape, dtype=np.int64)) if mid_shape else 1
    fn = _make_median_kernel(n, m, nfft, interpret)
    out = fn(p.reshape(n, m, nfft))
    return out.reshape(*mid_shape, nfft)
