"""Fused Pallas STI kernel: window -> GEMM-FFT -> |X|^2 -> Welch average ->
fftshift in one VMEM-resident pass per STI column.

This is the fused kernel the north star mandates (BASELINE.json): the
reference's window -> periodogram chain (reference: drfProc.py:300-310,
364-403) becomes one Pallas program per STI column:

* the strided frame gather stays in XLA (vmapped dynamic_slice lowers to
  contiguous HBM block copies and is near memory speed-of-light; arbitrary
  frame starts cannot be tile-aligned for an in-kernel DMA, so fusing the
  gather would force 128-sample start alignment and break reference
  parity);
* each grid step receives one column's frames as an auto-pipelined VMEM
  block (Pallas double-buffers blocks across grid steps for free);
* the FFT runs as two MXU matmuls + twiddle (see kernels.gemm_fft for the
  math) with the factor split lane-aligned (n2 = 128), so each (nfft,)
  segment reshapes to its natural (n1, 128) VMEM tiling for free;
* |X|^2 accumulates across nint segments in VMEM; the fftshift becomes a
  static half-swap on the transposed (n2, n1) power tile, whose row-major
  flattening IS the natural frequency order (k = n1*k2 + k1);
* output is LINEAR fftshifted power (ntime, nsub, nfft); dB and the
  median ride in XLA where they fuse with downstream consumers.

Input layout: plane-major float32 ``(nsub*2, nsamp)`` — row 2s is
subchannel s's real plane, row 2s+1 its imaginary plane — so gathers are
contiguous row slices.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyspectrogram_tpu.kernels.gemm_fft import dft_mat, twiddle_mat
from pyspectrogram_tpu.ops.windows import WindowSpec, get_window

# lane-aligned split: n2 fixed to the TPU lane width so segment reshapes
# (nfft,) -> (n1, 128) are layout no-ops
LANE = 128

# VMEM budget: one column block (nsub*2 x frame_len f32) is double-buffered
# by the pipeline. The column kernel raises the 16 MB scoped-VMEM software
# default like the big kernel does (v5e: 128 MB physical), so wide
# multi-subchannel / deep-integration configs stay on the fused path
# instead of falling back to XLA.
MAX_BLOCK_BYTES = 24 * 1024 * 1024


def lane_factors(nfft: int) -> Tuple[int, int]:
    if nfft % LANE or (nfft & (nfft - 1)):
        raise ValueError("pallas STI kernel needs power-of-two nfft >= 256")
    return nfft // LANE, LANE


#: transforms at or above this size use the 3-stage per-segment-grid
#: kernel (nfft = A*B*C GEMM factorization, see _make_big3_sti_psd).
#: The stage count is a MEASURED optimum, not a model: both a 2-stage
#: square split (65536 = 256*256; factors 256-1024) and a 4-stage
#: near-cubic split (2^20 = 32*16*16*128; factors 8-32) were built,
#: oracle-verified, and timed with >= 50 amortized iterations — the
#: 2-stage lost 9.0-9.6 vs 9.8-9.9 GS/s at 65536 and the 4-stage lost
#: 6.6/7.3 vs 7.7/9.0 GS/s at 2^19/2^20 despite 1.45-1.67x fewer
#: complex MACs. DFT factors of 32-128 are this MXU's efficient range:
#: bigger factors pay more MACs than their pass-density saves, smaller
#: ones underfill the contraction depth and add a full-segment
#: transpose + twiddle per extra stage. Both losers were deleted (this
#: note + docs/architecture.md are the record; don't re-try them).
BIG_NFFT_MIN = 1 << 16

#: scoped VMEM cap requested for the big kernel (the XLA default is
#: 16 MB; v5e has 128 MB physical VMEM — the kernel raises the limit via
#: CompilerParams, which is what admits multi-MB working sets up to the
#: reference's nfft = 2^20 maximum)
BIG_VMEM_BUDGET = 90 * 1024 * 1024


def pick_contiguous_tb(nfft: int, nint: int, gather_len: int,
                       ntime: int, nsub: int) -> int:
    """Columns batched per grid step on the contiguous small-column path.

    Batching several columns per step amortizes per-step overhead AND
    (wide path) deepens the lane-folded GEMMs — the small-nfft stage-1
    contraction depth is nfft/128, so folding more columns under the
    lanes is where the MXU fill comes from. Measured ladder (v5e, welch
    nint=4 ntime=128 nsub=2, round 4):
    1024: tb=8 8.95 -> 16 10.3 -> 32 11.6 -> 64 12.1 -> 128 12.6 GS/s;
    4096: 8 12.9 -> 32 13.7 (display tier 21.8 -> 31.0);
    256/512: 2.4/4.1 -> 4.2/7.2. tb=256 measured +3% over 128 at 256-pt
    and compiles materially slower — capped at 128. Raising
    MAX_BLOCK_BYTES to 36MB to reach tb=64 at 4096 welch (32MB blocks,
    64MB double-buffered) measured SLOWER: 13.10 vs 13.61 GS/s — the
    fold is already past its knee there and the bigger working set only
    pressures VMEM; the 24MB budget stands (negative result, round 4).

    Parity with nint > 1 folds too, by over-fetching whole frame_len
    strides (the unused nint-1 segments ride along in the block):
    small-transform parity is LAUNCH-bound (~17 GB/s effective at
    1024-pt tb=1 vs ~820 GB/s HBM), so nint-x extra fetch for
    up-to-128x fewer grid steps + lane-folded GEMMs is the right trade
    at the wide sizes (measured v5e: 1024-pt parity nint=2 8.7 -> 35.5
    GS/s, 4096 19.7 -> 27.7); above the wide cutoff the per-column
    GEMMs already feed the MXU and the over-fetch would only add
    traffic (kept at tb=1 there).
    """
    over_fetch = gather_len != nfft * nint
    if over_fetch and nfft > 16384:
        return 1
    span = nfft * nint if over_fetch else gather_len
    for tb in (128, 64, 32, 16, 8, 4, 2):
        if ntime % tb == 0 and nsub * 2 * tb * span * 8 <= MAX_BLOCK_BYTES:
            return tb
    return 1


def pallas_supported(nfft: int, nint: int = 1, nsub: int = 1,
                     mode: str = "welch", precision: str = "exact") -> bool:
    if nfft < 256 or nfft % LANE or (nfft & (nfft - 1)):
        return False
    if nfft >= BIG_NFFT_MIN:
        # the big kernel streams one SEGMENT per grid step and accumulates
        # in persistent scratch, so nint does not enter the block budget
        return _big3_vmem_bytes(nfft, nsub, precision) <= BIG_VMEM_BUDGET
    nseg = nint if mode == "welch" else 1
    block = nsub * 2 * nfft * nseg * 4 * 2  # double-buffered
    # n1 <= 256 keeps the DFT factors + column block + pipeline buffers
    # inside VMEM for the small-column kernel
    return nfft // LANE <= 256 and block <= MAX_BLOCK_BYTES


def pallas_auto_profitable(nfft: int, nint: int = 1, nsub: int = 1,
                           mode: str = "welch", precision: str = "exact",
                           contiguous: bool = False) -> bool:
    """Where the fused kernel beats XLA (measured on v5e, amortized-loop
    timing). On the contiguous production layout the wide (lane-folded)
    column batching wins all the way down to the kernel's 256-pt floor
    (round-4 deep-fold ladder, tb up to 128: 256-pt 4.2 vs 1.7,
    512: 7.2 vs 2.3, 1024: 12.6 vs 2.2 GS/s);
    gathered (arbitrary-start) paths can't lane-fold, so below 1024 the
    per-column stage-1 matmuls underfeed the MXU and XLA wins there.
    From 65536 the Gauss'd 3-stage per-segment kernel sustains
    8.1-10.0 GS/s across the reference's ENTIRE remaining range (to
    2^20; full table in docs/architecture.md) versus XLA's 1.3-1.8 —
    5-7x."""
    floor = 256 if contiguous else 1024
    return nfft >= floor and pallas_supported(nfft, nint, nsub, mode,
                                              precision)


def pick_impl(nfft: int, nint: int, nsub: int, mode: str = "welch",
              precision: str = "exact", contiguous: bool = False,
              fft_impl: str = "auto") -> str:
    """'pallas' | 'per-sub' | 'xla' — THE dispatch policy, shared by the
    single-chip program (ops.stft), every shard_map tier's per-shard body
    (parallel.sharded.make_local_sti) and the streaming core, so the
    tiers cannot drift: a multi-sub working set that overflows the fused
    kernel's VMEM budget runs one launch per plane pair wherever one
    subchannel fits (~8 GS/s at 2^19-2^20 vs the 5-7x slower XLA FFT),
    falling back to XLA only when even that fails. An explicit
    fft_impl='pallas' is an ask, not a hint — unsupported configs raise
    downstream instead of silently degrading."""
    import jax

    if fft_impl == "pallas":
        return "pallas"
    if fft_impl == "xla" or jax.default_backend() != "tpu":
        return "xla"
    if pallas_auto_profitable(nfft, nint, nsub, mode, precision,
                              contiguous):
        return "pallas"
    if pallas_per_sub_profitable(nfft, nint, nsub, mode, precision,
                                 contiguous):
        return "per-sub"
    return "xla"


def pallas_per_sub_profitable(nfft: int, nint: int = 1, nsub: int = 1,
                              mode: str = "welch", precision: str = "exact",
                              contiguous: bool = False) -> bool:
    """True where a MULTI-sub working set overflows the big kernel's VMEM
    budget but one subchannel fits: dispatchers (ops.stft pick_impl, the
    streaming core) then run one pallas launch per plane pair — ~8 GS/s
    at 2^19-2^20 versus the 5-7x slower XLA FFT fallback. One policy,
    shared, so the batch and streaming paths cannot drift apart."""
    return (
        nsub > 1
        and nfft >= BIG_NFFT_MIN
        and not pallas_auto_profitable(nfft, nint, nsub, mode, precision,
                                       contiguous)
        and pallas_auto_profitable(nfft, nint, 1, mode, precision,
                                   contiguous)
    )


@functools.lru_cache(maxsize=32)
def make_plan(nfft: int, n2: int) -> dict:
    """DFT factor matrices for the split n = n2*p + q (n1 = nfft/n2):
    D1[k1,p] = W_n1^(k1 p), D2[q,k2] = W_n2^(q k2), T[k1,q] = W_nfft^(q k1);
    X[n1*k2 + k1] = (D1 @ x2 * T @ D2)[k1, k2] for x2 = x.reshape(n1, n2)."""
    n1 = nfft // n2
    d1 = dft_mat(n1)
    d2 = dft_mat(n2)
    tw = twiddle_mat(n1, n2, nfft)
    f32 = lambda a: np.ascontiguousarray(a, np.float32)  # noqa: E731
    return dict(d1r=f32(d1.real), d1i=f32(d1.imag),
                d2r=f32(d2.real), d2i=f32(d2.imag),
                twr=f32(tw.real), twi=f32(tw.imag))


def make_plan_lane(nfft: int) -> dict:
    return make_plan(nfft, LANE)


def _split_bf16(m: np.ndarray) -> np.ndarray:
    """Host-side error-feedback split D = hi + lo with hi = bf16(D), for
    the 'balanced' precision tier (3 single-pass bf16 matmuls ~= 1e-4 dB
    at half the MXU passes of Precision.HIGHEST)."""
    hi = m.astype(np.float32).astype("bfloat16").astype(np.float32)
    return np.stack([hi, m - hi]).astype(np.float32)


def _complex_gemm_ops(precision: str):
    """(load_d, xsplit, cdot_l, cdot_r) complex-matmul helpers.

    Complex products use Gauss's 3-multiplication identity — 3 real GEMMs
    instead of 4 per stage (25% fewer MXU passes at every precision tier):
        (Dr + iDi)(xr + ixi):  k1 = (Dr+Di) @ xr,  k2 = Dr @ (xi-xr),
                               k3 = Di @ (xr+xi)
        real = k1 - k3,  imag = k1 + k2
    The constant sums (Dr+Di) are precomputed on the host (see
    _plan_triple); the data sums are single VPU adds per tile. cdot_l
    contracts from the left (D @ x), cdot_r from the right (z @ D); both
    take d as the (dr, di, dsum) triple and x/z as an (xr, xi) pair of
    raw float32 tiles, returning raw float32 (real, imag).
    """
    load_d, xsplit, mdot, mdot2 = _mm_ops(precision)

    def load_d3(ref3):
        return tuple(load_d(r) for r in ref3)

    def cdot_l(d3, x):
        dr, di, dsum = d3
        xr, xi = x
        k1 = mdot(dsum, xsplit(xr))
        k2 = mdot(dr, xsplit(xi - xr))
        k3 = mdot(di, xsplit(xr + xi))
        return k1 - k3, k1 + k2

    def cdot_r(z, d3):
        dr, di, dsum = d3
        zr, zi = z
        k1 = mdot2(xsplit(zr), dsum)
        k2 = mdot2(xsplit(zi - zr), dr)
        k3 = mdot2(xsplit(zr + zi), di)
        return k1 - k3, k1 + k2

    return load_d3, cdot_l, cdot_r


def _plan_triple(plan: dict, key: str, precision: str):
    """Constant triple (dr, di, dr+di) for one DFT stage, split for the
    balanced tier."""
    dr, di = plan[key + "r"], plan[key + "i"]
    mats = (dr, di, dr + di)
    if precision == "balanced":
        return tuple(_split_bf16(m) for m in mats)
    return mats


def _use_gauss(precision: str, nseg: int) -> bool:
    """Gauss's 3-mult complex product (25% fewer MXU passes) wins only
    where MXU passes dominate the step: exact precision with real Welch
    averaging. Memory/VPU-bound variants (parity / nint=1, and the
    1-to-3-pass tiers) measured SLOWER with the extra VPU adds
    (4096 parity 17.3 -> 14.0, display 15.8 -> 9.7 GS/s), so they keep
    the plain 4-GEMM form. ONE gate shared by both 2-stage kernel
    factories and the stream kernel's VMEM accounting — the constant
    operand layout must agree with _stage_prods' rest[:-4] slicing."""
    return precision == "exact" and nseg >= 2


def _small_consts(plan: dict, win2: np.ndarray, precision: str, nseg: int):
    """(use_gauss, d_consts, consts) — the 2-stage kernels' constant
    operand set: stage matrices (3 per stage under Gauss, else 2; hi/lo
    pairs on the balanced tier), bracketed by the window plane in front
    and the twiddle r/i planes behind. Shared by the batch and stream
    factories so the two kernels' layouts cannot drift."""
    use_gauss = _use_gauss(precision, nseg)
    if use_gauss:
        d_consts = list(_plan_triple(plan, "d1", precision)) + list(
            _plan_triple(plan, "d2", precision))
    elif precision == "balanced":
        d_consts = [_split_bf16(plan[k]) for k in ("d1r", "d1i", "d2r", "d2i")]
    else:
        d_consts = [plan[k] for k in ("d1r", "d1i", "d2r", "d2i")]
    return use_gauss, d_consts, [win2] + d_consts + [plan["twr"], plan["twi"]]


def _blockdiag(m: np.ndarray, g: int) -> np.ndarray:
    """Block-diagonal stack of g copies of m. Supports the balanced
    tier's (2, n, n) hi/lo split — blockdiag commutes with the split
    (bf16(0) == 0) — and the Gauss dr+di sum (blockdiag(a) + blockdiag(b)
    == blockdiag(a+b))."""
    if g == 1:
        return m
    if m.ndim == 3:
        return np.stack([_blockdiag(p, g) for p in m])
    n = m.shape[0]
    out = np.zeros((g * n, g * n), m.dtype)
    for i in range(g):
        out[i * n:(i + 1) * n, i * n:(i + 1) * n] = m
    return out


def wide_group(nfft: int, tb: int, precision: str) -> int:
    """Columns chunk-stacked per stage-1 GEMM on the wide path.

    The wide fold widens stage-1 to (n1, n1) @ (n1, tb*n2), but at small
    nfft its M = K = n1 dimensions still underfill the 128x128 MXU: a
    (32, 32) LHS pays a full padded pass per 128-lane tile, so at
    nfft = 4096 only 1/16 of each pass does work (1/256 at 1024). Fix:
    stack g = 128/n1 adjacent columns VERTICALLY (sublane axis) and make
    stage-1 one blockdiag(D1 x g) (128, 128) @ (128, (tb/g)*n2) GEMM —
    the same per-column products ride full contraction depth, g x fewer
    MXU passes. The blockdiag zeros waste MACs, not passes (the MXU pads
    small K/M to the full array either way). Stage-2's (tb*n1, n2) fold
    is already full-fill and unchanged.

    Display tier only (measured, same-process A/B on v5e): single-pass
    bf16 GEMMs are stage-1-pass-bound, so fewer passes win — 1024
    20.3 -> 24.4 (+19.8%), 4096 23.3 -> 24.5 (+4.9%), stream display
    16.6 -> 17.5 (+5.9%) GS/s. On the multi-pass tiers the blockdiag's
    wasted MACs cost real passes (exact bf16x6 -4.5%, balanced hi/lo
    -2.4%, parity -5%), so those keep g = 1 (byte-identical to the
    pre-grouping kernel)."""
    if precision != "display" or nfft >= LANE * LANE:
        return 1
    g = min(tb, LANE // (nfft // LANE))
    # both tb pickers return powers of two and n1 is a power of two, so
    # g | tb always holds; the (g, tb/g) grid silently drops columns if
    # a future picker breaks that, hence the loud check
    if tb % g:
        raise ValueError(f"wide_group: g={g} must divide tb={tb}")
    return g


def _tiled_consts(plan: dict, win2: np.ndarray, d_consts: list, tb: int,
                  g: int = 1):
    """The wide (lane-folded) variant's constants: window and twiddles
    tile across the (g, tb/g) chunk-stacked column grid; stage-1
    matrices blockdiag g copies (see :func:`wide_group`); stage-2
    matrices are column-count independent."""
    n_stage1 = len(d_consts) // 2
    reps = (g, tb // g)
    return ([np.tile(win2, reps)]
            + [_blockdiag(m, g) for m in d_consts[:n_stage1]]
            + list(d_consts[n_stage1:])
            + [np.tile(plan["twr"], reps), np.tile(plan["twi"], reps)])


def _mm_ops(precision: str):
    """(load_d, xsplit, mdot, mdot2) for a precision tier, where mdot
    contracts from the left (D @ x) and mdot2 from the right (x @ D)."""
    dot = functools.partial(
        jnp.dot,
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if precision == "exact"
                   else jax.lax.Precision.DEFAULT),
    )
    if precision == "balanced":
        def load_d(ref):
            return (ref[0], ref[1])

        def xsplit(v):
            hi = v.astype(jnp.bfloat16).astype(jnp.float32)
            return (hi, v - hi)

        def mdot(m, x):
            mh, ml = m
            xh, xl = x
            return dot(mh, xh) + dot(mh, xl) + dot(ml, xh)

        def mdot2(x, m):
            xh, xl = x
            mh, ml = m
            return dot(xh, mh) + dot(xl, mh) + dot(xh, ml)
    else:
        def load_d(ref):
            return ref[...]

        def xsplit(v):
            return v

        def mdot(m, x):
            return dot(m, x)

        def mdot2(x, m):
            return dot(x, m)
    return load_d, xsplit, mdot, mdot2


@functools.lru_cache(maxsize=64)
def make_pallas_sti_psd(
    *,
    nfft: int,
    nint: int = 1,
    mode: str = "welch",
    window: WindowSpec = ("kaiser", 1.7),
    ref: float = 1.0,
    interpret: bool = False,
    contiguous: bool = False,
    precision: str = "exact",
):
    """Build ``f(samples_pm, starts) -> linear power (ntime, nsub, nfft)``.

    samples_pm: (nsub*2, nsamp) float32 plane-major buffer;
    starts:     (ntime,) int32 frame starts (relative sample offsets).
    Welch mode averages nint segment periodograms; parity computes only the
    first segment (the reference's verified truncation semantics,
    drfProc.py:387-396).

    ``precision``: "exact" (default) runs the DFT matmuls at
    Precision.HIGHEST (bf16x3, ~1e-6 vs the f32 FFT); "display" uses the
    MXU's native single-pass bf16 (~3e-2 relative on power, i.e. about
    0.13 dB — invisible on a waterfall) for maximum throughput.

    ``contiguous=True`` asserts that column t's frame begins at
    t*nfft*nint (the layout the pipeline's frame assembly always produces):
    the XLA gather disappears entirely — the kernel's input BlockSpec
    slices the samples buffer directly, saving one full materialization of
    the frames array per step. ``starts`` is then only validated, not used.

    Transforms of 65536+ dispatch to the 3-stage per-segment-grid
    kernel (:func:`_make_big3_sti_psd`).
    """
    if nfft >= BIG_NFFT_MIN:
        return _make_big3_sti_psd(
            nfft=nfft, nint=nint, mode=mode, window=window, ref=ref,
            interpret=interpret, contiguous=contiguous, precision=precision,
        )
    n1, n2 = lane_factors(nfft)
    nseg = nint if mode == "welch" else 1
    gather_len = nfft * nseg  # parity gathers only what it consumes

    plan = make_plan_lane(nfft)
    win64 = get_window(window, nfft)
    win2 = win64.reshape(n1, n2).astype(np.float32)
    inv_scale = np.float32(
        1.0 / (float(win64.sum()) ** 2 * float(ref) ** 2 * nseg)
    )
    use_gauss, d_consts, consts = _small_consts(plan, win2, precision, nseg)

    def kernel(frames_ref, win_ref, *rest, nsub: int, tb: int = 1,
               wide: bool = False, col_span: int = 0, g: int = 1):
        col_span = col_span or gather_len
        # MXU f32 matmuls default to single-pass bf16 (~3e-2 rel err on
        # the DFT). Tiers: "exact" = Precision.HIGHEST (bf16x6, ~1e-6);
        # "balanced" = manual 3-term hi/lo split (~1e-4 dB, ~2x faster);
        # "display" = raw single pass (~0.12 dB, fastest).
        out_ref, accum = rest[-2], rest[-1]
        twr, twi = rest[-4][...], rest[-3][...]
        cprod_l, cprod_r = _stage_prods(rest[:-4], precision, use_gauss)
        win = win_ref[...]

        if wide:
            # WIDE path: all tb columns of a subchannel fold under the
            # lanes (_wide_seg_power); the per-column tiny-GEMM launches
            # this replaces were the small-transform bottleneck.
            for sub in range(nsub):
                accum[...] = jnp.zeros((tb, n1, n2), jnp.float32)

                def seg_body(seg, _, sub=sub):
                    def load_col(c):
                        off = pl.multiple_of(c * col_span + seg * nfft,
                                             LANE)
                        return (frames_ref[2 * sub, pl.ds(off, nfft)],
                                frames_ref[2 * sub + 1, pl.ds(off, nfft)])

                    accum[...] += _wide_seg_power(
                        load_col, win, twr, twi, cprod_l, cprod_r,
                        n1, n2, tb, g)
                    return 0

                jax.lax.fori_loop(0, nseg, seg_body, 0)
                for c in range(tb):
                    _write_shifted(out_ref, c, sub,
                                   accum[c, :, :] * inv_scale, n2)
            return

        for c, sub in [(c, s) for c in range(tb) for s in range(nsub)]:
            accum[...] = jnp.zeros((n1, n2), jnp.float32)

            def seg_body(seg, _, c=c, sub=sub):
                off = pl.multiple_of(c * col_span + seg * nfft, LANE)
                if contiguous:
                    xr = frames_ref[2 * sub, pl.ds(off, nfft)]
                    xi = frames_ref[2 * sub + 1, pl.ds(off, nfft)]
                else:
                    xr = frames_ref[0, 2 * sub, pl.ds(off, nfft)]
                    xi = frames_ref[0, 2 * sub + 1, pl.ds(off, nfft)]
                accum[...] += _one_seg_power(xr, xi, win, twr, twi,
                                             cprod_l, cprod_r, n1, n2)
                return 0

            jax.lax.fori_loop(0, nseg, seg_body, 0)
            _write_shifted(out_ref, c, sub, accum[...] * inv_scale, n2)

    def _pick_tb(ntime: int, nsub: int) -> int:
        if not contiguous:
            return 1
        return pick_contiguous_tb(nfft, nint, gather_len, ntime, nsub)

    def build(ntime: int, nsub: int):
        flops_seg = 8 * 2 * (n1 * n1 * n2 + n1 * n2 * n2)
        tb = _pick_tb(ntime, nsub)
        # the wide (lane-folded) variant wins for small transforms where
        # per-column GEMMs underfeed the MXU (measured v5e: 4096 7.0 ->
        # 10.7, 1024 2.6 -> 7.1, 16384 -> 12.1 GS/s); at 32768 the
        # per-column GEMMs are already ~85% of peak and the fold's
        # transpose costs more than it saves (12.1 -> 11.1).
        wide = tb > 1 and nfft <= 16384
        g = wide_group(nfft, tb, precision) if wide else 1
        if wide:
            consts_b = _tiled_consts(plan, win2, d_consts, tb, g)
            scratch = pltpu.VMEM((tb, n1, n2), jnp.float32)
        else:
            consts_b = consts
            scratch = pltpu.VMEM((n1, n2), jnp.float32)
        # per-column span inside a tb-wide block: whole frame_len strides
        # when folding (parity over-fetches the unused segments, see
        # _pick_tb); exactly what's consumed at tb == 1
        col_span = nfft * nint if tb > 1 else gather_len
        if contiguous:
            # column t's samples live at [t*frame_len, ...): slice the
            # buffer directly (block units: width tb*col_span, so
            # frame_len offsets advance stride blocks per step in parity
            # mode at tb == 1 where gather_len < frame_len)
            stride_blocks = (nfft * nint) // gather_len if tb == 1 else 1
            frames_spec = pl.BlockSpec(
                (nsub * 2, tb * col_span),
                lambda t: (0, t * stride_blocks),
                memory_space=pltpu.VMEM,
            )
        else:
            frames_spec = pl.BlockSpec(
                (1, nsub * 2, gather_len), lambda t: (t, 0, 0),
                memory_space=pltpu.VMEM,
            )
        call = pl.pallas_call(
            functools.partial(kernel, nsub=nsub, tb=tb, wide=wide,
                              col_span=col_span, g=g),
            grid=(ntime // tb,),
            in_specs=[frames_spec]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(consts_b),
            out_specs=pl.BlockSpec((tb, nsub, n2, n1),
                                   lambda t: (t, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ntime, nsub, n2, n1), jnp.float32),
            scratch_shapes=[scratch],
            interpret=interpret,
            # the 16 MB scoped-VMEM cap is a software default (v5e: 128 MB
            # physical); raise it so wide-nsub / deep-nint column blocks
            # stay on the fused path
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=2 * MAX_BLOCK_BYTES + 16 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=ntime * nsub * nseg * flops_seg,
                # input side counts what the blocks actually FETCH
                # (col_span > consumed gather_len in the folded parity
                # over-fetch case)
                bytes_accessed=ntime * nsub * 2 * col_span * 4
                + ntime * nsub * nfft * 4,
                transcendentals=0,
            ),
        )
        return call, consts_b

    @jax.jit
    def psd(samples_pm: jax.Array, starts: jax.Array) -> jax.Array:
        nsub = samples_pm.shape[0] // 2
        ntime = starts.shape[0]
        if not pallas_supported(nfft, nint, nsub, mode):
            raise ValueError(
                f"pallas STI unsupported for nfft={nfft} nint={nint} "
                f"nsub={nsub} mode={mode}"
            )
        call, consts_b = build(ntime, nsub)
        if contiguous:
            if samples_pm.shape[1] < ntime * nfft * nint:
                raise ValueError("buffer shorter than ntime contiguous frames")
            out = call(samples_pm, *[jnp.asarray(c) for c in consts_b])
            return out.reshape(ntime, nsub, nfft)

        def one_start(s):
            return jax.vmap(
                lambda row: jax.lax.dynamic_slice(row, (s,), (gather_len,))
            )(samples_pm)

        frames = jax.vmap(one_start)(starts)     # (ntime, nsub*2, gather_len)
        out = call(frames, *[jnp.asarray(c) for c in consts_b])
        return out.reshape(ntime, nsub, nfft)

    return psd


def _stage_prods(dref, precision: str, use_gauss: bool):
    """(cprod_l, cprod_r) stage products from kernel const refs — the
    same tier/Gauss wiring the batch kernel builds inline."""
    if use_gauss:
        load_d3, cdot_l, cdot_r = _complex_gemm_ops(precision)
        d1 = load_d3(dref[0:3])
        d2 = load_d3(dref[3:6])
        return (lambda x: cdot_l(d1, x)), (lambda z: cdot_r(z, d2))
    load_d, xsplit, mdot, mdot2 = _mm_ops(precision)
    d1r, d1i = load_d(dref[0]), load_d(dref[1])
    d2r, d2i = load_d(dref[2]), load_d(dref[3])

    def cprod_l(x):
        xr, xi = xsplit(x[0]), xsplit(x[1])
        return (mdot(d1r, xr) - mdot(d1i, xi),
                mdot(d1r, xi) + mdot(d1i, xr))

    def cprod_r(z):
        zr, zi = xsplit(z[0]), xsplit(z[1])
        return (mdot2(zr, d2r) - mdot2(zi, d2i),
                mdot2(zr, d2i) + mdot2(zi, d2r))

    return cprod_l, cprod_r


def _wide_seg_power(load_col, win, twr, twi, cprod_l, cprod_r,
                    n1: int, n2: int, tb: int, g: int = 1):
    """One lane-folded segment, shared by the batch and stream kernels:
    gather tb columns via ``load_col(c) -> (xr, xi)`` raw (nfft,) rows,
    chunk-stack them on a (g, tb/g) grid — column c = j*g + i sits at
    block row i, block column j — widen + window, stage-1 as ONE
    blockdiag (g*n1, g*n1) @ (g*n1, (tb/g)*n2) GEMM (full MXU fill, see
    :func:`wide_group`), twiddle (consts arrive pre-tiled to the grid),
    fold every column under the sublanes, stage-2 as ONE (tb*n1, n2) @
    (n2, n2) GEMM; returns |X|^2 as (tb, n1, n2) float32."""
    grps_r, grps_i = [], []
    for j in range(tb // g):
        rows_r, rows_i = [], []
        for i in range(g):
            xr, xi = load_col(j * g + i)
            rows_r.append(xr.astype(jnp.float32).reshape(n1, n2))
            rows_i.append(xi.astype(jnp.float32).reshape(n1, n2))
        grps_r.append(rows_r[0] if g == 1
                      else jnp.concatenate(rows_r, axis=0))
        grps_i.append(rows_i[0] if g == 1
                      else jnp.concatenate(rows_i, axis=0))
    xwr = jnp.concatenate(grps_r, axis=1) * win   # (g*n1, (tb/g)*n2)
    xwi = jnp.concatenate(grps_i, axis=1) * win
    yr, yi = cprod_l((xwr, xwi))
    zr = yr * twr - yi * twi
    zi = yr * twi + yi * twr
    # (g*n1, tb/g, n2) -> (tb/g, g, n1, n2) -> (tb*n1, n2): row c*n1 + k1
    # is column c = j*g + i's stage-1 output row k1
    zr = zr.reshape(g, n1, tb // g, n2).transpose(2, 0, 1, 3).reshape(
        tb * n1, n2)
    zi = zi.reshape(g, n1, tb // g, n2).transpose(2, 0, 1, 3).reshape(
        tb * n1, n2)
    xmr, xmi = cprod_r((zr, zi))          # (tb*n1, n2)
    return (xmr * xmr + xmi * xmi).reshape(tb, n1, n2)


def _one_seg_power(xr, xi, win, twr, twi, cprod_l, cprod_r,
                   n1: int, n2: int):
    """One single-column segment, shared by the batch and stream kernels:
    widen + window -> stage-1 GEMM -> twiddle -> stage-2 GEMM -> |X|^2 as
    (n1, n2) float32. Raw integer planes widen here, per VMEM block —
    the HBM-side buffer stays at half the bytes."""
    xr = xr.astype(jnp.float32).reshape(n1, n2) * win
    xi = xi.astype(jnp.float32).reshape(n1, n2) * win
    yr, yi = cprod_l((xr, xi))
    zr = yr * twr - yi * twi
    zi = yr * twi + yi * twr
    xmr, xmi = cprod_r((zr, zi))
    return xmr * xmr + xmi * xmi


def _write_shifted(out_ref, c: int, sub: int, p, n2: int):
    """Write one column's accumulated power: Xm[k1,k2] transposed is the
    natural-order (n2, n1) tile, and fftshift (k += nfft/2 = n1*(n2/2))
    is a carry-free swap of its row halves."""
    h = n2 // 2
    o = p.T                               # (n2, n1)
    out_ref[c, sub, :h, :] = o[h:, :]
    out_ref[c, sub, h:, :] = o[:h, :]


def _pick_stream_tb(nfft: int, k: int) -> int:
    """Lane-fold width for the stream kernel (shared by the factory's
    build and the pallas_stream_supported gate, so the gate's VMEM
    estimate counts the constants the kernel actually ships). Same
    rationale as pick_contiguous_tb: per-column tiny GEMMs are
    launch-bound at small nfft. The buffer already rides VMEM whole, so
    the fold's only VMEM premium is the folded temps (~6 live
    (n1, tb*n2) f32 intermediates + the (tb, n1, n2) accum); keep them
    within a quarter of the block budget."""
    if nfft > 16384:
        return 1
    for tb in (128, 64, 32, 16, 8, 4, 2):
        if k % tb == 0 and 8 * tb * nfft * 4 <= MAX_BLOCK_BYTES // 4:
            return tb
    return 1


def pallas_stream_supported(nfft: int, nint: int, hop: int, k: int,
                            nsub: int, mode: str = "welch",
                            precision: str = "exact") -> bool:
    """Can the overlap-hop streaming kernel take this push?

    The kernel keeps the ENTIRE push buffer (carry + block) VMEM-resident
    and slices each column's frame at its element offset t*hop — so
    overlapping starts need no gather at all. Requirements: hop strictly
    inside (0, frame_len) (hop == frame_len is the contiguous kernel's
    case), lane-aligned hop (hop % 128, so every frame slice starts on a
    lane boundary), a power-of-two nfft inside the small-kernel range,
    and the buffer + one out column + DFT constants within the VMEM
    block budget.
    """
    frame_len = nfft * nint
    if not (0 < hop < frame_len) or hop % LANE:
        return False
    if nfft & (nfft - 1) or not (1024 <= nfft < BIG_NFFT_MIN):
        return False
    if mode not in ("welch", "parity") or precision not in (
            "exact", "balanced", "display"):
        return False
    n1, n2 = lane_factors(nfft)
    buf_len = frame_len - hop + k * hop
    # count the ACTUAL constant set the kernel ships: 3 stage matrices
    # per stage under Gauss (dr, di, dr+di) else 2, each doubled by the
    # balanced tier's hi/lo split; plus twiddle r/i + window. The wide
    # (lane-folded) build inflates that set — window/twiddles tile to
    # tb columns (3*nfft*tb floats) and the display tier's grouping
    # blockdiags stage-1 to (g*n1)^2 — so the gate reproduces the
    # factory's tb/g choice instead of assuming the per-column set
    # (advisor r4: a borderline wide display config could otherwise be
    # admitted past the real VMEM need).
    nseg = nint if mode == "welch" else 1
    stage_mats = 3 if _use_gauss(precision, nseg) else 2
    split = 2 if precision == "balanced" else 1
    tb = _pick_stream_tb(nfft, k)
    g = wide_group(nfft, tb, precision) if tb > 1 else 1
    const_bytes = (stage_mats * split * (g * g * n1 * n1 + n2 * n2)
                   + 3 * nfft * tb) * 4
    # fold temps: ~6 live (n1, tb*n2) f32 intermediates + the
    # (tb, n1, n2) accum on the wide path (the tb picker bounds these to
    # a quarter of the block budget); per-column scratch otherwise
    temps = 8 * tb * nfft * 4 if tb > 1 else 4 * n1 * n2 * 4
    need = (nsub * 2 * buf_len * 4        # resident buffer
            + nsub * nfft * tb * 4        # out block: tb columns/step
            + const_bytes + temps)
    return need <= MAX_BLOCK_BYTES


@functools.lru_cache(maxsize=64)
def make_pallas_stream_psd(
    *,
    nfft: int,
    nint: int = 1,
    hop: int,
    mode: str = "welch",
    window: WindowSpec = ("kaiser", 1.7),
    ref: float = 1.0,
    interpret: bool = False,
    precision: str = "exact",
):
    """Overlap-hop streaming push kernel: ``f(buf_pm) -> (k, nsub, nfft)``
    linear fftshifted power, with column t's frame at element offset
    t*hop of the buffer (hop < frame_len: frames OVERLAP).

    The batch kernel's BlockSpec slicing is block-granular, so it cannot
    express starts that are not multiples of the gather length — which is
    exactly the overlap-save streaming case (models.streaming carries
    frame_len - hop samples between pushes, README.md:16). Streaming push
    buffers are small (carry + k*hop samples), so this kernel skips
    HBM blocking entirely: the whole buffer rides VMEM-resident across
    the k-column grid and each segment slices ``pl.ds(t*hop + seg*nfft,
    nfft)`` directly — overlapping reads cost VMEM bandwidth, not extra
    HBM traffic. Gate with :func:`pallas_stream_supported`.

    ``buf_pm``: (nsub*2, frame_len - hop + k*hop) plane-major float32.
    """
    n1, n2 = lane_factors(nfft)
    nseg = nint if mode == "welch" else 1
    frame_len = nfft * nint

    plan = make_plan_lane(nfft)
    win64 = get_window(window, nfft)
    win2 = win64.reshape(n1, n2).astype(np.float32)
    inv_scale = np.float32(
        1.0 / (float(win64.sum()) ** 2 * float(ref) ** 2 * nseg))
    use_gauss, d_consts, consts = _small_consts(plan, win2, precision, nseg)

    def kernel(frames_ref, win_ref, *rest, nsub: int, tb: int = 1,
               wide: bool = False, g: int = 1):
        out_ref, accum = rest[-2], rest[-1]
        twr, twi = rest[-4][...], rest[-3][...]
        cprod_l, cprod_r = _stage_prods(rest[:-4], precision, use_gauss)
        win = win_ref[...]
        t = pl.program_id(0)

        if wide:
            # WIDE path (the batch kernel's lane fold, _wide_seg_power):
            # per-column offsets (t*tb + c)*hop are lane-aligned because
            # the gate requires hop % 128 == 0; the overlapping reads
            # are VMEM-resident slices, so the fold adds no HBM traffic.
            for sub in range(nsub):
                accum[...] = jnp.zeros((tb, n1, n2), jnp.float32)

                def seg_body(seg, _, sub=sub):
                    def load_col(c):
                        off = pl.multiple_of(
                            (t * tb + c) * hop + seg * nfft, LANE)
                        return (frames_ref[2 * sub, pl.ds(off, nfft)],
                                frames_ref[2 * sub + 1, pl.ds(off, nfft)])

                    accum[...] += _wide_seg_power(
                        load_col, win, twr, twi, cprod_l, cprod_r,
                        n1, n2, tb, g)
                    return 0

                jax.lax.fori_loop(0, nseg, seg_body, 0)
                for c in range(tb):
                    _write_shifted(out_ref, c, sub,
                                   accum[c, :, :] * inv_scale, n2)
            return

        for sub in range(nsub):
            accum[...] = jnp.zeros((n1, n2), jnp.float32)

            def seg_body(seg, _, sub=sub):
                off = pl.multiple_of(t * hop + seg * nfft, LANE)
                accum[...] += _one_seg_power(
                    frames_ref[2 * sub, pl.ds(off, nfft)],
                    frames_ref[2 * sub + 1, pl.ds(off, nfft)],
                    win, twr, twi, cprod_l, cprod_r, n1, n2)
                return 0

            jax.lax.fori_loop(0, nseg, seg_body, 0)
            _write_shifted(out_ref, 0, sub, accum[...] * inv_scale, n2)

    @functools.lru_cache(maxsize=8)
    def build(k: int, nsub: int):
        flops_seg = 8 * 2 * (n1 * n1 * n2 + n1 * n2 * n2)
        tb = _pick_stream_tb(nfft, k)
        wide = tb > 1
        g = wide_group(nfft, tb, precision) if wide else 1
        if wide:
            consts_b = _tiled_consts(plan, win2, d_consts, tb, g)
            scratch = pltpu.VMEM((tb, n1, n2), jnp.float32)
        else:
            consts_b = consts
            scratch = pltpu.VMEM((n1, n2), jnp.float32)
        call = pl.pallas_call(
            functools.partial(kernel, nsub=nsub, tb=tb, wide=wide, g=g),
            grid=(k // tb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            * (1 + len(consts_b)),
            out_specs=pl.BlockSpec((tb, nsub, n2, n1),
                                   lambda t: (t, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k, nsub, n2, n1), jnp.float32),
            scratch_shapes=[scratch],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=2 * MAX_BLOCK_BYTES + 16 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=k * nsub * nseg * flops_seg,
                bytes_accessed=nsub * 2 * (frame_len + (k - 1) * hop) * 4
                + k * nsub * nfft * 4,
                transcendentals=0,
            ),
        )
        return call, consts_b

    @jax.jit
    def psd(buf_pm: jax.Array) -> jax.Array:
        nsub = buf_pm.shape[0] // 2
        k = (buf_pm.shape[1] - (frame_len - hop)) // hop
        if k < 1 or buf_pm.shape[1] != frame_len - hop + k * hop:
            raise ValueError(
                f"buffer width {buf_pm.shape[1]} is not carry + k*hop "
                f"(frame_len={frame_len}, hop={hop})")
        call, consts_b = build(k, nsub)
        out = call(buf_pm, *[jnp.asarray(c) for c in consts_b])
        return out.reshape(k, nsub, nfft)

    return psd


def factors3(nfft: int) -> Tuple[int, int, int]:
    """(A, B, C) split for the 3-stage kernel: C = 128 lanes, A >= B ~
    sqrt(nfft/128). 65536 -> (32, 16, 128), 131072 -> (32, 32, 128),
    262144 -> (64, 32, 128), 524288 -> (64, 64, 128),
    1048576 -> (128, 64, 128)."""
    if nfft & (nfft - 1) or nfft < BIG_NFFT_MIN:
        raise ValueError(
            f"3-stage kernel needs power-of-two nfft >= {BIG_NFFT_MIN}")
    ab = nfft // LANE
    b = 1 << ((ab.bit_length() - 1) // 2)
    return ab // b, b, LANE


@functools.lru_cache(maxsize=8)
def make_plan3(nfft: int) -> dict:
    """Constants for the 3-stage split N = A*B*C with
    n = a*BC + b*C + c and k = k_a + A*k_b + A*B*k_c:

        X[k] = sum_c W_C^{c k_c} W_BC^{c k_b} W_N^{(bC+c) k_a}
               sum_b W_B^{b k_b} sum_a W_A^{a k_a} x3[a, b, c]

    i.e. stage A (GEMM over a) -> twiddle T1[k_a, bC+c] = W_N^{(bC+c)k_a}
    -> transpose (A,B,C)->(B,A,C) -> stage B (GEMM over b) -> twiddle
    T2[k_b, c] = W_BC^{c k_b} broadcast over k_a -> stage C (GEMM over c
    from the right). The result R[k_b, k_a, k_c] transposed to
    (k_c, k_b, k_a) flattens row-major to the NATURAL frequency order
    (k = k_a + A k_b + AB k_c), and fftshift (k += N/2 = AB*(C/2)) is a
    carry-free half-swap along k_c."""
    A, B, C = factors3(nfft)
    f32 = lambda a: np.ascontiguousarray(a, np.float32)  # noqa: E731

    dA, dB, dC = dft_mat(A), dft_mat(B), dft_mat(C)
    t1 = twiddle_mat(A, B * C, nfft)
    t2 = twiddle_mat(B, C)
    return dict(
        A=A, B=B, C=C,
        dAr=f32(dA.real), dAi=f32(dA.imag),
        dBr=f32(dB.real), dBi=f32(dB.imag),
        dCr=f32(dC.real), dCi=f32(dC.imag),
        t1r=f32(t1.real), t1i=f32(t1.imag),
        t2r=f32(t2.real), t2i=f32(t2.imag),
    )


def _big3_vmem_bytes(nfft: int, nsub: int, precision: str) -> int:
    """Working-set estimate for the 3-stage kernel: the D matrices are
    tiny (<=128^2); the mass is the T1 twiddle, the segment block, and
    ~12 live full-segment intermediate tiles."""
    # A matrices-only hi/lo split (constants split on host, data taking
    # single-pass bf16 uncorrected) would make dsplit 1 and reopen
    # balanced at 2^19-2^20 nsub=1 — MEASURED round 4 and rejected: it
    # ran 10.4 GS/s at 2^19 (vs 6.5 exact, 12.7 display in the same
    # loop) but its accuracy was p99 0.042 dB ~= the display tier's
    # 0.041 (the uncorrected DATA rounding dominates; the matrices' low
    # bits buy nothing) — i.e. a strictly-dominated slower display, not
    # a balanced tier. The data split below IS what makes balanced
    # balanced; its x2 premium stays.
    dsplit = 2 if precision == "balanced" else 1
    frames = nsub * 2 * nfft * 4 * 2
    consts = 2 * nfft * 4 + nfft * 4      # T1 r+i + window (D mats are KBs)
    accum = nsub * nfft * 4
    out = nsub * nfft * 4 * 2
    interm = 12 * nfft * 4 * dsplit
    return frames + consts + accum + out + interm


@functools.lru_cache(maxsize=16)
def _make_big3_sti_psd(
    *,
    nfft: int,
    nint: int = 1,
    mode: str = "welch",
    window: WindowSpec = ("kaiser", 1.7),
    ref: float = 1.0,
    interpret: bool = False,
    contiguous: bool = False,
    precision: str = "exact",
):
    """3-stage GEMM-FFT STI for giant transforms (see make_plan3).

    Per-sample MAC count is A+B+C (~224 at 262144) versus n1+n2 (1024)
    for the 2-stage split — the D matrices shrink to KBs and two extra
    VMEM transposes pay for an ~4x FLOP reduction. Same per-segment grid
    and output contract as the column kernel.
    """
    plan = make_plan3(nfft)
    A, B, C = plan["A"], plan["B"], plan["C"]
    nseg = nint if mode == "welch" else 1
    gather_len = nfft * nseg

    win64 = get_window(window, nfft)
    win2 = win64.reshape(A, B * C).astype(np.float32)
    inv_scale = np.float32(
        1.0 / (float(win64.sum()) ** 2 * float(ref) ** 2 * nseg)
    )
    # exact AND balanced tiers use Gauss 3-mult complex products (25%
    # fewer MXU passes) — the big kernel is pass-bound at every step,
    # unlike the column kernel's memory-bound small-nseg variants.
    # Balanced accuracy with Gauss stays ~2e-4 dB p99 (vs 1.3e-4
    # without), well inside the tier's ~7e-4 spec. Display keeps the
    # 4-mult form: its bf16-rounded Gauss sums cost 1.5x the error
    # (p99 0.19 vs 0.125 dB, measured) for <=1.33x passes — not worth it
    # at a tier already running 20+ GS/s.
    use_gauss = precision in ("exact", "balanced")
    keys = ("dAr", "dAi", "dBr", "dBi", "dCr", "dCi",
            "t1r", "t1i", "t2r", "t2i")
    if use_gauss:
        consts = [win2] + (
            list(_plan_triple(plan, "dA", precision))
            + list(_plan_triple(plan, "dB", precision))
            + list(_plan_triple(plan, "dC", precision))
        ) + [plan[k] for k in keys[6:]]
    else:
        consts = [win2] + [plan[k] for k in keys]

    def kernel(frames_ref, win_ref, *rest, nsub: int):
        s = pl.program_id(1)
        out_ref, accum = rest[-2], rest[-1]
        t1r, t1i = rest[-6][...], rest[-5][...]
        t2r, t2i = rest[-4][...], rest[-3][...]
        dref = rest[:-6]
        if use_gauss:
            load_d3, cdot_l, cdot_r = _complex_gemm_ops(precision)
            dA = load_d3(dref[0:3])
            dB = load_d3(dref[3:6])
            dC = load_d3(dref[6:9])
            cprodA = functools.partial(cdot_l, dA)
            cprodB = functools.partial(cdot_l, dB)

            def cprodC(z):
                return cdot_r(z, dC)
        else:
            load_d, xsplit, mdot, mdot2 = _mm_ops(precision)
            dAr, dAi = load_d(dref[0]), load_d(dref[1])
            dBr, dBi = load_d(dref[2]), load_d(dref[3])
            dCr, dCi = load_d(dref[4]), load_d(dref[5])

            def _cprod_l(dr, di, x):
                xr, xi = xsplit(x[0]), xsplit(x[1])
                return (mdot(dr, xr) - mdot(di, xi),
                        mdot(dr, xi) + mdot(di, xr))

            cprodA = functools.partial(_cprod_l, dAr, dAi)
            cprodB = functools.partial(_cprod_l, dBr, dBi)

            def cprodC(z):
                zr, zi = xsplit(z[0]), xsplit(z[1])
                return (mdot2(zr, dCr) - mdot2(zi, dCi),
                        mdot2(zr, dCi) + mdot2(zi, dCr))
        win = win_ref[...]

        def swap_AB(m):  # (A, B*C) -> (B, A*C)
            return m.reshape(A, B, C).swapaxes(0, 1).reshape(B, A * C)

        for sub in range(nsub):
            if contiguous:
                xr0 = frames_ref[2 * sub, :]
                xi0 = frames_ref[2 * sub + 1, :]
            else:
                xr0 = frames_ref[0, 2 * sub, :]
                xi0 = frames_ref[0, 2 * sub + 1, :]
            xr = xr0.astype(jnp.float32).reshape(A, B * C) * win
            xi = xi0.astype(jnp.float32).reshape(A, B * C) * win
            # stage A: DFT over a (GEMM (A,A) @ (A, B*C))
            yr, yi = cprodA((xr, xi))
            # T1 twiddle, then fold k_a under the lanes: (A,B,C)->(B,A*C)
            zr = swap_AB(yr * t1r - yi * t1i)
            zi = swap_AB(yr * t1i + yi * t1r)
            # stage B: DFT over b (GEMM (B,B) @ (B, A*C))
            ur, ui = cprodB((zr, zi))
            # T2 twiddle (k_b, c), broadcast over k_a
            u3r = ur.reshape(B, A, C)
            u3i = ui.reshape(B, A, C)
            vr = (u3r * t2r[:, None, :] - u3i * t2i[:, None, :]).reshape(
                B * A, C)
            vi = (u3r * t2i[:, None, :] + u3i * t2r[:, None, :]).reshape(
                B * A, C)
            # stage C: DFT over c (GEMM (B*A, C) @ (C, C), from the right)
            wr, wi = cprodC((vr, vi))
            p = wr * wr + wi * wi              # (B*A, C) = (k_b, k_a, k_c)
            accum[sub, :, :] = jnp.where(s == 0, p, accum[sub, :, :] + p)

        @pl.when(s == nseg - 1)
        def _write():
            h = C // 2
            for sub in range(nsub):
                # (B, A, C) -> (C, B, A): row-major flatten IS the natural
                # frequency order; fftshift = half-swap along k_c
                o = jnp.transpose(
                    (accum[sub, :, :] * inv_scale).reshape(B, A, C),
                    (2, 0, 1))
                out_ref[0, sub, :h, :, :] = o[h:, :, :]
                out_ref[0, sub, h:, :, :] = o[:h, :, :]

    def build(ntime: int, nsub: int):
        if contiguous:
            frames_spec = pl.BlockSpec(
                (nsub * 2, nfft),
                lambda t, s: (0, t * nint + s),
                memory_space=pltpu.VMEM,
            )
        else:
            frames_spec = pl.BlockSpec(
                (1, nsub * 2, nfft), lambda t, s: (t, 0, s),
                memory_space=pltpu.VMEM,
            )
        flops_seg = 8 * nfft * (A + B + C)
        return pl.pallas_call(
            functools.partial(kernel, nsub=nsub),
            grid=(ntime, nseg),
            in_specs=[frames_spec]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(consts),
            out_specs=pl.BlockSpec((1, nsub, C, B, A),
                                   lambda t, s: (t, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ntime, nsub, C, B, A),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((nsub, B * A, C), jnp.float32)],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=ntime * nsub * nseg * flops_seg,
                bytes_accessed=ntime * nsub * nseg * nfft * 8
                + ntime * nsub * nfft * 4,
                transcendentals=0,
            ),
        )

    @jax.jit
    def psd(samples_pm: jax.Array, starts: jax.Array) -> jax.Array:
        nsub = samples_pm.shape[0] // 2
        ntime = starts.shape[0]
        if not pallas_supported(nfft, nint, nsub, mode, precision):
            raise ValueError(
                f"big pallas STI unsupported for nfft={nfft} nint={nint} "
                f"nsub={nsub} mode={mode} precision={precision} (working "
                "set exceeds the VMEM budget)"
            )
        if contiguous:
            if samples_pm.shape[1] < ntime * nfft * nint:
                raise ValueError("buffer shorter than ntime contiguous frames")
            out = build(ntime, nsub)(
                samples_pm, *[jnp.asarray(c) for c in consts])
            return out.reshape(ntime, nsub, nfft)

        def one_start(st):
            return jax.vmap(
                lambda row: jax.lax.dynamic_slice(row, (st,), (gather_len,))
            )(samples_pm)

        frames = jax.vmap(one_start)(starts)
        out = build(ntime, nsub)(frames, *[jnp.asarray(c) for c in consts])
        return out.reshape(ntime, nsub, nfft)

    return psd


def to_plane_major(packed: np.ndarray) -> np.ndarray:
    """(nsamp, nsub, 2) time-major packed -> (nsub*2, nsamp) plane-major
    float32 (host-side; one transpose)."""
    nsamp, nsub, _ = packed.shape
    return np.ascontiguousarray(
        np.moveaxis(packed.astype(np.float32), 0, -1).reshape(nsub * 2, nsamp)
    )
