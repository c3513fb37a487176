"""Fused Pallas STI kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyspectrogram_tpu.kernels.sti_pallas import (
    lane_factors,
    make_pallas_sti_psd,
    make_plan_lane,
    pallas_supported,
    to_plane_major,
)
from pyspectrogram_tpu.kernels.gemm_fft import make_plan, gemm_fft_numpy
from pyspectrogram_tpu.ops import stft


def _inputs(nfft, nint, ntime, nsub, seed=0):
    rng = np.random.default_rng(seed)
    nsamp = nfft * nint * ntime + 64
    packed = rng.standard_normal((nsamp, nsub, 2)).astype(np.float32)
    starts = np.linspace(0, nsamp - nfft * nint, ntime).astype(np.int32)
    return packed, starts


def test_gemm_fft_factorization_exact():
    rng = np.random.default_rng(1)
    for nfft in (256, 1024, 4096):
        x = rng.standard_normal((2, nfft)) + 1j * rng.standard_normal((2, nfft))
        Xr, Xi = gemm_fft_numpy(x.real, x.imag, make_plan(nfft, np.float64))
        want = np.fft.fft(x, axis=-1)
        np.testing.assert_allclose(Xr + 1j * Xi, want, rtol=1e-11, atol=1e-9)


def test_lane_plan_identity():
    """The lane-aligned plan reproduces the FFT through the kernel's exact
    dataflow (reshape -> D1 -> twiddle -> D2 -> transpose-flatten)."""
    nfft = 512
    n1, n2 = lane_factors(nfft)
    plan = make_plan_lane(nfft)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(nfft) + 1j * rng.standard_normal(nfft)
    x2 = x.reshape(n1, n2)
    d1 = plan["d1r"] + 1j * plan["d1i"]
    d2 = plan["d2r"] + 1j * plan["d2i"]
    tw = plan["twr"] + 1j * plan["twi"]
    xm = ((d1.astype(complex) @ x2) * tw) @ d2
    got = xm.T.reshape(nfft)
    np.testing.assert_allclose(got, np.fft.fft(x), rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("mode,nint", [("welch", 1), ("welch", 4), ("parity", 3)])
def test_pallas_psd_matches_xla(mode, nint):
    nfft, ntime, nsub = 256, 6, 2
    packed, starts = _inputs(nfft, nint, ntime, nsub)
    psd = make_pallas_sti_psd(nfft=nfft, nint=nint, mode=mode, interpret=True)
    got = np.asarray(psd(jnp.asarray(to_plane_major(packed)),
                         jnp.asarray(starts)))
    want_fn = stft.make_sti_fn(nfft=nfft, nint=nint, mode=mode,
                               return_linear=True)
    want = np.asarray(want_fn(jnp.asarray(packed), jnp.asarray(starts))["sxx"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_pallas_with_ref_scaling():
    nfft, ntime = 256, 4
    packed, starts = _inputs(nfft, 1, ntime, 1, seed=3)
    ref = 2.0 ** 15.5
    psd = make_pallas_sti_psd(nfft=nfft, ref=ref, interpret=True)
    got = np.asarray(psd(jnp.asarray(to_plane_major(packed)),
                         jnp.asarray(starts)))
    psd1 = make_pallas_sti_psd(nfft=nfft, ref=1.0, interpret=True)
    base = np.asarray(psd1(jnp.asarray(to_plane_major(packed)),
                           jnp.asarray(starts)))
    np.testing.assert_allclose(got, base / ref ** 2, rtol=1e-6)


def test_make_sti_fn_pm_layouts_agree():
    """Plane-major factory (XLA impl) == time-major factory on the same
    logical samples."""
    nfft, nint, ntime, nsub = 128, 2, 5, 3
    packed, starts = _inputs(nfft, nint, ntime, nsub, seed=4)
    tm = stft.make_sti_fn(nfft=nfft, nint=nint)(
        jnp.asarray(packed), jnp.asarray(starts))
    pm = stft.make_sti_fn_pm(nfft=nfft, nint=nint, fft_impl="xla")(
        jnp.asarray(to_plane_major(packed)), jnp.asarray(starts))
    np.testing.assert_allclose(np.asarray(pm["sxx_dbfs"]),
                               np.asarray(tm["sxx_dbfs"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pm["sxx_med_dbfs"]),
                               np.asarray(tm["sxx_med_dbfs"]), atol=1e-4)


def test_make_sti_fn_pm_int16_input():
    rng = np.random.default_rng(5)
    nfft, ntime = 128, 4
    pm16 = rng.integers(-2 ** 14, 2 ** 14, (2, nfft * ntime)).astype(np.int16)
    starts = (np.arange(ntime) * nfft).astype(np.int32)
    ref = 2.0 ** 15.5
    out16 = stft.make_sti_fn_pm(nfft=nfft, ref=ref, fft_impl="xla")(
        jnp.asarray(pm16), jnp.asarray(starts))
    outf = stft.make_sti_fn_pm(nfft=nfft, ref=ref, fft_impl="xla")(
        jnp.asarray(pm16.astype(np.float32)), jnp.asarray(starts))
    np.testing.assert_allclose(np.asarray(out16["sxx_dbfs"]),
                               np.asarray(outf["sxx_dbfs"]), atol=1e-5)


def test_pallas_supported_predicate():
    assert pallas_supported(4096, 4, 2)
    assert not pallas_supported(4000)          # not power of two
    assert not pallas_supported(128)           # too small
    assert pallas_supported(1 << 20)           # 3-stage covers 2^20 now
    assert pallas_supported(32768, 8, 2)       # 8.4M block, raised cap
    assert pallas_supported(32768, 16, 2)      # 16M block: 12.75 GS/s
    assert not pallas_supported(32768, 32, 2)  # 32M block beyond the cap
    # 65536+ uses the big per-segment kernel: nint no longer enters the
    # block budget, so deep integrations are supported
    assert pallas_supported(65536, 64, 4)


@pytest.mark.parametrize("mode,nint", [("welch", 3), ("parity", 2)])
def test_pallas_contiguous_matches_gathered(mode, nint):
    """contiguous=True (BlockSpec-sliced input, no gather) must equal the
    gathered path when frames really are packed at t*frame_len."""
    nfft, ntime, nsub = 256, 5, 2
    rng = np.random.default_rng(7)
    nsamp = nfft * nint * ntime
    packed = rng.standard_normal((nsamp, nsub, 2)).astype(np.float32)
    starts = (np.arange(ntime) * nfft * nint).astype(np.int32)
    pm = to_plane_major(packed)
    a = make_pallas_sti_psd(nfft=nfft, nint=nint, mode=mode, interpret=True,
                            contiguous=True)
    b = make_pallas_sti_psd(nfft=nfft, nint=nint, mode=mode, interpret=True)
    np.testing.assert_allclose(
        np.asarray(a(jnp.asarray(pm), jnp.asarray(starts))),
        np.asarray(b(jnp.asarray(pm), jnp.asarray(starts))),
        rtol=1e-6,
    )


@pytest.mark.parametrize("nfft,nint,ntime", [
    (256, 3, 16),    # fold active: tb=16, col_span=768, consumes 256
    (512, 2, 32),    # fold active: tb=32
    (1024, 4, 8),    # fold active: tb=8, 3 unused segments ride along
])
def test_pallas_contiguous_parity_fold_matches_gathered(nfft, nint, ntime):
    """Folded parity (tb > 1 over-fetching whole frame_len strides; the
    round-4 launch-bound fix) must equal the gathered tb=1 path — the
    kernel must consume only the FIRST nfft samples of each over-fetched
    frame_len span."""
    from pyspectrogram_tpu.kernels.sti_pallas import pick_contiguous_tb

    nsub = 2
    assert pick_contiguous_tb(nfft, nint, nfft, ntime, nsub) > 1
    rng = np.random.default_rng(13)
    nsamp = nfft * nint * ntime
    packed = rng.standard_normal((nsamp, nsub, 2)).astype(np.float32)
    starts = (np.arange(ntime) * nfft * nint).astype(np.int32)
    pm = to_plane_major(packed)
    folded = make_pallas_sti_psd(nfft=nfft, nint=nint, mode="parity",
                                 interpret=True, contiguous=True)
    plain = make_pallas_sti_psd(nfft=nfft, nint=nint, mode="parity",
                                interpret=True)
    np.testing.assert_allclose(
        np.asarray(folded(jnp.asarray(pm), jnp.asarray(starts))),
        np.asarray(plain(jnp.asarray(pm), jnp.asarray(starts))),
        rtol=1e-5,
    )


def test_pick_contiguous_tb_policy():
    """The fold policy: widest divisor of ntime whose block fits
    MAX_BLOCK_BYTES; parity (gather_len < frame_len) budgets the FULL
    over-fetched frame stride and never folds above the 16384 wide
    cutoff (the over-fetch would only add HBM traffic there)."""
    from pyspectrogram_tpu.kernels.sti_pallas import (
        MAX_BLOCK_BYTES,
        pick_contiguous_tb,
    )

    # welch consumes the whole frame: span = gather_len
    assert pick_contiguous_tb(1024, 4, 4096, 128, 2) == 128
    # parity over-fetch: span nfft*nint, still folds below the cutoff
    assert pick_contiguous_tb(1024, 4, 1024, 128, 2) == 128
    assert pick_contiguous_tb(4096, 2, 4096, 128, 2) > 1
    # above the wide cutoff parity stays unbatched
    assert pick_contiguous_tb(32768, 2, 32768, 128, 2) == 1
    # welch above the cutoff may still batch (no over-fetch penalty)
    assert pick_contiguous_tb(32768, 1, 32768, 8, 1) >= 1
    # block budget honored: the picked tb's block fits, the next rung up
    # either overflows or does not divide ntime
    for nfft, nint, gl, ntime, nsub in ((4096, 2, 8192, 128, 2),
                                        (1024, 2, 1024, 96, 4)):
        tb = pick_contiguous_tb(nfft, nint, gl, ntime, nsub)
        span = nfft * nint if gl != nfft * nint else gl
        assert nsub * 2 * tb * span * 8 <= MAX_BLOCK_BYTES
        bigger = [t for t in (128, 64, 32, 16, 8, 4, 2) if t > tb]
        assert all(ntime % t or nsub * 2 * t * span * 8 > MAX_BLOCK_BYTES
                   for t in bigger)
    # ntime not divisible by any rung -> tb=1
    assert pick_contiguous_tb(256, 2, 256, 5, 1) == 1


def test_make_sti_fn_pm_minmax_summary():
    rng = np.random.default_rng(8)
    nfft, ntime = 128, 6
    pm = rng.standard_normal((2, nfft * ntime)).astype(np.float32)
    starts = (np.arange(ntime) * nfft).astype(np.int32)
    out = stft.make_sti_fn_pm(nfft=nfft, fft_impl="xla", return_minmax=True,
                              return_linear=True)(
        jnp.asarray(pm), jnp.asarray(starts))
    p = np.asarray(out["sxx"])
    np.testing.assert_allclose(
        np.asarray(out["sxx_min_dbfs"]),
        10 * np.log10(p.min(axis=0) + 1e-15), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["sxx_max_dbfs"]),
        10 * np.log10(p.max(axis=0) + 1e-15), rtol=1e-6)


def test_pallas_contiguous_int16_input():
    """Raw int16 planes feed the contiguous kernel directly (widened per
    VMEM block), matching the widen-then-XLA result."""
    rng = np.random.default_rng(9)
    nfft, nint, ntime = 256, 2, 6
    pm16 = rng.integers(-2 ** 14, 2 ** 14,
                        (4, nfft * nint * ntime)).astype(np.int16)
    starts = (np.arange(ntime) * nfft * nint).astype(np.int32)
    ref = 2.0 ** 15.5
    a = stft.make_sti_fn_pm(nfft=nfft, nint=nint, ref=ref,
                            fft_impl="pallas", contiguous=True)(
        jnp.asarray(pm16), jnp.asarray(starts))
    b = stft.make_sti_fn_pm(nfft=nfft, nint=nint, ref=ref, fft_impl="xla",
                            contiguous=True)(
        jnp.asarray(pm16.astype(np.float32)), jnp.asarray(starts))
    np.testing.assert_allclose(np.asarray(a["sxx_dbfs"]),
                               np.asarray(b["sxx_dbfs"]), atol=1e-3)


def test_display_precision_mode():
    """precision="display" stays within waterfall tolerance of exact."""
    rng = np.random.default_rng(10)
    nfft, ntime = 256, 4
    pm = rng.standard_normal((2, nfft * ntime)).astype(np.float32)
    starts = (np.arange(ntime) * nfft).astype(np.int32)
    ex = stft.make_sti_fn_pm(nfft=nfft, fft_impl="pallas", contiguous=True)(
        jnp.asarray(pm), jnp.asarray(starts))
    fast = stft.make_sti_fn_pm(nfft=nfft, fft_impl="pallas", contiguous=True,
                               precision="display")(
        jnp.asarray(pm), jnp.asarray(starts))
    d = np.abs(np.asarray(ex["sxx_dbfs"]) - np.asarray(fast["sxx_dbfs"]))
    assert d.max() < 0.5  # CPU interpret: both exact; TPU: ~0.12 dB


def test_wide_group_policy():
    """wide_group pins the measured display-tier chunk-stacking policy:
    g = 128/n1 (capped at tb) on the single-pass display tier, g = 1 on
    the multi-pass tiers where the blockdiag's wasted MACs cost real
    passes (see the docstring's A/B numbers)."""
    from pyspectrogram_tpu.kernels import sti_pallas as sp

    assert sp.wide_group(1024, 8, "display") == 8     # tb binds
    assert sp.wide_group(1024, 32, "display") == 16   # 128 / (1024/128)
    assert sp.wide_group(4096, 32, "display") == 4
    assert sp.wide_group(256, 128, "display") == 64
    assert sp.wide_group(16384, 32, "display") == 1   # n1 = 128 full fill
    assert sp.wide_group(1024, 32, "exact") == 1
    assert sp.wide_group(1024, 32, "balanced") == 1
    # blockdiag helper: 2D, batched-3D (balanced hi/lo), g=1 passthrough
    m = np.arange(4, dtype=np.float32).reshape(2, 2)
    bd = sp._blockdiag(m, 2)
    assert bd.shape == (4, 4)
    np.testing.assert_array_equal(bd[:2, :2], m)
    np.testing.assert_array_equal(bd[2:, 2:], m)
    assert bd[:2, 2:].sum() == 0 and bd[2:, :2].sum() == 0
    b3 = sp._blockdiag(np.stack([m, 2 * m]), 2)
    assert b3.shape == (2, 4, 4)
    np.testing.assert_array_equal(b3[1][2:, 2:], 2 * m)
    assert sp._blockdiag(m, 1) is m


@pytest.mark.parametrize("ntime", [16, 32])
def test_display_grouped_matches_ungrouped(ntime):
    """The g>1 chunk-stacked display kernel must match the g=1 gathered
    path: same per-column stage-1 products, only the MXU pass layout
    differs. nfft=1024: ntime=16 drives tb=16, g=16 (one chunk column,
    tb/g=1); ntime=32 drives tb=32, g=16 (tb/g=2 — exercises the
    j-major chunk-grid de-interleave after stage-1)."""
    nfft = 1024
    rng = np.random.default_rng(21)
    pm = rng.standard_normal((2, nfft * ntime)).astype(np.float32)
    starts = (np.arange(ntime) * nfft).astype(np.int32)
    grouped = make_pallas_sti_psd(nfft=nfft, interpret=True,
                                  contiguous=True, precision="display")
    plain = make_pallas_sti_psd(nfft=nfft, interpret=True,
                                precision="display")
    np.testing.assert_allclose(
        np.asarray(grouped(jnp.asarray(pm), jnp.asarray(starts))),
        np.asarray(plain(jnp.asarray(pm), jnp.asarray(starts))),
        rtol=1e-5,
    )


@pytest.mark.parametrize("seed", [31, 47, 59, 71])
def test_randomized_pallas_config_matches_xla(seed):
    """Seeded random-config differential sweep for the PALLAS dispatch:
    random (pow2 nfft, nint, ntime, nsub, mode, precision, contiguity)
    through make_sti_fn_pm must match the XLA path (itself oracle-pinned
    in test_ops_stft). The pinned-size tests can't see interactions a
    random draw can — e.g. the grouped display chunk-grid at a tb that
    only a particular ntime divisibility selects, or per-column gathered
    dispatch at an ntime no tb divides."""
    rng = np.random.default_rng(seed)
    nfft = int(rng.choice([256, 512, 1024, 2048, 4096]))
    nint = int(rng.choice([1, 2, 3]))
    ntime = int(rng.choice([3, 5, 8, 16, 24, 32]))
    nsub = int(rng.choice([1, 2]))
    mode = str(rng.choice(["welch", "parity"]))
    precision = str(rng.choice(["exact", "balanced", "display"]))
    contiguous = bool(rng.random() < 0.5)
    frame_len = nfft * nint
    if contiguous:
        nsamp = frame_len * ntime
        starts = (np.arange(ntime) * frame_len).astype(np.int32)
    else:
        nsamp = frame_len * ntime + frame_len
        starts = np.sort(rng.choice(nsamp - frame_len + 1, size=ntime,
                                    replace=False)).astype(np.int32)
    pm = rng.standard_normal((nsub * 2, nsamp)).astype(np.float32)
    kw = dict(nfft=nfft, nint=nint, mode=mode)
    want = stft.make_sti_fn_pm(fft_impl="xla", **kw)(
        jnp.asarray(pm), jnp.asarray(starts))
    got = stft.make_sti_fn_pm(fft_impl="pallas", contiguous=contiguous,
                              precision=precision, **kw)(
        jnp.asarray(pm), jnp.asarray(starts))
    # CPU interpret runs every tier's matmuls in f32; balanced's
    # bf16-rounded hi/lo constants bound the split error at ~1e-3 dB
    np.testing.assert_allclose(np.asarray(got["sxx_dbfs"]),
                               np.asarray(want["sxx_dbfs"]), atol=0.05)
    np.testing.assert_allclose(np.asarray(got["sxx_med_dbfs"]),
                               np.asarray(want["sxx_med_dbfs"]), atol=0.05)


def test_pallas_contiguous_tb_batched():
    """ntime divisible by 8 at small nfft triggers the column-batched
    kernel (tb=8); results must match the unbatched gathered path."""
    nfft, nint, ntime, nsub = 512, 2, 16, 2
    rng = np.random.default_rng(11)
    nsamp = nfft * nint * ntime
    packed = rng.standard_normal((nsamp, nsub, 2)).astype(np.float32)
    starts = (np.arange(ntime) * nfft * nint).astype(np.int32)
    pm = to_plane_major(packed)
    batched = make_pallas_sti_psd(nfft=nfft, nint=nint, interpret=True,
                                  contiguous=True)
    plain = make_pallas_sti_psd(nfft=nfft, nint=nint, interpret=True)
    # the wide-tb path evaluates the same math as one lane-folded GEMM,
    # so float summation order differs slightly from per-column GEMMs
    np.testing.assert_allclose(
        np.asarray(batched(jnp.asarray(pm), jnp.asarray(starts))),
        np.asarray(plain(jnp.asarray(pm), jnp.asarray(starts))),
        rtol=1e-5,
    )


def test_balanced_precision_mode():
    """precision="balanced" stays within ~1e-3 dB of exact."""
    rng = np.random.default_rng(12)
    nfft, nint, ntime = 256, 2, 5
    pm = rng.standard_normal((4, nfft * nint * ntime)).astype(np.float32)
    starts = (np.arange(ntime) * nfft * nint).astype(np.int32)
    ex = stft.make_sti_fn_pm(nfft=nfft, nint=nint, fft_impl="pallas",
                             contiguous=True)(
        jnp.asarray(pm), jnp.asarray(starts))
    bal = stft.make_sti_fn_pm(nfft=nfft, nint=nint, fft_impl="pallas",
                              contiguous=True, precision="balanced")(
        jnp.asarray(pm), jnp.asarray(starts))
    d = np.abs(np.asarray(ex["sxx_dbfs"]) - np.asarray(bal["sxx_dbfs"]))
    assert d.max() < 5e-3


# ------------------------- big per-segment-grid kernel (nfft 65536+) ----

def test_big_factors_and_support():
    from pyspectrogram_tpu.kernels import sti_pallas as sp

    assert sp.factors3(1 << 16) == (32, 16, 128)
    assert sp.factors3(1 << 17) == (32, 32, 128)
    assert sp.factors3(1 << 18) == (64, 32, 128)
    assert sp.factors3(1 << 19) == (64, 64, 128)
    assert sp.factors3(1 << 20) == (128, 64, 128)
    assert sp.pallas_supported(1 << 16, 4, 1)
    assert sp.pallas_supported(1 << 16, 100, 2)   # nint is grid, not VMEM
    assert sp.pallas_supported(1 << 17, 2, 2)
    # the 3-stage kernel + raised scoped-VMEM cap cover the reference's
    # FULL nfft range (drfview.py:475) at nsub=1; measured 6.2-7.6 GS/s
    assert sp.pallas_supported(1 << 19, 1, 1)
    assert sp.pallas_supported(1 << 20, 1, 1)
    assert not sp.pallas_supported(1 << 20, 1, 2)  # beyond the 90M budget
    assert sp.pallas_auto_profitable(1 << 16, 4, 1)
    assert sp.pallas_auto_profitable(1 << 20, 1, 1)
    # single big kernel: the Gauss'd 3-stage covers 65536..2^20 (the
    # 2-stage square split was retired — see BIG_NFFT_MIN's note)
    assert sp.BIG_NFFT_MIN == 1 << 16
    # shared per-sub policy (batch + streaming dispatchers): splits only
    # where multi-sub overflows VMEM while one subchannel fits
    assert sp.pallas_per_sub_profitable(1 << 20, 1, 2, "welch",
                                        contiguous=True)
    assert not sp.pallas_per_sub_profitable(1 << 19, 1, 2, "welch",
                                            contiguous=True)  # fused fits
    assert not sp.pallas_per_sub_profitable(1 << 20, 1, 1, "welch",
                                            contiguous=True)  # single sub
    assert not sp.pallas_per_sub_profitable(4096, 4, 100, "welch",
                                            contiguous=True)  # not big


@pytest.mark.parametrize("precision", ["exact", "display"])
def test_big3_kernel_matches_oracle_262144(precision):
    """262144-pt exercises the 3-stage kernel at a large factorization
    (exact tier runs the Gauss 3-mult complex products), welch nint=2 so
    the persistent-scratch accumulate runs too."""
    from pyspectrogram_tpu.ops import reference as oracle

    nfft, ntime, nsub, nint = 1 << 18, 1, 1, 2
    rng = np.random.default_rng(7)
    nsamp = nfft * nint * ntime
    starts = (np.arange(ntime) * nfft * nint).astype(np.int32)
    packed = rng.standard_normal((nsamp, nsub, 2)).astype(np.float32)
    psd = make_pallas_sti_psd(nfft=nfft, nint=nint, interpret=True,
                              contiguous=True, precision=precision)
    got = np.asarray(psd(jnp.asarray(to_plane_major(packed)),
                         jnp.asarray(starts)))
    x = packed[..., 0] + 1j * packed[..., 1]
    block = np.stack([x[s : s + nfft * nint] for s in starts], axis=1)
    want = oracle.sti_psd(block, nfft, nint=nint, mode="welch")
    np.testing.assert_allclose(got, np.moveaxis(want, 0, -1),
                               rtol=2e-3, atol=1e-7)


@pytest.mark.parametrize("mode,nint,contiguous,precision", [
    ("welch", 2, True, "exact"), ("welch", 3, False, "exact"),
    ("parity", 2, True, "exact"), ("welch", 2, True, "balanced"),
])
def test_big_kernel_matches_oracle_65536(mode, nint, contiguous, precision):
    """65536-pt fused kernel (3-stage 32*16*128 split, per-segment grid)
    against the NumPy oracle, interpret mode."""
    from pyspectrogram_tpu.ops import reference as oracle

    nfft, ntime, nsub = 1 << 16, 2, 1
    rng = np.random.default_rng(5)
    if contiguous:
        nsamp = nfft * nint * ntime
        starts = (np.arange(ntime) * nfft * nint).astype(np.int32)
    else:
        nsamp = nfft * nint * ntime + 256
        starts = np.linspace(0, nsamp - nfft * nint, ntime).astype(np.int32)
    packed = rng.standard_normal((nsamp, nsub, 2)).astype(np.float32)
    psd = make_pallas_sti_psd(nfft=nfft, nint=nint, mode=mode,
                              interpret=True, contiguous=contiguous,
                              precision=precision)
    got = np.asarray(psd(jnp.asarray(to_plane_major(packed)),
                         jnp.asarray(starts)))
    x = packed[..., 0] + 1j * packed[..., 1]
    block = np.stack([x[s : s + nfft * nint] for s in starts], axis=1)
    want = oracle.sti_psd(block, nfft, nint=nint, mode=mode)  # (nfft, t, sub)
    want_tm = np.moveaxis(want, 0, -1)
    np.testing.assert_allclose(got, want_tm, rtol=2e-3, atol=1e-7)


def test_big_kernel_dispatch_through_make_sti_fn_pm():
    """make_sti_fn_pm at 65536 builds the big kernel via fft_impl='pallas'
    and agrees with the XLA path."""
    nfft, nint, ntime, nsub = 1 << 16, 2, 2, 1
    nsamp = nfft * nint * ntime
    rng = np.random.default_rng(6)
    pm = rng.standard_normal((nsub * 2, nsamp)).astype(np.float32)
    starts = (np.arange(ntime) * nfft * nint).astype(np.int32)
    f_pal = stft.make_sti_fn_pm(nfft=nfft, nint=nint, fft_impl="pallas",
                                contiguous=True)
    f_xla = stft.make_sti_fn_pm(nfft=nfft, nint=nint, fft_impl="xla",
                                contiguous=True)
    a = f_pal(jnp.asarray(pm), jnp.asarray(starts))
    b = f_xla(jnp.asarray(pm), jnp.asarray(starts))
    np.testing.assert_allclose(np.asarray(a["sxx_dbfs"]),
                               np.asarray(b["sxx_dbfs"]), atol=0.02)
    np.testing.assert_allclose(np.asarray(a["sxx_med_dbfs"]),
                               np.asarray(b["sxx_med_dbfs"]), atol=0.02)


def test_auto_profitable_contiguous_floor():
    """Contiguous (wide lane-folded) batching makes the fused kernel win
    down to its 256-pt floor; gathered paths keep the 1024 floor."""
    from pyspectrogram_tpu.kernels import sti_pallas as sp

    assert sp.pallas_auto_profitable(256, contiguous=True)
    assert sp.pallas_auto_profitable(512, contiguous=True)
    assert not sp.pallas_auto_profitable(256)
    assert not sp.pallas_auto_profitable(512)
    assert sp.pallas_auto_profitable(1024)


def _overlap_oracle(buf, nfft, nint, hop, k, mode="welch", beta=1.7):
    """NumPy overlap-hop STI: column t's frame at element offset t*hop."""
    from pyspectrogram_tpu.ops.windows import get_window

    nsub = buf.shape[0] // 2
    frame_len = nfft * nint
    win = get_window(("kaiser", beta), nfft)
    c = (buf[0::2] + 1j * buf[1::2]).astype(np.complex128)
    nseg = nint if mode == "welch" else 1
    cols = np.empty((k, nsub, nfft))
    for t in range(k):
        fr = c[:, t * hop : t * hop + frame_len][:, : nseg * nfft]
        segs = fr.reshape(nsub, nseg, nfft)
        p = (np.abs(np.fft.fft(win * segs, axis=-1)) ** 2).mean(axis=1)
        cols[t] = np.fft.fftshift(p / win.sum() ** 2, axes=-1)
    return cols


@pytest.mark.parametrize("nfft,nint,hop,mode,k,precision", [
    (1024, 1, 512, "welch", 4, "exact"),    # classic 50% overlap (tb=4)
    (1024, 2, 1024, "welch", 4, "exact"),   # hop = nfft, frame 2*nfft
    (1024, 1, 384, "welch", 4, "exact"),    # lane-aligned, not nfft-div
    (2048, 2, 2048, "parity", 4, "exact"),  # parity: first nfft only
    (1024, 1, 512, "welch", 16, "exact"),   # deeper fold, one grid step
    (1024, 1, 512, "welch", 5, "exact"),    # k divisible by no rung
    (1024, 1, 512, "welch", 16, "display"),  # grouped chunk grid (g=16)
    (1024, 1, 512, "welch", 32, "display"),  # grouped, tb/g=2
])
def test_stream_kernel_overlap_hop_matches_oracle(nfft, nint, hop, mode,
                                                  k, precision):
    """The overlap-hop streaming kernel (r3 weak #4): VMEM-resident
    element-offset slicing equals the windowed-FFT oracle for hops the
    block-granular batch kernel cannot express. The display rows drive
    the wide_group chunk grid through the strided load_col path (CPU
    interpret runs the tier's matmuls in f32, so the oracle tolerance
    holds)."""
    from pyspectrogram_tpu.kernels.sti_pallas import (
        make_pallas_stream_psd,
        pallas_stream_supported,
    )

    nsub = 2
    frame_len = nfft * nint
    assert pallas_stream_supported(nfft, nint, hop, k, nsub, mode)
    rng = np.random.default_rng(5)
    buf = rng.standard_normal(
        (nsub * 2, frame_len - hop + k * hop)).astype(np.float32)
    f = make_pallas_stream_psd(nfft=nfft, nint=nint, hop=hop, mode=mode,
                               interpret=True, precision=precision)
    got = np.asarray(f(jnp.asarray(buf)))
    want = _overlap_oracle(buf, nfft, nint, hop, k, mode)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-7)


def test_stream_kernel_support_gates():
    from pyspectrogram_tpu.kernels.sti_pallas import pallas_stream_supported

    ok = dict(nfft=1024, nint=1, hop=512, k=4, nsub=2)
    assert pallas_stream_supported(**ok)
    # hop == frame_len is the contiguous kernel's case, not this one
    assert not pallas_stream_supported(1024, 1, 1024, 4, 2)
    # unaligned hop: frame slices would straddle lanes
    assert not pallas_stream_supported(1024, 1, 500, 4, 2)
    # giant transforms belong to the 3-stage kernel
    assert not pallas_stream_supported(1 << 16, 1, 1 << 15, 4, 2)
    # VMEM budget: an absurdly long buffer is refused
    assert not pallas_stream_supported(16384, 1, 8192, 4096, 2)
    # wide-path accounting (advisor r4): the gate must count what the
    # lane-folded build actually ships — tb-tiled window/twiddles, fold
    # temps, and the display tier's blockdiag'd (g*n1)^2 stage-1 — so a
    # long-k display push whose buffer ALONE would fit is refused...
    assert not pallas_stream_supported(1024, 1, 512, 2560, 2,
                                       precision="display")
    # ...while the same shape at a short k fits comfortably
    assert pallas_stream_supported(1024, 1, 512, 128, 2,
                                   precision="display")


def test_pick_impl_shared_policy(monkeypatch):
    """sti_pallas.pick_impl IS the dispatch policy for the single-chip
    program AND every shard_map tier's per-shard body: on TPU a 2^20
    2-sub config (multi-sub overflows VMEM, one sub fits) must pick the
    per-plane-pair launch split, not the 5-7x slower XLA fallback the
    sharded tier used to take."""
    import jax

    from pyspectrogram_tpu.kernels import sti_pallas as sp

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert sp.pick_impl(1 << 20, 1, 2, "welch", "exact", True) == "per-sub"
    assert sp.pick_impl(1 << 20, 1, 1, "welch", "exact", True) == "pallas"
    assert sp.pick_impl(4096, 4, 2, "welch", "exact", True) == "pallas"
    # explicit asks override
    assert sp.pick_impl(1 << 20, 1, 2, fft_impl="xla") == "xla"
    assert sp.pick_impl(1 << 20, 1, 2, fft_impl="pallas") == "pallas"
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert sp.pick_impl(4096, 4, 2, "welch", "exact", True) == "xla"
