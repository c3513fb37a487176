"""Batched STI: many same-shape requests in ONE device program.

The reference runs up to 7 concurrent tabs, each as its own Python thread
driving its own compute (reference: drfview.py:177-178, 1101-1104) — on a
TPU that strategy leaves the chip idle between many small dispatches.
Here B requests with identical shape knobs (nfft, nint, ntime, nsub,
mode, window) fold into a single kernel launch:

* plane-major request buffers stack to (B, nsub*2, L) and transpose to
  (nsub*2, B*L) — with L = ntime*frame_len, column t' = b*ntime + t of
  the merged buffer starts at t'*frame_len, so the CONTIGUOUS fused
  kernel consumes all B requests as one (B*ntime)-column STI with no
  gather and no kernel changes;
* per-request dBFS references ride a (B, 1, 1, 1) scale vector applied to
  the linear powers (the kernel runs at ref=1), so requests from
  different datasets batch together;
* medians are per-request: the bisection median vectorizes over the
  leading axis for free.

Amortizes per-dispatch overhead: the win is largest for many small
requests (the multi-tab GUI pattern).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pyspectrogram_tpu.ops import stft
from pyspectrogram_tpu.ops.windows import WindowSpec
from pyspectrogram_tpu.utils.config import resolve_time_span

#: single-chip batches at or above this size assemble request-by-request
#: through a PrefetchFeeder (reads overlap transfers, device-side merge).
#: Measured on the tunneled v5e (1024-pt display-tile tabs, ms/cycle,
#: merge vs feeder): 0.9 MB 77.5 vs 85.3 (per-request put overhead
#: dominates — keep the host merge), 2.5 MB 127.7 vs 116.6, 5.7 MB
#: 235.9 vs 208.8 (-11.5%), 22.9 MB ~equal (the transfer itself dwarfs
#: the overlappable read). The crossover sits between 1 and 2.5 MB; the
#: single-request tier keeps its own 32 MB knob (models.sti) because its
#: intra-request chunking pays a different overhead.
BATCH_PREFETCH_MIN_BYTES = 2 << 20


@functools.lru_cache(maxsize=64)
def make_batched_sti_fn_pm(
    *,
    nfft: int,
    nint: int = 1,
    ntime: int,
    mode: str = "welch",
    window: WindowSpec = ("kaiser", 1.7),
    eps: float = 1e-15,
    fft_impl: str = "auto",
    precision: str = "exact",
    tile=None,
):
    """Build ``f(samples_merged, inv_ref_sq) -> dict`` for B STIs at once.

    samples_merged: (nsub*2, B*ntime*nfft*nint) float32/int16 plane-major —
                request b's frames occupy columns [b*L, (b+1)*L) with
                L = ntime*frame_len, each packed contiguously at
                t*frame_len (i.e. the per-request buffers
                models.sti.assemble_device_block produces, laid
                side-by-side on the host — merging there is free, while a
                device-side transpose of a stacked (B, ...) array costs a
                full extra HBM pass);
    inv_ref_sq: (B,) float32 per-request 1/ref^2 dBFS normalization.

    Returns {"sxx_dbfs": (B, ntime, nsub, nfft),
             "sxx_med_dbfs": (B, nsub, nfft)}.

    With ``tile`` (a display.TileSpec — all B requests must share the crop
    plan, i.e. equal sample rate and frequency window), the display
    epilogue fuses into the same program and the signature grows a
    PER-REQUEST color operand: ``f(samples_merged, inv_ref_sq, qparams)``
    with qparams (B, 2) float32 rows of ``TileSpec.qparams`` — tabs with
    different color ranges share one compiled program (the program keys on
    ``tile.crop_key()`` only, same contract as stft.make_sti_fn_pm).
    Output swaps ``sxx_dbfs`` for ``tile``: (B, ntime, nsub, plot_n) uint8
    — the float spectra never leave HBM.
    """
    if tile is not None:
        canon = tile.crop_key()
        if tile != canon:
            inner_fn = make_batched_sti_fn_pm(
                nfft=nfft, nint=nint, ntime=ntime, mode=mode, window=window,
                eps=eps, fft_impl=fft_impl, precision=precision, tile=canon)
            default_qp = tile.qparams

            def batched_default(samples_merged, inv_ref_sq, qparams=None):
                if qparams is None:
                    qparams = np.broadcast_to(
                        default_qp, (np.shape(inv_ref_sq)[0], 2))
                return inner_fn(samples_merged, inv_ref_sq,
                                np.asarray(qparams, np.float32))

            return batched_default

    frame_len = nfft * nint
    inner = stft.make_sti_fn_pm(
        nfft=nfft, nint=nint, mode=mode, window=window, ref=1.0, eps=eps,
        fft_impl=fft_impl, contiguous=True, precision=precision,
        return_linear=True,
    )

    def scaled_powers(samples_merged, inv_ref_sq):
        nplanes, Ltot = samples_merged.shape
        nsub = nplanes // 2
        B = inv_ref_sq.shape[0]
        if Ltot != B * ntime * frame_len:
            raise ValueError(
                f"expected merged length {B * ntime * frame_len}, got {Ltot}")
        starts = jnp.arange(B * ntime, dtype=jnp.int32) * frame_len
        out = inner(samples_merged, starts)
        p = out["sxx"].reshape(B, ntime, nsub, nfft)
        p = p * inv_ref_sq.astype(p.dtype)[:, None, None, None]
        return p, jax.vmap(stft.median_over_time)(p)

    if tile is not None:
        from pyspectrogram_tpu.display.tile import quantize_tile_linear

        @jax.jit
        def batched_tile(samples_merged: jax.Array, inv_ref_sq: jax.Array,
                         qparams: jax.Array) -> dict:
            p, p_med = scaled_powers(samples_merged, inv_ref_sq)
            return {
                "tile": jax.vmap(
                    lambda pb, qp: quantize_tile_linear(pb, tile, eps, qp)
                )(p, qparams),
                "sxx_med_dbfs": stft.to_dbfs(p_med, eps),
            }

        return batched_tile

    @jax.jit
    def batched(samples_merged: jax.Array, inv_ref_sq: jax.Array) -> dict:
        p, p_med = scaled_powers(samples_merged, inv_ref_sq)
        return {
            "sxx_dbfs": stft.to_dbfs(p, eps),
            "sxx_med_dbfs": stft.to_dbfs(p_med, eps),
        }

    return batched


@functools.lru_cache(maxsize=32)
def make_batched_sti_fn_mesh(
    mesh,
    *,
    nfft: int,
    nint: int = 1,
    ntime: int,
    B: int,
    mode: str = "welch",
    window: WindowSpec = ("kaiser", 1.7),
    eps: float = 1e-15,
    fft_impl: str = "auto",
    precision: str = "exact",
):
    """Mesh-DP: B same-shape requests shard over the mesh ``time`` axis in
    ONE device program (SURVEY.md section 2.3 DP row — the multi-chip
    analogue of the reference's 7 concurrent tabs, drfview.py:177-178).

    The merged (B*ntime)-column buffer is already a time-shardable axis,
    so unlike the single-request tier the SAMPLES shard too — each device
    receives only its own column range (1/ndev of the transfer bytes),
    and plane-row pairs shard over ``chan``. Per-request medians gather
    linear powers over ICI once and reduce locally, scaled by each
    column's own dBFS reference.

    Returned ``f(samples_merged, inv_ref_sq)``:
      samples_merged: (nsub*2, padded_cols*frame_len) plane-major, columns
                      packed at t'*frame_len, request b at [b*ntime,
                      (b+1)*ntime), zero-padded to ``f.padded_cols``
                      columns (a time-axis multiple);
      inv_ref_sq:     (B,) float32 per-request 1/ref^2.
    Returns {"sxx_dbfs": (padded_cols, nsub, nfft) sharded (time, chan),
             "sxx_med_dbfs": (B, nsub, nfft) sharded (chan,)}.
    """
    import jax
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pyspectrogram_tpu.parallel.mesh import (
        CHAN_AXIS,
        TIME_AXIS,
        pad_to_multiple,
    )
    from pyspectrogram_tpu.parallel.sharded import make_local_sti

    ndev_t = mesh.shape[TIME_AXIS]
    frame_len = nfft * nint
    total_cols = B * ntime
    padded_cols = pad_to_multiple(total_cols, ndev_t)
    local_cols = padded_cols // ndev_t
    local_sti = make_local_sti(
        nfft=nfft, nint=nint, mode=mode, window=window, ref=1.0,
        fft_impl=fft_impl, precision=precision, contiguous=True,
    )

    def local(samples_local, inv_ref_sq):
        starts = jnp.arange(local_cols, dtype=jnp.int32) * frame_len
        p = local_sti(samples_local, starts)      # (local_cols, nsub_l, nfft)
        # column t' belongs to request t' // ntime; padding columns clamp
        # to the last request (they are dropped before the median anyway)
        t0 = jax.lax.axis_index(TIME_AXIS) * local_cols
        b_idx = jnp.minimum((t0 + jnp.arange(local_cols)) // ntime, B - 1)
        p = p * inv_ref_sq.astype(p.dtype)[b_idx][:, None, None]
        from pyspectrogram_tpu.parallel.sharded import (
            GATHERED_MEDIAN_MAX_BYTES)

        cube = padded_cols * p.shape[1] * nfft * 4
        if cube <= GATHERED_MEDIAN_MAX_BYTES:
            p_all = jax.lax.all_gather(p, TIME_AXIS, axis=0, tiled=True)
            p_req = p_all[:total_cols].reshape(B, ntime, p.shape[1], nfft)
            med = jax.vmap(stft.median_over_time)(p_req)  # (B, nsub_l, nfft)
        else:
            # huge B*ntime: per-request psum'd bisection over each
            # request's global column span — no device gathers the cube
            # (same budget policy as the sharded tier)
            med = jnp.stack([
                stft.median_over_time_psum(
                    p, TIME_AXIS, row_window=(b * ntime, (b + 1) * ntime))
                for b in range(B)])
        return {
            "sxx_dbfs": stft.to_dbfs(p, eps),
            "sxx_med_dbfs": stft.to_dbfs(med, eps),
        }

    in_specs = (P(CHAN_AXIS, TIME_AXIS), P())
    out_specs = {
        "sxx_dbfs": P(TIME_AXIS, CHAN_AXIS, None),
        "sxx_med_dbfs": P(None, CHAN_AXIS, None),
    }
    fn = jax.jit(shard_map(local, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False))
    fn.input_shardings = lambda: tuple(
        NamedSharding(mesh, s) for s in in_specs)
    fn.padded_cols = padded_cols
    return fn


class BatchedStiPipeline:
    """Compute one STI per (dataset, channel) pair in a single launch.

    All requests share one SpectrogramConfig's shape knobs; time spans and
    dBFS references may differ per request. The host side reuses
    models.sti's coalesced assembly per request; the device side runs one
    fused program over the concatenated columns. With ``mesh``, the merged
    columns (and the sample bytes) shard over the mesh ``time`` axis and
    subchannel plane pairs over ``chan`` (see make_batched_sti_fn_mesh).
    """

    def __init__(self, requests: Sequence, config, mesh=None):
        """requests: sequence of (RFDataset, channel_entry_or_None)."""
        self.requests = list(requests)
        self.config = config
        self.mesh = mesh

    def compute(self, time_spans: Optional[Sequence] = None,
                color_ranges: Optional[Sequence] = None,
                refresh_bounds: bool = True):
        """Returns a list of StiResult, one per request (same order).

        ``color_ranges``: per-request (cmin, cmax) dBFS color ranges for
        display-tile mode (defaults to the shared config's); tile mode is
        on when ``config.display_tile`` is set — the requests must then
        share a crop plan (equal sample rates), and each result carries a
        uint8 ``tile`` instead of float spectra, exactly like the
        single-request tile tier (models.sti).
        ``refresh_bounds=False`` skips the per-request bounds stat when
        the caller already refreshed this cycle (runtime.scheduler)."""
        from pyspectrogram_tpu.io.time_util import (
            samples_to_datetime64,
            time_to_sample,
        )
        from pyspectrogram_tpu.models.sti import StiResult, assemble_device_block

        cfg = self.config
        if cfg.display_tile and self.mesh is not None:
            raise ValueError(
                "display-tile batching is single-chip only (the mesh tier "
                "reads back float spectra) — unset display_tile or mesh")
        frame_len = cfg.nfft * cfg.nint
        plans, refs, metas, specs = [], [], [], []
        nsub_each = []
        for i, (ds, entry) in enumerate(self.requests):
            chan, isub = ds._split_entry(entry or ds.channels[0])
            sr = ds.sr_dict[chan]
            if refresh_bounds:
                ds.bnds_update()
            # None sides mean that edge of the capture (utils.config)
            st_time, end_time = resolve_time_span(
                time_spans[i] if (time_spans is not None
                                  and time_spans[i] is not None)
                else cfg.time_span, ds.time_bnds)
            s_samp = time_to_sample(st_time, sr)
            e_samp = time_to_sample(end_time, sr)
            n_st = ds.sti_frame_starts(s_samp, e_samp, cfg.nfft, cfg.nint,
                                       cfg.ntime)
            plans.append((ds, chan, isub, n_st))
            nsub_each.append(1 if isub is not None
                             else len(ds.chan_2sub[chan]))
            refs.append(1.0 / float(ds.ref_dict[chan]) ** 2)
            metas.append((sr, n_st))
            if cfg.display_tile:
                from pyspectrogram_tpu.display.tile import make_tile_spec

                specs.append(make_tile_spec(
                    stft.shifted_freqs(cfg.nfft, sr), cfg.freq_window_khz,
                    color_ranges[i] if color_ranges is not None
                    else cfg.color_range_db))

        if len(set(nsub_each)) != 1:
            raise ValueError(
                f"batched requests need equal subchannel counts, got "
                f"{set(nsub_each)}")

        # tile mode needs ONE crop plan shared by the whole launch (the
        # color ranges ride per-request as runtime operands); an empty
        # frequency window (spec None) falls back to the float path like
        # the single-request tier
        spec = None
        if cfg.display_tile and specs and all(s is not None for s in specs):
            crops = {s.crop_key() for s in specs}
            if len(crops) != 1:
                raise ValueError(
                    "display-tile batching needs one shared crop plan — "
                    "the requests' sample rates differ")
            (spec,) = crops
            qparams = np.stack([s.qparams for s in specs])

        # -------- assembly: read + pack every request's sample buffer.
        # A single-chip batch above BATCH_PREFETCH_MIN_BYTES streams
        # request-by-request through a PrefetchFeeder (io.ingest): the
        # HDF5 read+pack of request i+1 overlaps the host->device
        # transfer of request i, and the merged buffer becomes a
        # device-side concat — no extra host copy of the whole batch.
        # Small batches keep the one-copy host merge (per-request puts
        # cost more than they overlap); mesh batches must device_put in
        # one sharded piece either way.
        B = len(plans)
        masks: list = [None] * B

        def produce(i: int):
            ds_i, chan_i, isub_i, n_st_i = plans[i]
            pm, _, col_mask = assemble_device_block(ds_i, chan_i, isub_i,
                                                    n_st_i, frame_len)
            masks[i] = col_mask
            return pm

        est_bytes = 2 * nsub_each[0] * B * cfg.ntime * frame_len * 4
        merged_dev = None
        if (self.mesh is None and B > 1
                and est_bytes >= BATCH_PREFETCH_MIN_BYTES):
            from pyspectrogram_tpu.io.ingest import PrefetchFeeder

            with PrefetchFeeder(produce, B, depth=2) as feeder:
                dev_blocks = list(feeder)
            if len({b.dtype for b in dev_blocks}) != 1:
                # mixed storage dtypes promote value-preserving to f32,
                # matching the host-merge path's mdtype rule
                dev_blocks = [b.astype(jnp.float32) for b in dev_blocks]
            L = dev_blocks[0].shape[1]
            merged_dev = jnp.concatenate(dev_blocks, axis=1)
        else:
            blocks = [produce(i) for i in range(B)]
            L = blocks[0].shape[1]

        if self.mesh is not None:
            from pyspectrogram_tpu.parallel.mesh import CHAN_AXIS

            chan = dict(self.mesh.shape).get(CHAN_AXIS, 1)
            nsub = nsub_each[0]
            if nsub % chan:
                # an indivisible split scatters r/i plane pairs across
                # devices and each shard pairs a sub's imag plane with
                # the next sub's real plane — well-shaped garbage
                raise ValueError(
                    f"requests have {nsub} subchannel(s), which does not "
                    f"divide over the mesh's {chan}-way '{CHAN_AXIS}' "
                    f"axis — use a chan axis size that divides nsub "
                    f"(or 1)")
            fn = make_batched_sti_fn_mesh(
                self.mesh, nfft=cfg.nfft, nint=cfg.nint, ntime=cfg.ntime,
                B=B, mode=cfg.mode, window=cfg.window, eps=cfg.eps,
                precision=cfg.precision,
            )
        inv_refs = jnp.asarray(np.asarray(refs, np.float32))
        if merged_dev is None:
            # side-by-side merged layout (see make_batched_sti_fn_pm) —
            # built on the host where the copy is unavoidable anyway
            frame_len_total = (fn.padded_cols * frame_len
                               if self.mesh is not None else B * L)
            dtypes = {b.dtype for b in blocks}
            mdtype = blocks[0].dtype if len(dtypes) == 1 else np.float32
            merged = np.zeros((blocks[0].shape[0], frame_len_total), mdtype)
            for b, blk in enumerate(blocks):
                merged[:, b * L : (b + 1) * L] = blk
        if self.mesh is not None:
            import jax

            s_sh, r_sh = fn.input_shardings()
            out = fn(jax.device_put(jnp.asarray(merged), s_sh),
                     jax.device_put(inv_refs, r_sh))
            sxx_b = np.asarray(out["sxx_dbfs"])[: B * cfg.ntime].reshape(
                B, cfg.ntime, -1, cfg.nfft)
        else:
            fn = make_batched_sti_fn_pm(
                nfft=cfg.nfft, nint=cfg.nint, ntime=cfg.ntime, mode=cfg.mode,
                window=cfg.window, eps=cfg.eps, precision=cfg.precision,
                tile=spec,
            )
            dev = (merged_dev if merged_dev is not None
                   else jnp.asarray(merged))
            if spec is not None:
                out = fn(dev, inv_refs, qparams)
                tile_b = np.asarray(out["tile"])
            else:
                out = fn(dev, inv_refs)
                sxx_b = np.asarray(out["sxx_dbfs"])
        med_b = np.asarray(out["sxx_med_dbfs"])

        results = []
        for i, ((sr, n_st), col_mask) in enumerate(zip(metas, masks)):
            freqs = stft.shifted_freqs(cfg.nfft, sr)
            if spec is not None:
                from pyspectrogram_tpu.display.tile import tile_freqs

                sxx_dbfs = None  # floats intentionally stay on device
                tile_i, plotf = tile_b[i], tile_freqs(specs[i], freqs)
            else:
                sxx_dbfs = stft.to_reference_layout(sxx_b[i])
                tile_i = plotf = None
            results.append(StiResult(
                iteration=0,
                times=samples_to_datetime64(n_st, sr),
                freqs=freqs,
                sxx_dbfs=sxx_dbfs,
                sxx_med_dbfs=np.moveaxis(med_b[i], -1, 0),
                sample_rate=sr,
                frame_starts=np.asarray(n_st),
                mask=col_mask,
                tile=tile_i,
                plot_freqs=plotf,
            ))
        return results
