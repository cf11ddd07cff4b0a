"""Single-program multi-band receiver (round 5).

`track multi` runs every channel of ONE stream in one compiled scan;
this module goes the rest of the way: every channel of EVERY band in
one fused-kernel launch per chunk.  Each band's int8 stream is packed
into its own fixed-capacity SEGMENT of one shared device chunk, and
each channel carries its band's segment end as its PER-CHANNEL data
end (track_scan's vector chunk_len, round 5) — the kernel's per-channel
ptr state needs no other changes, since channels always addressed the
shared chunk independently.

Why: the 2017 reference workload is 11 channels over 3 bands.  Run as
three per-band programs the receiver pays 3x the per-chunk fixed costs
(dispatch, readback RTT, scan tails) and pads each band's channel count
to the kernel's KCH granularity separately (4+5+2 -> 4+8+4 kernel
channels); packed into ONE program it is 11 -> 12, one dispatch chain,
one readback per chunk — the difference between ~1.45x and >2x realtime
device-side for the full workload (BASELINE.md round-5 receiver table).

Scope: tracking incl. per-channel extended-coherent spans (the
overlay/coh sigp lanes ride along, round 5); no recovery/checkpoint/
mesh (use the per-band `track multi` programs for those).

Setup mirrors track/driver.track_file's multi branch (runtime sigp
lanes, shape envelope, per-channel code rows); the streaming loop is
the per-band generalization of its int8 streaming loop.
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax.numpy as jnp

from gnss_dsp_tpu.ops import cplx, nco
from gnss_dsp_tpu.track.driver import (
    _PrefetchReader, _pallas_ok, build_code_rows, make_params,
)
from gnss_dsp_tpu.track.engine import (
    init_state, sigp_row, subc_kind, track_scan,
)
from gnss_dsp_tpu.utils.twofloat import tf_from_f64


def track_receiver(bands, fs: float, loop_dwells=(500, 500),
                   chunk_ms: float = 2000.0, emit=None,
                   max_blocks: int | None = None,
                   coherent_blocks: int = 1):
    """Track every channel of every band in ONE compiled program.

    bands: list of (fp, sigs, channels, coffsets) — one entry per band
    stream (fp: binary int8 I/Q stream; sigs/channels/coffsets: same
    per-channel contracts as track_file's multi mode).  All bands share
    one sample rate `fs`.

    coherent_blocks: extended-coherent span per channel, track_file
    semantics (-1 = each signal's own overlay length; overlay-free
    signals stay non-coherent; channels use their overlay_phase).

    emit(global_channel_index, row) as in track_file; returns the flat
    channel list (band-major order).  Rows accumulate on the channels
    when emit is None.
    """
    sigs, channels, coffsets, band_of = [], [], [], []
    for b, (fp, bs, bc, bco) in enumerate(bands):
        assert len(bs) == len(bc) == len(bco)
        sigs += list(bs)
        channels += list(bc)
        coffsets += list(bco)
        band_of += [b] * len(bc)
    B = len(bands)
    n_emit = len(channels)
    # pad the channel list to a multiple of 4 with clones of channel 0
    # so the fused kernel groups KCH = 4 channels per grid step (11
    # channels would force KCH = 1 — one channel per step, no
    # instruction-stream interleaving); clone rows are never emitted
    pad = (-len(channels)) % 4
    if pad:
        c0 = channels[0]
        from gnss_dsp_tpu.track.driver import TrackChannel as _TC

        channels = channels + [
            _TC(prn=c0.prn, doppler=c0.doppler,
                code_offset=c0.code_offset,
                carrier_phase=c0.carrier_phase,
                pll_from_start=c0.pll_from_start) for _ in range(pad)]
        sigs = sigs + [sigs[0]] * pad
        coffsets = coffsets + [coffsets[0]] * pad
        band_of = band_of + [band_of[0]] * pad
    C = len(channels)

    # per-channel coherent spans (track_file semantics)
    def _ovl_len(s):
        return (len(s.secondary(1)) if s.secondary is not None else 1)

    def _chan_M(s):
        if coherent_blocks == -1:
            return max(_ovl_len(s), 1)
        return int(coherent_blocks)

    if coherent_blocks == -1 or coherent_blocks > 1:
        for s in sigs:
            if _chan_M(s) > 1:
                assert s.sub_blocks == 1, (s.name, s.sub_blocks)
        coh_static = max(_chan_M(s) for s in sigs)
    else:
        coh_static = 1

    use_pallas = (_pallas_ok(sigs[0], fs)
                  and not os.environ.get("GNSS_DSP_NO_FUSED"))
    alls = [make_params(s, fs, 0.0, loop_dwells,
                        pll_from_start=all(c.pll_from_start
                                           for c in channels),
                        use_pallas=use_pallas,
                        coherent_blocks=coh_static) for s in sigs]
    params = alls[0]._replace(
        nmax=max(q.nmax for q in alls),
        pallas_tiles=max(q.pallas_tiles for q in alls),
        pallas_w=max(q.pallas_w for q in alls),
        pallas_stream=any(q.pallas_stream for q in alls),
        fused_scan=all(q.fused_scan for q in alls),
        pallas_v2=all(q.pallas_v2 for q in alls),
    )

    # runtime sigp rows + static-kind normalization (track_file multi)
    def _row(s):
        cf_hi_t, cf_lo_t = tf_from_f64(
            np.float64(s.chip_rate) / np.float64(fs))
        return sigp_row(cf_hi_t, cf_lo_t, s.el_spacing, s.code_length,
                        fs * 0.001 * s.code_period_ms, s.sub_blocks,
                        str(s.subcarrier))

    sigp = jnp.asarray(np.stack([_row(s) for s in sigs]))
    overlay = None
    if coh_static > 1:
        from gnss_dsp_tpu.track.engine import (
            SIGP_COH as _SIGP_COH, SIGP_NOV as _SIGP_NOV)

        secs = []
        for s, ch in zip(sigs, channels):
            sec = (s.secondary(ch.prn)
                   if _chan_M(s) > 1 and s.secondary is not None
                   else np.ones(1, np.int8))
            secs.append(np.roll(np.asarray(sec, np.float32),
                                -int(ch.overlay_phase)))
        nov_max = max(len(r) for r in secs)
        ovl = np.zeros((C, nov_max), np.float32)
        for k, r in enumerate(secs):
            ovl[k, :len(r)] = r
        overlay = jnp.asarray(ovl)
        sigp = sigp.at[:, _SIGP_COH].set(
            jnp.asarray([_chan_M(s) for s in sigs], jnp.float32))
        sigp = sigp.at[:, _SIGP_NOV].set(
            jnp.asarray([len(r) for r in secs], jnp.float32))
    kinds = {subc_kind(str(s.subcarrier)) for s in sigs}
    kind = "subc" if kinds - {"none"} else "none"
    if "tmboc" in kinds:
        kind = "tmboc"
    if not os.environ.get("GNSS_DSP_PALLAS_V1"):
        params = params._replace(
            coffset_df_fixed=0, carrier_ratio=1.0,
            chip_rate=0.0, cf_hi=0.0, cf_lo=0.0,
            code_length=0, el_spacing=0.0, code_period_ms=0.0,
            sub=0, subcarrier=kind)

    tabs = [np.asarray(s.code_table((c.prn,))[0], np.int8)
            for s, c in zip(sigs, channels)]
    Lmax = max(t.shape[0] for t in tabs)
    code_np = np.zeros((C, Lmax), np.int8)
    for k, t in enumerate(tabs):
        code_np[k, : t.shape[0]] = t
    code_tab = jnp.asarray(code_np)
    ratios = jnp.asarray(np.array(
        [s.track_carrier_ratio(c.prn) for s, c in zip(sigs, channels)],
        np.float32))
    coffset_df = jnp.asarray(np.array(
        [nco.freq_to_fixed(-(co + (s.fdma_hz or 0.0) * c.prn) / fs)
         for s, c, co in zip(sigs, channels, coffsets)], np.int32))

    code_rows_ext = None
    pad_extra = params.nmax
    if params.use_pallas:
        per = [build_code_rows(tabs[k][None, :], params,
                               sigs[k].chip_rate / fs)
               for k in range(C)]
        pad_extra = max(p[1] for p in per)
        wmax = max(p[0].shape[1] for p in per)
        rows = np.zeros((C, wmax), np.float32)
        for k, (r, _) in enumerate(per):
            rows[k, : r.shape[1]] = r[0]
        code_rows_ext = jnp.asarray(rows)

    chunk_samples = int(fs * chunk_ms / 1000.0)
    # fixed per-band segment capacity: buffered data (chunk + nmax)
    # plus the window margin, rounded to whole kernel tiles
    seg_cap = chunk_samples + params.nmax + pad_extra
    seg_cap += (-seg_cap) % 1024
    seg_off = [b * seg_cap for b in range(B)]
    sub_ms = min(s.code_period_ms / s.sub_blocks for s in sigs)
    blocks_per_scan = int(chunk_ms / sub_ms) + 2

    # per-channel alignment to the first code boundary, segment-offset
    ptr0 = np.zeros(C, np.int32)
    code_p0 = np.zeros(C, np.float64)
    for k, ch in enumerate(channels):
        s = sigs[k]
        Lk = s.code_length
        n0 = int(fs * 0.001 * s.code_period_ms * (Lk - ch.code_offset) / Lk)
        ptr0[k] = seg_off[band_of[k]] + n0
        code_p0[k] = ch.code_offset + n0 * (s.chip_rate / fs)
    state = init_state(
        code_p=code_p0, code_f_off=np.zeros(C),
        carrier_p=np.array([c.carrier_phase for c in channels]),
        carrier_f=np.array([c.doppler for c in channels]),
        ptr=ptr0)

    def emit_rows(rows_f, rows_i, nb):
        rows_f = np.asarray(rows_f)
        rows_i = np.asarray(rows_i)
        any_row = False
        for blk in range(nb):
            for k, ch in enumerate(channels):
                nn = int(rows_i[blk, k, 0])
                if nn == 0:
                    continue
                any_row = True
                if k >= n_emit:          # KCH-padding clone of channel 0
                    continue
                ch.samp += nn
                ch.carrier_cyc += int(rows_i[blk, k, 1])
                ch.code_cyc += int(rows_i[blk, k, 2])
                f = rows_f[blk, k]
                row = {
                    "block": int(f[0]), "p_re": float(f[1]),
                    "p_im": float(f[2]), "carrier_f": float(f[3]),
                    "code_f_offset": float(f[4]), "phase_deg": float(f[5]),
                    "early": float(f[6]), "prompt": float(f[7]),
                    "late": float(f[8]), "code_cyc": ch.code_cyc,
                    "code_p": float(f[9]), "carrier_cyc": ch.carrier_cyc,
                    "carrier_p": float(f[10]), "samp": ch.samp,
                }
                if emit is not None:
                    emit(k, row)
                else:
                    ch.rows.append(row)
        return any_row

    readers = [_PrefetchReader(fp, chunk_samples + pad_extra)
               for fp, *_ in bands]
    bufs = [np.zeros(0, np.int8) for _ in range(B)]
    total_blocks = 0
    timing = bool(os.environ.get("GNSS_DSP_TIMING"))
    t_read = t_up = t_scan = 0.0
    while True:
        t0 = time.perf_counter()
        nbufs = []
        for b in range(B):
            want = chunk_samples + params.nmax - len(bufs[b]) // 2
            if want > 0:
                xx = readers[b].take(want)
                if xx is not None and len(xx):
                    bufs[b] = np.concatenate([bufs[b], xx])
            nbufs.append(len(bufs[b]) // 2)
        if not any(nbufs):
            break
        t_read += time.perf_counter() - t0

        nb = blocks_per_scan
        if max_blocks is not None:
            nb = min(nb, max_blocks - total_blocks)
            if nb <= 0:
                break

        # assemble the segmented chunk: band b's bytes at its fixed
        # offset, zero margin after each band's data (the int8 zero
        # pad converts to 0.0 samples on device)
        t0 = time.perf_counter()
        assembled = np.zeros(2 * B * seg_cap, np.int8)
        for b in range(B):
            assembled[2 * seg_off[b]:2 * seg_off[b] + len(bufs[b])] = bufs[b]
        if os.environ.get("GNSS_DSP_UPLOAD_INT4"):
            # opt-in 4-bit front end: halves the host-link bytes again
            # (1 B/sample) at the classic coarse-quantization C/N0 cost
            x_dev = cplx.from_int4_iq(cplx.pack_int4_host(assembled))
        else:
            x_dev = cplx.from_int8_iq(assembled)
        chunk_end = jnp.asarray(
            np.array([seg_off[band_of[k]] + nbufs[band_of[k]]
                      for k in range(C)], np.int32))
        if timing:
            np.asarray(x_dev[0][:1])
            t_up += time.perf_counter() - t0
            t0 = time.perf_counter()
        state = state._replace(stalled=jnp.zeros_like(state.stalled))
        state, rows_f, rows_i = track_scan(
            x_dev, chunk_end, code_tab, state, params, nb,
            ratios=ratios, code_rows_ext=code_rows_ext,
            coffset_df=coffset_df, sigp=sigp, overlay=overlay)
        emitted_any = emit_rows(rows_f, rows_i, nb)
        if timing:
            t_scan += time.perf_counter() - t0
        total_blocks += nb
        if max_blocks is not None and total_blocks >= max_blocks:
            break

        # per-band rebase: drop each band's fully-consumed samples
        ptrs = np.asarray(state.ptr)
        new_ptrs = ptrs.copy()
        for b in range(B):
            ks = [k for k in range(C) if band_of[k] == b]
            consumed = int(min(ptrs[k] for k in ks) - seg_off[b])
            consumed = max(consumed, 0)
            bufs[b] = bufs[b][2 * consumed:]
            for k in ks:
                new_ptrs[k] = ptrs[k] - consumed
        state = state._replace(ptr=jnp.asarray(new_ptrs, jnp.int32))

        if all(r.done for r in readers) and not emitted_any:
            break
        if (all(r.done for r in readers)
                and bool(np.asarray(state.stalled).all())):
            break
    if timing:
        import sys as _sys

        print(f"[track_receiver timing] read-wait {t_read:.2f} s  "
              f"upload+convert {t_up:.2f} s  scan+rows {t_scan:.2f} s",
              file=_sys.stderr)
    return channels[:n_emit]
