"""Whole-loop fused tracking kernel: N blocks per launch, state in SMEM.

Round-2 measurement (tools/bench_kernel_scan.py, BENCH_CARRY=2): a
lax.scan whose carry feeds the next step's pallas_call serializes kernel
launches — each step pays the full serial grid latency (~240 us at C=32,
~1.4 ms at C=256) instead of the pipelined rate (82/101 us), because the
sequential dependence blocks cross-launch overlap.  The tracking loop's
dependence is real physics (the loop filter closes over each block's
correlators, track-gps-l1.py:50-92), so the fix is not more pipelining —
it is fewer launches: run the WHOLE per-block recurrence inside ONE
kernel.

Design:
  * grid = (n_blocks, C // KCH), row-major.  Each grid step processes
    KCH channels' block b end to end: geometry -> correlate (shared
    tile_contrib math with the v2 kernel) -> loop filter -> row write ->
    state write.  The KCH channels are INDEPENDENT instruction streams,
    so the in-kernel scheduler can interleave one channel's MXU passes
    with another's VPU pipeline — the single-channel body is
    latency-bound, not throughput-bound.
  * per-channel loop state lives in SMEM scratch for the whole launch
    (initialized from prefetch args at step 0, written to SMEM outputs
    at b == n_blocks-1).  The sequential dependence becomes a chain of
    in-kernel scalar ops — no XLA glue, no launch boundaries.
  * sample windows are fetched by MANUAL double-buffered DMA from the
    HBM-resident chunk: BlockSpec index maps cannot see carried state
    (ptr is state), so at each step the kernel prefetches the NEXT
    step's windows (those channels' state was finalized a full block
    earlier — safe whenever the grid has >= 2 channel groups; with one
    group the fetch is issued after the state update instead) while
    computing on the current ones.
  * the loop filter (discriminators, envelopes — ops/discriminators.py
    semantics) runs LANE-WISE on the E/P/L vector (polynomial
    atan/atan2 in ops/kmath — Mosaic has no atan primitive); prompt1
    history lives as a VMEM lane vector, so only the three loop errors
    (e_fll, e_pll, e_dll) cross into the scalar domain per block.
    Code-phase arithmetic uses the same two-float scalar ops as the
    engine (utils/twofloat), so trajectories match the scan path.
  * rows are emitted as one f32 [B, C, 128] tensor: lanes 0..10 are the
    float row (engine ROW_FIELDS order), lanes 11..13 carry the int row
    (n, carrier_dcyc, code_dcyc — all exact in f32), NaN/0 when the
    channel has exhausted the chunk (ok == False), matching track_scan.

Scope (round 4 — widened from the BPSK sub==1 fast path): every
subcarrier family (BOC/CBOC/TMBOC/RZ ride the 16-row per-lag operand
plan, pallas_track2.plan_rows), sub-divided code periods (e1b x4,
l1c/b1c x10, l2cm x20, l2cl x1500, glonass-p x1000 — the sub-window
geometry runs in the kernel's scalar domain), HBM-streamed long
codes (the per-tile code window is DMA'd from the HBM-resident
extended row exactly like the v2 scan kernel's stream path),
extended-coherent overlay tracking (round 4.2: overlay wipe + M-period
cacc accumulator lane row + boundary-gated loop filter — see
track/driver.py coh handling), and mesh-sharded channels (round 4.2:
parallel/track.track_scan_sharded routes each device's shard through
this kernel under shard_map).  Still excluded (scan engine only):
unknown-code recovery (nco.accum code-bin accumulation).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnss_dsp_tpu.ops import kmath
from gnss_dsp_tpu.ops.pallas_track import TILE, LEAD  # noqa: F401
from gnss_dsp_tpu.ops.pallas_track2 import (
    _next_pow2, finalize_contrib, tile_contrib,
)
from gnss_dsp_tpu.utils import twofloat as tf

_NAN = np.float32(np.nan)
_PI = np.float32(np.pi)

# fused-kernel tile size.  2048 was measured SLOWER (163 vs 155 ms at
# C=32/NB=900): halving the per-tile fixed costs loses to the doubled
# a'-factorization operand (A 4->8, R 32->64 at GPS L1 cf), whose
# masking cost scales with Ap * samples.  The driver sizes extend_code
# margins and chunk padding for this window (track/driver.build_code_rows)
FUSED_TILE = 1024

# ablation probe (perf diagnosis only): "notile" skips the correlator
# tile loop, "nolf" skips the loop filter / discriminators
import os as _os  # noqa: E402
_PROBE = _os.environ.get("GNSS_DSP_FUSED_PROBE", "")

# s_i32 lanes (per channel)
(_I_PTR, _I_BLOCK, _I_COFF_P, _I_COFF_DF, _I_STALLED, _I_CHUNKLEN,
 _I_NFULL, _I_SUBJ) = range(8)
_NI = 8
# s_f32 lanes (per channel): loop state + the runtime signal constants
# (engine.SIGP_* — static params split the compile cache per family) +
# the 6 extended-coherent accumulator lanes (engine TrackState.cacc:
# E_re, E_im, P_re, P_im, L_re, L_im; zeros when coh_blocks == 1)
(_F_CP_HI, _F_CP_LO, _F_CFO, _F_CARR_P, _F_CARR_F,
 _F_P1RE, _F_P1IM, _F_CE1, _F_DE1, _F_RATIO,
 _F_CFH, _F_CFL, _F_EL, _F_L, _F_SPP, _F_SUB,
 _F_A0, _F_A1, _F_A6, _F_COH, _F_NOV, _F_TM) = range(22)
_F_CACC = 22
_NF = 28


def _fixed_bits(frac):
    """floor(frac * 2^32) as int32 bits (frac in [0, 1)), built from two
    16-bit halves — a direct f32->uint32 convert would clamp at 2^31 on
    the scalar core.  Matches ops/nco.freq_to_fixed_jnp bit-for-bit."""
    f16 = frac * jnp.float32(65536.0)                 # exact: exponent shift
    hi = jnp.floor(f16)
    lo = jnp.floor((f16 - hi) * jnp.float32(65536.0))
    return (jax.lax.shift_left(hi.astype(jnp.int32), 16)
            + lo.astype(jnp.int32))


def _kernel(s_i32, s_f32, ovl_ref, xr_hbm, xi_hbm, code_ref,
            rows_ref, sti_out, stf_out,
            sm_i, sm_f, buf, sems, acc, p1v, caccv, cwin=None, csem=None,
            *, B, C, KCH, n_tiles, W, tsz, nchunk, nov, p):
    """p is the TrackParams NamedTuple (static python values).  ovl_ref
    [C, nov] is the per-channel secondary-overlay chip table (pre-rolled
    by overlay_phase; all-ones when coh_blocks == 1)."""
    b = pl.program_id(0)
    g = pl.program_id(1)                     # channel-group index
    NG = C // KCH
    idx = b * NG + g
    grid_tiles = n_tiles + 1
    WIN8 = grid_tiles * (tsz // 128)         # window size in 128-lane rows
    fs = np.float32(p.fs)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    zv = jnp.zeros((1, 128), jnp.float32)
    m2 = (lane == 2).astype(jnp.float32)
    m23 = ((lane == 2) | (lane == 3)).astype(jnp.float32)

    def window_rows(chan):
        """Aligned window start (in 128-lane rows) for a channel's ptr."""
        ptr = sm_i[chan, _I_PTR]
        ptr_k = jnp.clip(ptr, 0, nchunk - grid_tiles * tsz)
        return (ptr_k // tsz) * (tsz // 128)

    def start_fetch(slot, group):
        for k in range(KCH):
            wa8 = window_rows(group * KCH + k)
            for plane, src in ((0, xr_hbm), (1, xi_hbm)):
                pltpu.make_async_copy(
                    src.at[pl.ds(wa8, WIN8), :],
                    buf.at[slot, k, plane],
                    sems.at[slot, k, plane],
                ).start()

    def wait_fetch(slot):
        for k in range(KCH):
            for plane, src in ((0, xr_hbm), (1, xi_hbm)):
                pltpu.make_async_copy(
                    src.at[pl.ds(0, WIN8), :], buf.at[slot, k, plane],
                    sems.at[slot, k, plane],
                ).wait()

    # ---- step 0: load every channel's state into SMEM, start own DMAs
    @pl.when(idx == 0)
    def _init():
        def body(k, _):
            for t in range(_NI):
                sm_i[k, t] = s_i32[k, t]
            for t in range(_NF):
                sm_f[k, t] = s_f32[k, t]
            # prompt1 lives as a VMEM lane vector (lanes 2, 3 = re, im)
            # so the FLL never round-trips it through the scalar domain
            p1v[k, :] = (jnp.where(lane == 2, s_f32[k, _F_P1RE], 0.0)
                         + jnp.where(lane == 3, s_f32[k, _F_P1IM], 0.0)
                         )[0, :]
            if p.coh_blocks > 1:
                cv = jnp.zeros((1, 128), jnp.float32)
                for t in range(6):
                    cv = cv + jnp.where(lane == t,
                                        s_f32[k, _F_CACC + t], 0.0)
                caccv[k, :] = cv[0, :]
            return 0

        jax.lax.fori_loop(0, C, body, 0)
        start_fetch(0, 0)

    if NG >= 2:
        # prefetch the NEXT step's windows: group (g+1) % NG's state was
        # last written a whole block ago, so its ptrs are already final
        @pl.when(idx + 1 < B * NG)
        def _prefetch():
            nxt = g + 1
            start_fetch((idx + 1) % 2, jnp.where(nxt == NG, 0, nxt))

    wait_fetch(idx % 2)
    slot = idx % 2 if _PROBE != "slot0" else 0

    def process(k, cc):
        """One channel's whole block: geometry -> tiles -> loop filter ->
        row -> state.  k is the static lane within the group (buffer /
        code-row / acc index), cc the channel id (SMEM state index)."""
        # ---- geometry (scalar domain; _step_pallas semantics, sub == 1)
        cp_hi = sm_f[cc, _F_CP_HI]
        cp_lo = sm_f[cc, _F_CP_LO]
        code_f_off = sm_f[cc, _F_CFO]
        carrier_p = sm_f[cc, _F_CARR_P]
        carrier_f = sm_f[cc, _F_CARR_F]
        ratio = sm_f[cc, _F_RATIO]
        ptr = sm_i[cc, _I_PTR]
        block = sm_i[cc, _I_BLOCK]
        coffset_p = sm_i[cc, _I_COFF_P]
        coffset_df = sm_i[cc, _I_COFF_DF]
        stalled = sm_i[cc, _I_STALLED]
        chunk_len = sm_i[cc, _I_CHUNKLEN]

        L = sm_f[cc, _F_L]
        spp = sm_f[cc, _F_SPP]
        el = sm_f[cc, _F_EL]
        cf_hi_c = sm_f[cc, _F_CFH]
        cf_lo_c = sm_f[cc, _F_CFL]
        sub_i = sm_f[cc, _F_SUB].astype(jnp.int32)

        code_p = cp_hi + cp_lo
        n_f0 = jnp.where(
            code_p < L / 2,
            spp * (L - code_p) / L,
            spp * (2.0 * L - code_p) / L,
        )
        # sub-divided code period: n_full is frozen at the period start
        # and carved into sub reference-exact sub-windows
        # (engine._sub_block_len — overflow-safe split form; sub == 1
        # reduces to n = n_full exactly)
        sub_j = sm_i[cc, _I_SUBJ]
        n_full = jnp.where(sub_j == 0, n_f0.astype(jnp.int32),
                           sm_i[cc, _I_NFULL])
        q = n_full // sub_i
        r = n_full - q * sub_i
        n = q + ((sub_j + 1) * r) // sub_i - (sub_j * r) // sub_i
        sub_j_next = jnp.where(sub_j + 1 == sub_i, 0, sub_j + 1)
        ok = jnp.logical_and(stalled == 0, ptr + n <= chunk_len)

        cf_dyn = (code_f_off + carrier_f / ratio) / fs
        cf = cf_hi_c + cf_dyn

        def vf(lag):
            v = tf.tf_add_f((cp_hi, cp_lo), lag)
            vint = jnp.floor(v[0] + v[1])
            fr = tf.tf_value(tf.tf_add_f(v, -vint))
            return vint.astype(jnp.int32), fr

        vint_e, fr_e = vf(-el)
        vint_p, fr_p = vf(jnp.float32(0.0))
        vint_l, fr_l = vf(el)

        fdf = -carrier_f / fs
        carr_df = _fixed_bits(fdf - jnp.floor(fdf))
        carr_p0 = _fixed_bits(carrier_p - jnp.floor(carrier_p))

        ptr_k = jnp.clip(ptr, 0, nchunk - grid_tiles * tsz)
        off = ptr_k - (ptr_k // tsz) * tsz

        # ---- correlate: unrolled tiles over the prefetched window
        R = acc.shape[1]
        acc[k] = jnp.zeros((R, 128), jnp.float32)

        if p.pallas_stream:
            # multi-million-chip codes (L2CL, GLONASS P): the extended
            # row stays HBM-resident and each tile's window is DMA'd into
            # scratch.  Two refinements over the v2 scan kernel's
            # blocking read: (a) the copy is rounded up to 8 sublane
            # rows — a DMA whose sublane extent is not a multiple of 8
            # faults the TPU worker (measured round 4); (b) the window
            # address depends only on block-start scalars, so tile j+1's
            # copy is issued BEFORE tile j's compute (ping-pong buffers)
            # and the DMA latency leaves the critical path.
            M8 = cwin.shape[1]

            def k0_of(j):
                # identical arithmetic to tile_contrib's window base
                i0j = jnp.maximum(j * tsz - off, 0).astype(jnp.float32)
                basej = jnp.floor(fr_p + i0j * cf).astype(jnp.int32)
                return (vint_p + basej + 1 + LEAD) // 128 - 1

            def start_code(j):
                pltpu.make_async_copy(
                    code_ref.at[cc, pl.ds(k0_of(j), M8), :],
                    cwin.at[j % 2], csem.at[j % 2]).start()

            def wait_code(j):
                pltpu.make_async_copy(
                    code_ref.at[cc, pl.ds(0, M8), :],
                    cwin.at[j % 2], csem.at[j % 2]).wait()

            start_code(0)

            def make_read(j):
                def read_code_tiles(k0, m):
                    return cwin[j % 2, pl.ds(0, m), :]
                return read_code_tiles
        else:
            def read_code_tiles(k0, m):
                return code_ref[k, 0, pl.ds(k0, m), :]

        for j in range(grid_tiles if _PROBE != "notile" else 0):
            i0 = j * tsz - off
            if p.pallas_stream:
                # drain this tile's window copy, kick off the next —
                # unconditional (outside the i0 < n gate) so every
                # started DMA is matched by exactly one wait
                wait_code(j)
                if j + 1 < grid_tiles:
                    start_code(j + 1)
                read_j = make_read(j)
            else:
                read_j = read_code_tiles

            @pl.when(i0 < n)
            def _tile(j=j, i0=i0, read_j=read_j):
                xr_p = buf[slot, k, 0,
                           pl.ds(j * (tsz // 128), tsz // 128), :]
                xi_p = buf[slot, k, 1,
                           pl.ds(j * (tsz // 128), tsz // 128), :]
                if _PROBE == "tilemin":
                    acc[k, 0, :] = acc[k, 0, :] + xr_p[0, :] + xi_p[0, :]
                else:
                    prod = tile_contrib(
                        i0, n, coffset_df, coffset_p, carr_df, carr_p0,
                        vint_e, vint_p, vint_l, fr_e, fr_p, fr_l, cf,
                        xr_p, xi_p, W, read_j, tsz=tsz,
                        sub=p.subcarrier,
                        a0=sm_f[cc, _F_A0], a1=sm_f[cc, _F_A1],
                        a6=sm_f[cc, _F_A6], tm=sm_f[cc, _F_TM])
                    acc[k] = acc[k] + prod

        # ---- loop filter (_post_block semantics, coh_blocks == 1).
        # Discriminator math runs LANE-WISE on the E/P/L vector
        # (meaningful at lane 2 / lane 0; other lanes carry garbage that
        # is never read): only the three loop-filter errors cross into
        # the scalar domain.
        accv = (acc[k, 0:1, :] if _PROBE == "tilemin"
                else finalize_contrib(acc[k], p.subcarrier))
        coh = p.coh_blocks > 1
        if coh:
            # extended-coherent (_post_block coh semantics): the overlay
            # chip wipes this block's correlators, the loop filters see
            # the M-period accumulated sums, and updates gate on the
            # period-M boundary u.  M and the overlay period are RUNTIME
            # per-channel (sigp lanes) so mixed-constellation scans can
            # carry different coherent spans; M = 1 reduces exactly to
            # the non-coherent update.
            nov_c = sm_f[cc, _F_NOV].astype(jnp.int32)
            nov_e = jnp.where(nov_c > 0, nov_c, jnp.int32(nov))
            s_ovl = ovl_ref[cc, block % nov_e]
            wip = accv * s_ovl
            caccrow = caccv[pl.ds(cc, 1), :]
            acc6 = caccrow + wip
            M_c = jnp.maximum(sm_f[cc, _F_COH].astype(jnp.int32), 1)
            u = ((block + 1) % M_c) == 0
        else:
            wip = accv
            acc6 = accv
            u = None
        p1row = p1v[pl.ds(cc, 1), :]
        mode = jnp.where(block >= p.fll_wide_blocks, 1, 0)
        mode = jnp.where(block >= p.fll_wide_blocks + p.fll_narrow_blocks,
                         2, mode)

        if _PROBE == "nolf":
            z = jnp.float32(0.0)
            e_dll = e_fll = e_pll = z
            env = zv
            phase_v = zv
            rowp = zv
            p1_new = p1row
            cacc_new = acc6
        else:
            # row envelopes from the per-block (wiped) correlators: lane
            # j of env holds sqrt(w[j]^2 + w[j+1]^2)
            sq = wip * wip
            env = jnp.sqrt(sq + pltpu.roll(sq, shift=127, axis=1))
            if coh:
                sqf = acc6 * acc6
                env_f = jnp.sqrt(sqf + pltpu.roll(sqf, shift=127, axis=1))
            else:
                env_f = env
            # e_dll = (|L| - |E|) / (|L| + |E|) at lane 0 (|L| rolled
            # 4->0), from the coherent sums
            env_l0 = pltpu.roll(env_f, shift=124, axis=1)
            den = env_l0 + env_f
            dll_v = jnp.where(den == 0.0, 0.0,
                              (env_l0 - env_f)
                              / jnp.where(den == 0.0, 1.0, den))
            e_dll = jnp.sum(dll_v * (lane == 0).astype(jnp.float32))

            # discriminators, valid at lane 2 (im arrives via a lane roll)
            def ref_atan_l2(v):
                im = pltpu.roll(v, shift=127, axis=1)
                safe = jnp.where(v == 0.0, 1.0, v)
                t = kmath.atan(im / safe)
                return jnp.where(v == 0.0, _PI / 2, t)

            d = ref_atan_l2(acc6) - ref_atan_l2(p1row)
            d = jnp.where(d > _PI / 2, _PI - d, d)
            d = jnp.where(d < -_PI / 2, -_PI - d, d)
            e_fll = jnp.sum(d * m2)

            im_l2f = pltpu.roll(acc6, shift=127, axis=1)
            flip = jnp.where(acc6 > 0.0, 1.0, -1.0)
            pll_v = kmath.atan2(flip * im_l2f, flip * acc6)
            e_pll = jnp.sum(pll_v * m2)

            im_l2 = pltpu.roll(wip, shift=127, axis=1)
            phase_v = (kmath.atan2(im_l2, wip)
                       * jnp.float32(180.0 / np.pi))
            # rows lanes 1, 2 = p_re, p_im (one roll of the masked pair)
            rowp = pltpu.roll(wip * m23, shift=127, axis=1)
            mode_is_pll = (zv + mode.astype(jnp.float32)) == 2.0
            p1_new = jnp.where(mode_is_pll, p1row, acc6 * m23)
            cacc_new = acc6

        # carrier loop (track-gps-l1.py:50-70)
        carrier_e1 = sm_f[cc, _F_CE1]
        fll_k = jnp.where(mode == 0, jnp.float32(p.fll_wide_k),
                          jnp.float32(p.fll_narrow_k))
        carrier_f_new = jnp.where(
            mode == 2,
            carrier_f + jnp.float32(p.pll_k1) * e_pll
            + jnp.float32(p.pll_k2) * (e_pll - carrier_e1),
            carrier_f + fll_k * e_fll,
        )
        carrier_e1_new = jnp.where(mode == 2, e_pll, carrier_e1)

        # code loop (:74-86)
        code_e1 = sm_f[cc, _F_DE1]
        code_f_off_new = (code_f_off + jnp.float32(p.dll_k1) * e_dll
                          + jnp.float32(p.dll_k2) * (e_dll - code_e1))

        if coh:
            # loop filters advance only at the M-period boundary; the
            # accumulator resets there (engine._post_block coh gating)
            carrier_f_new = jnp.where(u, carrier_f_new, carrier_f)
            carrier_e1_new = jnp.where(u, carrier_e1_new, carrier_e1)
            code_f_off_new = jnp.where(u, code_f_off_new, code_f_off)
            e_dll = jnp.where(u, e_dll, code_e1)
            uv = (zv + u.astype(jnp.float32)) > 0.0
            p1_new = jnp.where(uv, p1_new, p1row)
            cacc_new = jnp.where(uv, 0.0, cacc_new)

        # carrier phase bookkeeping (:38-42)
        n_f = n.astype(jnp.float32)
        carrier_p_up = carrier_p - n_f * carrier_f / fs
        t = carrier_p_up - jnp.floor(carrier_p_up)
        carrier_dcyc = jnp.round(carrier_p_up - t).astype(jnp.int32)
        coffset_p_new = coffset_p + n * coffset_df    # uint32 wrap in int32

        # code phase advance in two-float (:88-92)
        adv = tf.tf_mul_f((cf_hi_c, cf_lo_c), n_f)
        adv = tf.tf_add_f(adv, n_f * cf_dyn)
        cp_new = tf.tf_add((cp_hi, cp_lo), adv)
        (cp_hi_new, cp_lo_new), wraps = tf.tf_mod(cp_new, L)
        tc = cp_hi_new + cp_lo_new
        code_dcyc = (wraps * L).astype(jnp.int32)

        # ---- row (lanes 0..10 = ROW_FIELDS floats, 11..13 = int row)
        def at(j, v):
            return jnp.where(lane == j, zv + v, 0.0)

        row = (at(0, block.astype(jnp.float32)) + rowp
               + at(3, carrier_f_new) + at(4, code_f_off_new)
               + pltpu.roll(phase_v * m2, shift=3, axis=1)
               + pltpu.roll(env * (lane == 0).astype(jnp.float32), shift=6,
                            axis=1)
               + pltpu.roll(env * (lane == 2).astype(jnp.float32), shift=5,
                            axis=1)
               + pltpu.roll(env * (lane == 4).astype(jnp.float32), shift=4,
                            axis=1)
               + at(9, tc) + at(10, t)
               + at(11, n.astype(jnp.float32))
               + at(12, carrier_dcyc.astype(jnp.float32))
               + at(13, code_dcyc.astype(jnp.float32)))
        okv = (zv + ok.astype(jnp.float32)) > 0.0
        nanrow = jnp.where(lane < 11, _NAN, 0.0)
        if _PROBE == "norow":
            rows_ref[0, k, 0, :] = accv[0, :] + n.astype(jnp.float32)
        else:
            rows_ref[0, k, 0, :] = jnp.where(okv, row, nanrow)[0, :]

        # ---- state write-back (frozen when !ok; stalled latches !ok)
        def sel_f(new, old):
            return jnp.where(ok, new, old)

        sm_f[cc, _F_CP_HI] = sel_f(cp_hi_new, cp_hi)
        sm_f[cc, _F_CP_LO] = sel_f(cp_lo_new, cp_lo)
        sm_f[cc, _F_CFO] = sel_f(code_f_off_new, code_f_off)
        sm_f[cc, _F_CARR_P] = sel_f(t, carrier_p)
        sm_f[cc, _F_CARR_F] = sel_f(carrier_f_new, carrier_f)
        p1v[cc, :] = jnp.where(okv, p1_new, p1row)[0, :]
        if coh:
            caccv[cc, :] = jnp.where(okv, cacc_new, caccrow)[0, :]
        sm_f[cc, _F_CE1] = sel_f(carrier_e1_new, carrier_e1)
        sm_f[cc, _F_DE1] = sel_f(e_dll, code_e1)
        sm_i[cc, _I_PTR] = jnp.where(ok, ptr + n, ptr)
        sm_i[cc, _I_BLOCK] = jnp.where(ok, block + 1, block)
        sm_i[cc, _I_COFF_P] = jnp.where(ok, coffset_p_new, coffset_p)
        sm_i[cc, _I_STALLED] = jnp.logical_not(ok).astype(jnp.int32)
        sm_i[cc, _I_NFULL] = jnp.where(ok, n_full, sm_i[cc, _I_NFULL])
        sm_i[cc, _I_SUBJ] = jnp.where(ok, sub_j_next, sub_j)

    for k in range(KCH):
        process(k, g * KCH + k)

    if NG == 1:
        # one channel group: the next step's windows depend on THIS
        # step's ptr updates, so the fetch can only be issued now
        @pl.when(idx + 1 < B * NG)
        def _fetch_next():
            start_fetch((idx + 1) % 2, 0)

    @pl.when(b == B - 1)
    def _emit_state():
        for k in range(KCH):
            cc = g * KCH + k
            # prompt1 returns to the scalar domain only here (once/run)
            sm_f[cc, _F_P1RE] = jnp.sum(p1v[pl.ds(cc, 1), :] * m2)
            sm_f[cc, _F_P1IM] = jnp.sum(p1v[pl.ds(cc, 1), :]
                                        * (lane == 3).astype(jnp.float32))
            if p.coh_blocks > 1:
                for tt in range(6):
                    sm_f[cc, _F_CACC + tt] = jnp.sum(
                        caccv[pl.ds(cc, 1), :]
                        * (lane == tt).astype(jnp.float32))
            for tt in range(_NI):
                sti_out[cc, tt] = sm_i[cc, tt]
            for tt in range(_NF):
                stf_out[cc, tt] = sm_f[cc, tt]


def track_scan_fused(x2, chunk_len, state, params, n_blocks: int,
                     ratios, code_rows_ext, coffset_df, sigp=None,
                     overlay=None, interpret: bool = False):
    """Drop-in core for track_scan on the BPSK fast path: returns
    (state', rows_f [B, C, 11], rows_i [B, C, 3]) with track_scan
    semantics.  Must be called inside a jit (track_scan dispatches here).
    overlay [C, nov]: pre-rolled secondary chips for extended-coherent
    mode (params.coh_blocks > 1); None -> all-ones (plain coherent /
    non-coherent)."""
    from gnss_dsp_tpu.ops.pallas_track import env_interpret

    interpret = interpret or env_interpret()
    C = state.ptr.shape[0]
    B = int(n_blocks)
    tsz = FUSED_TILE
    assert tsz == TILE  # params.pallas_w is sized for TILE-sample windows
    n_tiles = -(-int(params.nmax) // tsz)
    W = int(params.pallas_w)
    if sigp is None:
        from gnss_dsp_tpu.track.engine import sigp_from_params

        sigp = sigp_from_params(params, C)
    nchunk = x2[0].shape[-1]
    assert nchunk % 128 == 0, nchunk
    grid_tiles = n_tiles + 1
    WIN8 = grid_tiles * (tsz // 128)
    assert nchunk >= grid_tiles * tsz, (nchunk, grid_tiles * tsz)
    KCH = 4 if C % 4 == 0 else (2 if C % 2 == 0 else 1)

    s_i32 = jnp.stack([
        state.ptr.astype(jnp.int32),
        state.block.astype(jnp.int32),
        state.coffset_p.astype(jnp.int32),
        coffset_df.astype(jnp.int32),
        state.stalled.astype(jnp.int32),
        jnp.broadcast_to(jnp.asarray(chunk_len, jnp.int32), (C,)),
        state.n_full.astype(jnp.int32),
        state.sub_j.astype(jnp.int32),
    ], axis=1)
    s_f32 = jnp.concatenate([jnp.stack([
        state.code_p_hi, state.code_p_lo, state.code_f_off,
        state.carrier_p, state.carrier_f,
        state.prompt1_re, state.prompt1_im,
        state.carrier_e1, state.code_e1, ratios.astype(jnp.float32),
    ], axis=1), sigp.astype(jnp.float32),
        state.cacc.astype(jnp.float32)], axis=1)
    if overlay is None:
        overlay = jnp.ones((C, 1), jnp.float32)
    nov = overlay.shape[1]

    xr8 = x2[0].reshape(nchunk // 128, 128)
    xi8 = x2[1].reshape(nchunk // 128, 128)

    from gnss_dsp_tpu.ops.pallas_track2 import plan_rows

    A = (W + 128) // 128
    R = plan_rows(params.subcarrier) * _next_pow2(A)
    scratch = [
        pltpu.SMEM((C, _NI), jnp.int32),
        pltpu.SMEM((C, _NF), jnp.float32),
        pltpu.VMEM((2, KCH, 2, WIN8, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((2, KCH, 2)),
        pltpu.VMEM((KCH, R, 128), jnp.float32),
        pltpu.VMEM((C, 128), jnp.float32),
        pltpu.VMEM((C, 128), jnp.float32),   # caccv (coherent accum)
    ]
    if params.pallas_stream:
        # extended rows stay in HBM ([C, K, 128] tiled layout); each tile
        # DMAs its (A+2)-row window into scratch
        code_spec = pl.BlockSpec(memory_space=pl.ANY)
        code_arg = code_rows_ext.reshape(C, -1, 128)
        scratch += [pltpu.VMEM((2, -(-(A + 2) // 8) * 8, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))]
    else:
        code_spec = pl.BlockSpec(
            (KCH, 1, code_rows_ext.shape[1] // 128, 128),
            lambda b, g, *_: (g, 0, 0, 0),
            memory_space=pltpu.VMEM)
        code_arg = code_rows_ext.reshape(C, 1, -1, 128)

    rows, sti, stf = pl.pallas_call(
        functools.partial(_kernel, B=B, C=C, KCH=KCH, n_tiles=n_tiles,
                          W=W, tsz=tsz, nchunk=nchunk, nov=nov, p=params),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, C // KCH),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # xr (HBM)
                pl.BlockSpec(memory_space=pl.ANY),   # xi (HBM)
                code_spec,
            ],
            out_specs=[
                pl.BlockSpec((1, KCH, 1, 128),
                             lambda b, g, *_: (b, g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, C, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((C, _NI), jnp.int32),
            jax.ShapeDtypeStruct((C, _NF), jnp.float32),
        ],
        interpret=interpret,
    )(s_i32, s_f32, overlay.astype(jnp.float32), xr8, xi8, code_arg)

    state_new = state._replace(
        cacc=stf[:, _F_CACC:_F_CACC + 6],
        ptr=sti[:, _I_PTR],
        block=sti[:, _I_BLOCK],
        coffset_p=sti[:, _I_COFF_P].astype(jnp.uint32),
        stalled=sti[:, _I_STALLED] != 0,
        n_full=sti[:, _I_NFULL],
        sub_j=sti[:, _I_SUBJ],
        code_p_hi=stf[:, _F_CP_HI],
        code_p_lo=stf[:, _F_CP_LO],
        code_f_off=stf[:, _F_CFO],
        carrier_p=stf[:, _F_CARR_P],
        carrier_f=stf[:, _F_CARR_F],
        prompt1_re=stf[:, _F_P1RE],
        prompt1_im=stf[:, _F_P1IM],
        carrier_e1=stf[:, _F_CE1],
        code_e1=stf[:, _F_DE1],
    )
    rows_f = rows[:, :, 0, :11]
    rows_i = rows[:, :, 0, 11:14].astype(jnp.int32)
    return state_new, rows_f, rows_i
