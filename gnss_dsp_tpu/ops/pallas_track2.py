"""Fused wipeoff + E/P/L correlator, v2: factorized one-hot routing.

Same contract as ops/pallas_track.epl_correlate (the tracking hot loop of
the reference, gps/ca.py:120-128 + nco.py:30-38), BPSK-only (sub="none")
fast path.  The v1 kernel's cost profile on-chip is ~1.1-1.5 us per
(channel, 1024-sample tile), dominated by

  * the [TILE, W2] prompt one-hot build (W2 = 512 lanes for GPS L1:
    ~1500 VPU vreg-ops per tile), and
  * a [16, TILE] @ [TILE, W2] matmul whose M=16 wastes 7/8 of the MXU.

v2 restructures both:

  * THREE row groups instead of seven.  For el_spacing < 1 chip (every
    signal: 0.05/0.2/0.5), the early chip index is the prompt index
    shifted by d in {-1, 0} and late by {0, +1} per sample, so

       E = sum(m * cw[col_p])  +  sum(m * 1{d_e=-1} * (cw(-1) - cw)[col_p])
       L = sum(m * cw[col_p])  +  sum(m * 1{d_l=+1} * (cw(+1) - cw)[col_p])

    i.e. E/P/L all ride ONE shared prompt-indexed segment sum plus two
    boundary-correction groups: 6 live operand rows, not 14.

  * FACTORIZED one-hot.  The prompt chip offset col in [0, W2) splits as
    col = 128*a' + b'.  The b' one-hot is only [TILE, 128] (4x smaller
    build than [TILE, 512]), and the a' routing is folded into the
    matmul's M operand: row r = 8*a' + g carries group-g samples masked
    to a' == r>>3.  The operand is built by CONCATENATING the [8, TILE]
    group-plane block A' times (vreg copies, no relayout) and applying
    one compare — the expensive per-sample pipeline (DDS phases, LUT
    trig, masks, boundary flags) runs once on [8, TILE].

  * The code window cw[W2] (and its +-1-chip rolls) reshape to [A, 128]
    2-D tiles, so the final contraction is a [R, 128] elementwise
    multiply + six masked reductions.

Boundary decisions (floor of the f32 fractional recurrence fr + i*cf)
are computed with arithmetic identical to v1/the XLA engine, so peak
positions and correlator sums agree to summation-order rounding
(tests/test_pallas.py oracle).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnss_dsp_tpu.ops.pallas_track import TILE, LEAD, chip_window, extend_code  # noqa: F401

_LUT_SHIFT = np.uint32(22)
_TWO_PI_OVER_NT = np.float32(2.0 * np.pi / 1024.0)

# stage-ablation probe for perf diagnosis (see tools/bench_track_fused)
import os as _os  # noqa: E402
_TPROBE = set(_os.environ.get("GNSS_DSP_TILE_PROBE", "").split(","))


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def plan_rows(sub: str) -> int:
    """Rows per a'-block in the factorized operand.  BPSK shares ONE main
    segment across E/P/L (6 live rows: p/eb/lb x re/im), G = 8.  A
    subcarrier multiplies each lag's samples by a DIFFERENT per-sample
    factor (the lag's own code phase drives the square-wave sign,
    e1b.py:48-56), so the main segment cannot be shared: each lag gets
    its own main rows plus the E/L boundary-correction rows (10 live),
    G = 16."""
    return 8 if sub == "none" else 16


def _factor(sub, a0, a1, a6, cp, rel, vint, tm=0.0):
    """Per-sample subcarrier weight.  sub == "subc" is the runtime-
    coefficient form a0 + a1*boc1 + a6*boc6 (engine.SUBC_COEF — lets
    every affine family share one compiled program); sub == "tmboc" is
    the runtime superset a0 + a1*boc1 + a6*boc6 + tm*(slot*boc6 +
    (1-slot)*boc1) — tm = 1 with zero coefficients is exactly the TMBOC
    slot blend (gps/l1cp.py:210-228), tm = 0 reduces to the affine form,
    so TMBOC channels mix with any other family in one program (round
    5).  Legacy strings take the static branches (v1 ablation path)."""
    if sub in ("subc", "tmboc"):
        bp = jnp.floor(2.0 * cp).astype(jnp.int32) % 2
        boc = (1 - 2 * bp).astype(jnp.float32)
        bp6 = jnp.floor(12.0 * cp).astype(jnp.int32) % 2
        boc6 = (1 - 2 * bp6).astype(jnp.float32)
        affine = a0 + a1 * boc + a6 * boc6
        if sub == "subc":
            return affine
        u = (vint + rel) % 33
        slot = ((u == 0) | (u == 4) | (u == 6)
                | (u == 29)).astype(jnp.float32)
        return affine + tm * (slot * boc6 + (1.0 - slot) * boc)
    from gnss_dsp_tpu.ops.pallas_track import _subcarrier_factor

    return _subcarrier_factor(sub, cp, rel, vint)


def tile_contrib(i0, nvalid, dph_a, ph0_a, dph_b, ph0_b,
                 vint_e, vint_p, vint_l, fr_e, fr_p, fr_l, cf,
                 xr_p, xi_p, W, read_code_tiles, tsz: int = TILE,
                 sub: str = "none", a0=0.0, a1=0.0, a6=0.0, tm=0.0):
    """One TILE's factorized E/P/L contribution (the v2 math), as a pure
    function so the per-block fused tracking kernel (pallas_track_fused)
    can share it.  Scalars are traced kernel values; xr_p/xi_p are the
    tile's samples in the packed (8, 128) layout; read_code_tiles(k0, m)
    returns m consecutive 128-chip rows of the PRE-TILED extended code
    (extend_code reshaped [..., 128]) starting at row k0 — row-aligned
    sublane reads, so the window needs no lane-slice/reshape relayouts.
    Returns the [R, 128] prod tile (see finalize_contrib).  tsz is the
    tile's sample count (the fused kernel runs bigger tiles than the
    BlockSpec-fed v2 kernel's TILE).  sub selects the subcarrier family
    (none|boc11|cboc|tmboc|rz_even|rz_odd): non-BPSK runs the 16-row
    per-lag plan (see plan_rows)."""
    W2 = W + 128
    A = W2 // 128
    Ap = _next_pow2(A)
    G = plan_rows(sub)
    R = G * Ap

    # ---- per-sample pipeline on the PACKED (8, 128) layout: 1024
    # samples = ONE vreg per quantity, so the DDS phase ints and the
    # two transcendentals cost 1/8th of the [8, TILE] form (the tile
    # ablation showed cos+sin alone at ~0.25 us/gridstep there).
    # Sample s = 128*u + v; reshape back to (1, TILE) is row-major.
    su = tsz // 128
    up = jax.lax.broadcasted_iota(jnp.int32, (su, 128), 0)
    vp = jax.lax.broadcasted_iota(jnp.int32, (su, 128), 1)
    i_rel_p = i0 + up * 128 + vp

    ph_a = (ph0_a + i_rel_p * dph_a).astype(jnp.uint32)
    ph_b = (ph0_b + i_rel_p * dph_b).astype(jnp.uint32)
    idx = (jax.lax.shift_right_logical(ph_a, _LUT_SHIFT).astype(jnp.int32)
           + jax.lax.shift_right_logical(ph_b, _LUT_SHIFT).astype(jnp.int32)
           ) & 1023
    ang = idx.astype(jnp.float32) * _TWO_PI_OVER_NT
    if "notrig" in _TPROBE:
        wc_p = ang
        ws_p = -ang
    else:
        wc_p = jnp.cos(ang)
        ws_p = jnp.sin(ang)
    mask_p = ((i_rel_p >= 0).astype(jnp.float32)
              * (i_rel_p < nvalid).astype(jnp.float32))

    i_f_p = i_rel_p.astype(jnp.float32)
    rel_p_pk = jnp.floor(fr_p + i_f_p * cf).astype(jnp.int32)
    rel_e_pk = jnp.floor(fr_e + i_f_p * cf).astype(jnp.int32)
    rel_l_pk = jnp.floor(fr_l + i_f_p * cf).astype(jnp.int32)
    d_e = (vint_e + rel_e_pk) - (vint_p + rel_p_pk)   # in {-1, 0}
    d_l = (vint_l + rel_l_pk) - (vint_p + rel_p_pk)   # in {0, +1}

    m_re_p = (xr_p * wc_p - xi_p * ws_p) * mask_p     # wiped sample, re
    m_im_p = (xr_p * ws_p + xi_p * wc_p) * mask_p     # ... im
    e1_p = (d_e < 0).astype(jnp.float32)
    l1_p = (d_l > 0).astype(jnp.float32)

    # back to lane-major (1, tsz) rows (cheap: su vregs each)
    m_re = m_re_p.reshape(1, tsz)
    m_im = m_im_p.reshape(1, tsz)
    e1 = e1_p.reshape(1, tsz)
    l1 = l1_p.reshape(1, tsz)

    if sub == "none":
        # ---- the 8 group planes p_re, p_im, e_re, e_im, l_re, l_im, 0, 0
        g8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        par = (g8 & 1).astype(jnp.float32)      # 0 = re row, 1 = im row
        q1 = jnp.logical_and(g8 >= 2, g8 < 4).astype(jnp.float32)   # early
        q2 = jnp.logical_and(g8 >= 4, g8 < 6).astype(jnp.float32)   # late
        q0 = (g8 < 2).astype(jnp.float32)                           # prompt
        factor = q0 + q1 * e1 + q2 * l1
        planes = ((m_re * (1.0 - par) + m_im * par) * factor
                  ).astype(jnp.bfloat16)
    else:
        # per-lag subcarrier factors on the packed (su, 128) layout (the
        # square-wave phase rides the lag's own fractional code phase;
        # TMBOC's slot needs the absolute chip index vint + rel,
        # gps/l1cp.py:210-228)
        f_p = _factor(sub, a0, a1, a6, fr_p + i_f_p * cf, rel_p_pk,
                      vint_p, tm).reshape(1, tsz)
        f_e = _factor(sub, a0, a1, a6, fr_e + i_f_p * cf, rel_e_pk,
                      vint_e, tm).reshape(1, tsz)
        f_l = _factor(sub, a0, a1, a6, fr_l + i_f_p * cf, rel_l_pk,
                      vint_l, tm).reshape(1, tsz)
        # ---- 16 group planes: (p, e-main, e-bnd, l-main, l-bnd) x re/im
        # in rows 0..9; rows 10..15 are pad.  Each lag's samples carry its
        # own subcarrier factor, boundary rows additionally the d-flag.
        g16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
        gg = g16 >> 1                           # group id 0..7
        par = (g16 & 1).astype(jnp.float32)     # 0 = re row, 1 = im row
        is_p = (gg == 0).astype(jnp.float32)
        is_em = (gg == 1).astype(jnp.float32)
        is_eb = (gg == 2).astype(jnp.float32)
        is_lm = (gg == 3).astype(jnp.float32)
        is_lb = (gg == 4).astype(jnp.float32)
        factor = (is_p * f_p + (is_em + is_eb * e1) * f_e
                  + (is_lm + is_lb * l1) * f_l)
        planes = ((m_re * (1.0 - par) + m_im * par) * factor
                  ).astype(jnp.bfloat16)

    # ---- prompt window base / alignment (identical arithmetic to v1)
    i_start = jnp.maximum(i0, 0).astype(jnp.float32)
    base = jnp.floor(fr_p + i_start * cf).astype(jnp.int32)
    start = vint_p + base + 1 + LEAD
    sa = (start // 128) * 128
    delta = start - sa

    ap = ((rel_p_pk - base + delta) >> 7).reshape(1, tsz)  # a' in [0, A)

    # ---- operand: concat the G-row block A' times; row r = G*a' + g
    M = jnp.concatenate([planes] * Ap, axis=0)            # [R, TILE]
    if "nom" not in _TPROBE:
        a_r = (jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
               >> (3 if G == 8 else 4))
        M = M * (ap == a_r).astype(jnp.bfloat16)

    # ---- b' one-hot [TILE, 128] (4x smaller than v1's [TILE, W2])
    if "nooh" in _TPROBE:
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (tsz, 128), 1)
        oh = (w_iota == 0).astype(jnp.bfloat16)
    else:
        it = jax.lax.broadcasted_iota(jnp.int32, (tsz, 1), 0).reshape(tsz)
        i_f1 = (i0 + it).astype(jnp.float32)
        rel_p1 = jnp.floor(fr_p + i_f1 * cf).astype(jnp.int32)
        col1 = rel_p1 - base + delta
        b1 = col1 & 127
        # the (tsz, 128) compare is the dominant VPU build; 16-bit and
        # bf16 compares both fail to lower on this target ("Target does
        # not support this comparison"), so int32 it stays
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (tsz, 128), 1)
        oh = (w_iota == b1[:, None]).astype(jnp.bfloat16)

    seg = jnp.dot(M, oh, preferred_element_type=jnp.float32)  # [R, 128]
    if "segones" in _TPROBE:
        seg = jnp.ones((R, 128), jnp.float32)

    # ---- code windows from the PRE-TILED row layout: one row-aligned
    # sublane read of A+2 rows, +-1-chip shifts via per-row rolls with a
    # boundary-lane select — no lane-slices, no (1, W2) -> (A, 128)
    # relayouts (measured ~0.3 us/tile in the fused kernel)
    k0 = start // 128                              # == sa // 128
    E = read_code_tiles(k0 - 1, A + 2)             # rows sa/128-1 .. +A
    cw2d = E[1:A + 1]
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (A, 128), 1)
    R1 = pltpu.roll(E, shift=1, axis=1)            # row-local right shift
    cwm = jnp.where(lane128 == 0, R1[0:A], R1[1:A + 1])
    L1 = pltpu.roll(E, shift=127, axis=1)          # row-local left shift
    cwp = jnp.where(lane128 == 127, L1[2:A + 2], L1[1:A + 1])
    ce2d = cwm - cw2d
    cl2d = cwp - cw2d
    if Ap != A:
        z = jnp.zeros((Ap - A, 128), jnp.float32)
        cw2d = jnp.concatenate([cw2d, z], axis=0)
        ce2d = jnp.concatenate([ce2d, z], axis=0)
        cl2d = jnp.concatenate([cl2d, z], axis=0)
    zA = jnp.zeros((Ap, 128), jnp.float32)
    if G == 8:
        csel = jnp.stack([cw2d, cw2d, ce2d, ce2d, cl2d, cl2d, zA, zA],
                         axis=1).reshape(R, 128)
    else:
        # (p, e-main, e-bnd, l-main, l-bnd) x re/im, then 6 pad rows
        csel = jnp.stack([cw2d, cw2d, cw2d, cw2d, ce2d, ce2d,
                          cw2d, cw2d, cl2d, cl2d,
                          zA, zA, zA, zA, zA, zA],
                         axis=1).reshape(R, 128)

    return seg * csel                              # [R, 128] "prod"


def finalize_contrib(prod_acc, sub: str = "none"):
    """[R, 128] accumulated prod tiles -> (1, 128) E/P/L lanes 0..5.

    Group-reduce WITHOUT scalar reductions (each jnp.sum-to-scalar is a
    serial vector->sreg drain; six per tile dominated the fused kernel's
    tile latency).  Deferred to ONCE PER BLOCK (prod is linear in the
    tiles, so the per-tile accumulation is a cheap [R, 128] add and the
    two MXU round-trips here are paid once, not per tile): U = one-hot
    (group) @ prod sums rows per group, V = U @ ones sums lanes (row-sum
    replicated across lanes), then static row slices + lane masks
    assemble E/P/L = prompt + boundary corrections."""
    R = prod_acc.shape[0]
    G = plan_rows(sub)
    gRm = jax.lax.broadcasted_iota(jnp.int32, (G, R), 1) & (G - 1)
    gGi = jax.lax.broadcasted_iota(jnp.int32, (G, R), 0)
    GH = (gRm == gGi).astype(jnp.float32)          # [G, R] group one-hot
    U = jnp.dot(GH, prod_acc, preferred_element_type=jnp.float32)  # [G,128]
    V = jnp.dot(U, jnp.ones((128, 128), jnp.float32),
                preferred_element_type=jnp.float32)            # [G, 128]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    if G == 8:
        m_pe = ((lane == 0) | (lane == 2) | (lane == 4)).astype(jnp.float32)
        m_po = ((lane == 1) | (lane == 3) | (lane == 5)).astype(jnp.float32)
        return (V[0:1, :] * m_pe + V[1:2, :] * m_po
                + V[2:3, :] * (lane == 0).astype(jnp.float32)
                + V[3:4, :] * (lane == 1).astype(jnp.float32)
                + V[4:5, :] * (lane == 4).astype(jnp.float32)
                + V[5:6, :] * (lane == 5).astype(jnp.float32))
    # 16-row plan: rows (p, em, eb, lm, lb) x re/im; E = em + eb, L = lm + lb
    def at(j):
        return (lane == j).astype(jnp.float32)

    return ((V[2:3, :] + V[4:5, :]) * at(0)        # E_re
            + (V[3:4, :] + V[5:6, :]) * at(1)      # E_im
            + V[0:1, :] * at(2) + V[1:2, :] * at(3)   # P
            + (V[6:7, :] + V[8:9, :]) * at(4)      # L_re
            + (V[7:8, :] + V[9:10, :]) * at(5))    # L_im


def _kernel(si_ref, sf_ref, xr_ref, xi_ref, code_ref, out_ref, acc,
            win_ref=None, dma_sem=None, *, grid_tiles, W, stream,
            sub="none"):
    c = pl.program_id(0)
    j = pl.program_id(1)
    R = acc.shape[0]

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros((R, 128), jnp.float32)

    vint_e = si_ref[c, 0]
    vint_p = si_ref[c, 1]
    vint_l = si_ref[c, 2]
    dph_a = si_ref[c, 3]
    nvalid = si_ref[c, 4]
    ph0_a = si_ref[c, 5]
    dph_b = si_ref[c, 6]
    ph0_b = si_ref[c, 7]
    ptr = si_ref[c, 8]
    fr_e = sf_ref[c, 0]
    fr_p = sf_ref[c, 1]
    fr_l = sf_ref[c, 2]
    cf = sf_ref[c, 3]
    if sub in ("subc", "tmboc"):
        a0 = sf_ref[c, 4]
        a1 = sf_ref[c, 5]
        a6 = sf_ref[c, 6]
        tm = sf_ref[c, 7] if sub == "tmboc" else 0.0
    else:
        a0 = a1 = a6 = tm = 0.0

    W2 = W + 128

    off = ptr - (ptr // TILE) * TILE
    i0 = j * TILE - off

    @pl.when(i0 < nvalid)
    def _tile():
        def read_code_tiles(k0, m):
            if stream:
                # DMA size rounded up to 8 sublane rows: a copy whose
                # sublane extent is not a multiple of 8 FAULTS the TPU
                # worker (measured round 4; offset alignment is free) —
                # extend_code carries margin for the over-read
                m8 = -(-m // 8) * 8
                dma = pltpu.make_async_copy(
                    code_ref.at[c, pl.ds(k0, m8), :], win_ref, dma_sem)
                dma.start()
                dma.wait()
                return win_ref[pl.ds(0, m), :]
            return code_ref[0, 0, pl.ds(k0, m), :]

        prod = tile_contrib(
            i0, nvalid, dph_a, ph0_a, dph_b, ph0_b,
            vint_e, vint_p, vint_l, fr_e, fr_p, fr_l, cf,
            xr_ref[0:1, :].reshape(8, 128), xi_ref[0:1, :].reshape(8, 128),
            W, read_code_tiles, sub=sub, a0=a0, a1=a1, a6=a6, tm=tm)
        acc[...] = acc[...] + prod

    @pl.when(j == grid_tiles - 1)
    def _():
        out_ref[0, 0, :] = finalize_contrib(acc[...], sub)[0, :]


@functools.partial(
    jax.jit, static_argnames=("n_tiles", "W", "sub", "stream", "interpret"),
)
def epl_correlate2(si, sf, xr, xi, code_rows,
                   n_tiles: int, W: int, sub: str = "none",
                   stream: bool = False, interpret: bool = False):
    """Drop-in for pallas_track.epl_correlate.  Same operands (si [C,9]
    i32, sf [C,4] f32, shared [1, NCHUNK] chunk planes, extend_code
    rows); returns [C, 128] with lanes 0..5 =
    E_re, E_im, P_re, P_im, L_re, L_im.  Subcarrier families run the
    16-row per-lag plan (plan_rows)."""
    from gnss_dsp_tpu.ops.pallas_track import env_interpret

    interpret = interpret or env_interpret()
    C = si.shape[0]
    grid_tiles = n_tiles + 1
    grid = (C, grid_tiles)
    W2 = W + 128
    A = W2 // 128
    K = code_rows.shape[1] // 128
    code_tiled = code_rows.reshape(C, K, 128)
    R = plan_rows(sub) * _next_pow2(A)
    chunk_spec = pl.BlockSpec((1, TILE),
                              lambda c, j, si, sf: (0, si[c, 8] // TILE + j),
                              memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((R, 128), jnp.float32)]
    if stream:
        code_spec = pl.BlockSpec(memory_space=pl.ANY)
        code_arg = code_tiled
        scratch += [pltpu.VMEM((-(-(A + 2) // 8) * 8, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA]
    else:
        code_spec = pl.BlockSpec((1, 1, K, 128),
                                 lambda c, j, si, sf: (c, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        code_arg = code_tiled[:, None]
    return pl.pallas_call(
        functools.partial(_kernel, grid_tiles=grid_tiles, W=W, stream=stream,
                          sub=sub),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[chunk_spec, chunk_spec, code_spec],
            out_specs=pl.BlockSpec((1, 1, 128),
                                   lambda c, j, si, sf: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((C, 1, 128), jnp.float32),
        interpret=interpret,
    )(si, sf, xr, xi, code_arg)[:, 0, :]

epl_correlate = epl_correlate2  # bench A/B alias (tools/bench_kernel_scan.py)
