"""Fused wipeoff + early/prompt/late correlator as a Pallas TPU kernel.

The tracking hot loop (reference: per-sample Numba `correlate`,
gps/ca.py:120-128, plus `nco.mix_`) needs, per channel per sub-block,
carrier mixing and three code-phase-indexed multiply-accumulates.  The
straight XLA formulation gathers ~5n table elements per channel-block,
and TPU gathers cost ~10+ cycles/element — they dominate the tracking
engine.

This kernel is gather-free.  Over a TILE-sample stretch the code phase
advances at most TILE*cf chips, so each tile touches one contiguous
<= W-chip window of the code; the chip lookup becomes an on-the-fly
one-hot MXU matmul:

  rel[t]   = floor(fr + i*cf) - base            (0 <= rel < W)
  onehot   = (w == rel[t])                      [TILE, W]
  seg      = [m_re; m_im] @ onehot              [2, W]   <- MXU
  corr    += seg . code[vint + base : +W]                <- VPU

with m the carrier-wiped, subcarrier-weighted, tail-masked samples.  The
carrier NCO is evaluated in-kernel on the same quantized 1024-entry grid
as the engine (ops/nco.py): uint32 DDS phase, top 10 bits -> cos/sin.
The code row is pre-extended host-side (extend_code) so window slices
never wrap.

Outputs per channel: E/P/L split-complex sums, equal (to f32 rounding)
to the XLA path — asserted in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
_LUT_SHIFT = np.uint32(22)
_TWO_PI_OVER_NT = np.float32(2.0 * np.pi / 1024.0)
_CBOC_W1 = np.float32(0.953463)
_CBOC_W6 = np.float32(0.301511)


def chip_window(cf_nominal: float) -> int:
    """Static one-hot width: chips one TILE can span, padded to lanes."""
    w = int(np.ceil(TILE * cf_nominal * 1.1)) + 8
    return max(128, -(-w // 128) * 128)


def _subcarrier_factor(sub: str, cp, rel, vint):
    """Per-sample subcarrier weight at code phase cp (same contracts as
    track/engine corr(): e1b.py:48-56, l1cp.py:210-228, l2cm.py:81-91)."""
    bp = jnp.floor(2.0 * cp).astype(jnp.int32) % 2
    boc = (1 - 2 * bp).astype(jnp.float32)
    if sub == "boc11":
        return boc
    if sub in ("cboc", "tmboc"):
        bp6 = jnp.floor(12.0 * cp).astype(jnp.int32) % 2
        boc6 = (1 - 2 * bp6).astype(jnp.float32)
        if sub == "cboc":
            return _CBOC_W1 * boc + _CBOC_W6 * boc6
        u = (vint + rel) % 33
        slot = ((u == 0) | (u == 4) | (u == 6) | (u == 29)).astype(jnp.float32)
        return slot * boc6 + (1.0 - slot) * boc
    if sub == "rz_even":
        return (1 - bp).astype(jnp.float32)
    if sub == "rz_odd":
        return bp.astype(jnp.float32)
    raise ValueError(sub)


def _kernel(si_ref, sf_ref, xr_ref, xi_ref, code_ref, out_ref, acc,
            *, n_tiles, W, sub):
    c = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[0, :] = jnp.zeros((128,), jnp.float32)

    vints = (si_ref[c, 0], si_ref[c, 1], si_ref[c, 2])
    dph_a = si_ref[c, 3]
    nvalid = si_ref[c, 4]
    ph0_a = si_ref[c, 5]         # uint32 phase bits carried in int32
    dph_b = si_ref[c, 6]
    ph0_b = si_ref[c, 7]
    frs = (sf_ref[c, 0], sf_ref[c, 1], sf_ref[c, 2])
    cf = sf_ref[c, 3]

    i0 = j * TILE

    # skip tiles that are entirely past this channel's block end — blocks
    # average ~2/3 of nmax, so this prunes ~1/3 of the grid
    @pl.when(i0 < nvalid)
    def _tile():
        it = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0).reshape(TILE)
        i_abs = i0 + it

        # two separately-quantized DDS phases, indices summed — the exact
        # double-LUT product the reference's two mix_ passes produce
        # (table[i]*table[j] == table[(i+j) mod 1024])
        ph_a = (ph0_a + i_abs * dph_a).astype(jnp.uint32)
        ph_b = (ph0_b + i_abs * dph_b).astype(jnp.uint32)
        idx = (jax.lax.shift_right_logical(ph_a, _LUT_SHIFT).astype(jnp.int32)
               + jax.lax.shift_right_logical(ph_b, _LUT_SHIFT).astype(jnp.int32)
               ) & 1023
        ang = idx.astype(jnp.float32) * _TWO_PI_OVER_NT
        wc = jnp.cos(ang)
        ws = jnp.sin(ang)
        xr = xr_ref[0, 0, pl.ds(i0, TILE)]
        xi = xi_ref[0, 0, pl.ds(i0, TILE)]
        mask = (i_abs < nvalid).astype(jnp.float32)
        mr = (xr * wc - xi * ws) * mask
        mi = (xr * ws + xi * wc) * mask
        m2 = jnp.stack([mr, mi]).astype(jnp.bfloat16)       # [2, T]

        W2 = W + 128
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, W2), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        contrib = jnp.zeros((1, 128), jnp.float32)
        # one-hot in bf16 (exact for 0/1 and for the +-1/CBOC factors'
        # 8-bit mantissa needs; halves the dominant VMEM traffic) with
        # the per-lag subcarrier factor folded into it so the m2 matmul
        # operand is shared by all three lags
        ohs = []
        sas = []
        for lag in range(3):
            vint = vints[lag]
            fr = frs[lag]
            cp = fr + i_abs.astype(jnp.float32) * cf
            base = jnp.floor(fr + jnp.float32(i0) * cf).astype(jnp.int32)
            rel = jnp.floor(cp).astype(jnp.int32)
            # code window starts must be 128-lane-aligned (Mosaic dynamic
            # slice constraint); fold the sub-128 offset into the one-hot
            start = vint + base + 1
            sa = (start // 128) * 128
            delta = start - sa
            oh = (w_iota == (rel - base + delta)[:, None])
            if sub == "none":
                ohf = oh.astype(jnp.bfloat16)
            else:
                fac = _subcarrier_factor(sub, cp, rel, vint)
                ohf = (oh.astype(jnp.float32)
                       * fac[:, None]).astype(jnp.bfloat16)
            ohs.append(ohf)
            sas.append(sa)

        seg = jnp.dot(m2, jnp.concatenate(ohs, axis=1),
                      preferred_element_type=jnp.float32)   # [2, 3*W2]
        for lag in range(3):
            cw = code_ref[0, 0, pl.ds(pl.multiple_of(sas[lag], 128), W2)]
            s_re = jnp.sum(seg[0, lag * W2:(lag + 1) * W2] * cw)
            s_im = jnp.sum(seg[1, lag * W2:(lag + 1) * W2] * cw)
            contrib = contrib + jnp.where(lane == 2 * lag, s_re, 0.0)
            contrib = contrib + jnp.where(lane == 2 * lag + 1, s_im, 0.0)

        acc[0, :] = acc[0, :] + contrib[0, :]

    @pl.when(j == n_tiles - 1)
    def _():
        out_ref[0, 0, :] = acc[0, :]


@functools.partial(
    jax.jit,
    static_argnames=("n_tiles", "W", "sub", "interpret"),
)
def epl_correlate(si, sf, xr, xi, code_rows,
                  n_tiles: int, W: int, sub: str, interpret: bool = False):
    """Batched fused correlator.

    si [C, 9] int32 : vint_e, vint_p, vint_l, dphase_a, n_valid, phase0_a,
                      dphase_b, phase0_b, (unused)
    sf [C, 4] f32   : fr_e, fr_p, fr_l, cf
    xr/xi [C, NPAD] : per-channel sample rows (NPAD = n_tiles*TILE);
                      build them with UNROLLED per-channel dynamic slices
                      (a vmapped slice lowers to an element gather)
    code_rows [C, LPAD] f32: per-channel code from extend_code()
    Returns [C, 128] f32; columns 0..5 = E_re, E_im, P_re, P_im, L_re, L_im.
    """
    C = si.shape[0]
    grid = (C, n_tiles)
    return pl.pallas_call(
        functools.partial(_kernel, n_tiles=n_tiles, W=W, sub=sub),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, xr.shape[1]),
                             lambda c, j, si, sf: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, xi.shape[1]),
                             lambda c, j, si, sf: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, code_rows.shape[1]),
                             lambda c, j, si, sf: (c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 128),
                                   lambda c, j, si, sf: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((C, 1, 128), jnp.float32),
        interpret=interpret,
    )(si, sf, xr[:, None, :], xi[:, None, :],
      code_rows[:, None, :])[:, 0, :]


def extend_code(code_pm1: np.ndarray, W: int, max_advance_chips: int) -> np.ndarray:
    """[C, L] +-1 -> f32 [C, 1 + L + margin] circular extension so the
    kernel's `vint + base + 1` slice (vint < L, base <= max advance) never
    wraps."""
    c = np.asarray(code_pm1, np.float32)
    L = c.shape[1]
    # +128: the kernel aligns window starts down to a lane boundary and
    # reads W+128 lanes
    margin = int(max_advance_chips) + W + 128 + 2
    reps = -(-margin // L) + 1
    ext = np.concatenate([c[:, -1:]] + [c] * reps, axis=1)
    ext = ext[:, : 1 + L + margin]
    pad = (-ext.shape[1]) % 128
    if pad:
        ext = np.pad(ext, ((0, 0), (0, pad)))
    return np.ascontiguousarray(ext)
