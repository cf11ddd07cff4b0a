"""Bisect the fused tracking kernel's per-grid-step cost.

Rebuilds pallas_track's kernel with strippable stages, runs it K times in
a scan with a CARRIED si (so XLA cannot hoist the call — constant-input
runs get licm'd out of the loop and measure nothing), honest readback.

Levels (cumulative):
  0  DMA only: read x tile, write zeros
  1  + NCO mix (iota, phase math, cos/sin, mask)
  2  + prompt one-hot build [TILE, W2] + [2,TILE]@[TILE,W2] matmul
  3  + code window dynamic slice + prompt reduction
  4  + 16-row groups (full M build) instead of 2-row
  5  + rolls + all three lags' reductions == full kernel

Usage: python tools/probe_kernel_parts.py [level ...]
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnss_dsp_tpu.ops import pallas_track as ptk

TILE = ptk.TILE
LEAD = ptk.LEAD
_LUT_SHIFT = np.uint32(22)
_TWO_PI_OVER_NT = np.float32(2.0 * np.pi / 1024.0)

fs = 4.096e6
chip_rate = 1.023e6
L = 1023
C = 32
n = 4096
n_tiles = -(-n // TILE)
grid_tiles = n_tiles + 1
cf_v = chip_rate / fs
W = ptk.chip_window(cf_v)
K = int(os.environ.get("BENCH_K", "300"))

_GROUPS = ptk._GROUPS


def _kernel(si_ref, sf_ref, xr_ref, xi_ref, code_ref, out_ref, acc,
            *, level):
    c = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[0, :] = jnp.zeros((128,), jnp.float32)

    vints = {"e": si_ref[c, 0], "p": si_ref[c, 1], "l": si_ref[c, 2]}
    dph_a = si_ref[c, 3]
    nvalid = si_ref[c, 4]
    ph0_a = si_ref[c, 5]
    dph_b = si_ref[c, 6]
    ph0_b = si_ref[c, 7]
    ptr = si_ref[c, 8]
    frs = {"e": sf_ref[c, 0], "p": sf_ref[c, 1], "l": sf_ref[c, 2]}
    cf = sf_ref[c, 3]

    off = ptr - (ptr // TILE) * TILE
    i0 = j * TILE - off

    @pl.when(i0 < nvalid)
    def _tile():
        contrib = jnp.zeros((1, 128), jnp.float32)
        xr = xr_ref[0, :]
        xi = xi_ref[0, :]
        if level == 0:
            contrib = contrib + jnp.sum(xr) + jnp.sum(xi)
            acc[0, :] = acc[0, :] + contrib[0, :]
            return

        if level == 11:
            # 2-D variant: all elementwise math on native (8, 128) tiles
            it2 = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
                   + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1))
            i_rel2 = i0 + it2
            ph_a2 = (ph0_a + i_rel2 * dph_a).astype(jnp.uint32)
            ph_b2 = (ph0_b + i_rel2 * dph_b).astype(jnp.uint32)
            idx2 = (jax.lax.shift_right_logical(ph_a2, _LUT_SHIFT)
                    .astype(jnp.int32)
                    + jax.lax.shift_right_logical(ph_b2, _LUT_SHIFT)
                    .astype(jnp.int32)) & 1023
            ang2 = idx2.astype(jnp.float32) * _TWO_PI_OVER_NT
            wc2 = jnp.cos(ang2)
            ws2 = jnp.sin(ang2)
            mask2 = ((i_rel2 >= 0).astype(jnp.float32)
                     * (i_rel2 < nvalid).astype(jnp.float32))
            xr2 = xr.reshape(8, 128)
            xi2 = xi.reshape(8, 128)
            mr2 = (xr2 * wc2 - xi2 * ws2) * mask2
            mi2 = (xr2 * ws2 + xi2 * wc2) * mask2
            contrib = contrib + jnp.sum(mr2) + jnp.sum(mi2)
            acc[0, :] = acc[0, :] + contrib[0, :]
            return

        it = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0).reshape(TILE)
        i_rel = i0 + it
        ph_a = (ph0_a + i_rel * dph_a).astype(jnp.uint32)
        ph_b = (ph0_b + i_rel * dph_b).astype(jnp.uint32)
        idx = (jax.lax.shift_right_logical(ph_a, _LUT_SHIFT).astype(jnp.int32)
               + jax.lax.shift_right_logical(ph_b, _LUT_SHIFT).astype(jnp.int32)
               ) & 1023
        ang = idx.astype(jnp.float32) * _TWO_PI_OVER_NT
        if level == 12:    # 1-D but no transcendentals
            wc = ang * jnp.float32(0.5)
            ws = ang * jnp.float32(0.25)
        else:
            wc = jnp.cos(ang)
            ws = jnp.sin(ang)
        mask = ((i_rel >= 0).astype(jnp.float32)
                * (i_rel < nvalid).astype(jnp.float32))
        mr = (xr * wc - xi * ws) * mask
        mi = (xr * ws + xi * wc) * mask
        if level in (1, 12):
            contrib = contrib + jnp.sum(mr) + jnp.sum(mi)
            acc[0, :] = acc[0, :] + contrib[0, :]
            return

        i_f = i_rel.astype(jnp.float32)
        i_start = jnp.maximum(i0, 0).astype(jnp.float32)
        base = jnp.floor(frs["p"] + i_start * cf).astype(jnp.int32)
        cp_p = frs["p"] + i_f * cf
        rel_p = jnp.floor(cp_p).astype(jnp.int32)

        W2 = W + 128
        start = vints["p"] + base + 1 + LEAD
        sa = (start // 128) * 128
        delta = start - sa
        col = rel_p - base + delta
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, W2), 1)
        oh = (w_iota == col[:, None]).astype(jnp.bfloat16)

        if level < 4:
            m2 = jnp.stack([mr, mi]).astype(jnp.bfloat16)
            seg = jnp.dot(m2, oh, preferred_element_type=jnp.float32)
            if level == 2:
                contrib = contrib + jnp.sum(seg)
                acc[0, :] = acc[0, :] + contrib[0, :]
                return
            cw = code_ref[0, :, pl.ds(pl.multiple_of((sa // 128) * 128, 128),
                                      W2)][0]
            s_re = jnp.sum(seg[0, :] * cw)
            s_im = jnp.sum(seg[1, :] * cw)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            contrib = contrib + jnp.where(lane == 2, s_re, 0.0)
            contrib = contrib + jnp.where(lane == 3, s_im, 0.0)
            acc[0, :] = acc[0, :] + contrib[0, :]
            return

        # level >= 4: full 16-row group build
        abs_p = vints["p"] + rel_p
        rows = []
        for lag, s in _GROUPS:
            if lag == "p":
                w = jnp.ones((TILE,), jnp.float32)
            else:
                cps = frs[lag] + i_f * cf
                rels = jnp.floor(cps).astype(jnp.int32)
                sdiff = (vints[lag] + rels) - abs_p
                w = (sdiff == s).astype(jnp.float32)
            rows.append(mr * w)
            rows.append(mi * w)
        rows.append(jnp.zeros((TILE,), jnp.float32))
        rows.append(jnp.zeros((TILE,), jnp.float32))
        m16 = jnp.stack(rows).astype(jnp.bfloat16)
        seg = jnp.dot(m16, oh, preferred_element_type=jnp.float32)

        if level == 4:
            cw = code_ref[0, :, pl.ds(pl.multiple_of(sa - 128, 128), W2)][0]
            tot_re = jnp.float32(0.0)
            tot_im = jnp.float32(0.0)
            for k in range(7):
                tot_re = tot_re + jnp.sum(seg[2 * k, :] * cw)
                tot_im = tot_im + jnp.sum(seg[2 * k + 1, :] * cw)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            contrib = contrib + jnp.where(lane == 0, tot_re, 0.0)
            contrib = contrib + jnp.where(lane == 1, tot_im, 0.0)
            acc[0, :] = acc[0, :] + contrib[0, :]
            return

        # level 5: rolls + per-lag reductions (the shipped kernel)
        cwbig = code_ref[0, :, pl.ds(pl.multiple_of(sa - 128, 128), W2 + 256)]
        cw = cwbig[:, 128:128 + W2]
        cwm = pltpu.roll(cwbig, shift=1, axis=1)[:, 128:128 + W2]
        cwp = pltpu.roll(cwbig, shift=W2 + 255, axis=1)[:, 128:128 + W2]
        cw_of = {-1: cwm, 0: cw, 1: cwp}
        sums = {}
        for k, (lag, s) in enumerate(_GROUPS):
            cwk = cw_of[s][0]
            re = jnp.sum(seg[2 * k, :] * cwk)
            im = jnp.sum(seg[2 * k + 1, :] * cwk)
            pre = sums.get(lag, (0.0, 0.0))
            sums[lag] = (pre[0] + re, pre[1] + im)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        for k, lag in enumerate(("e", "p", "l")):
            contrib = contrib + jnp.where(lane == 2 * k, sums[lag][0], 0.0)
            contrib = contrib + jnp.where(lane == 2 * k + 1, sums[lag][1], 0.0)
        acc[0, :] = acc[0, :] + contrib[0, :]

    @pl.when(j == grid_tiles - 1)
    def _():
        out_ref[0, 0, :] = acc[0, :]


@functools.partial(jax.jit, static_argnames=("level",))
def correlate(si, sf, xr, xi, code_rows, level: int):
    grid = (C, grid_tiles)
    return pl.pallas_call(
        functools.partial(_kernel, level=level),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, TILE),
                             lambda c, j, si, sf: (0, si[c, 8] // TILE + j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE),
                             lambda c, j, si, sf: (0, si[c, 8] // TILE + j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, code_rows.shape[1]),
                             lambda c, j, si, sf: (c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 128), lambda c, j, si, sf: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((C, 1, 128), jnp.float32),
    )(si, sf, xr, xi, code_rows[:, None, :])[:, 0, :]


rng = np.random.default_rng(0)
nchunk = int(os.environ.get("BENCH_NCHUNK", str(64 * TILE)))
code = rng.choice([-1, 1], (C, L)).astype(np.int8)
code_rows = jnp.asarray(
    ptk.extend_code(code, W, int((n_tiles + 2) * TILE * cf_v) + 2))
xr = jnp.asarray(rng.standard_normal((1, nchunk)).astype(np.float32))
xi = jnp.asarray(rng.standard_normal((1, nchunk)).astype(np.float32))
si = np.zeros((C, 9), np.int32)
sf = np.zeros((C, 4), np.float32)
si[:, 0] = 99; si[:, 1] = 100; si[:, 2] = 100
sf[:, 0] = 0.95; sf[:, 1] = 0.0; sf[:, 2] = 0.05
si[:, 3] = 1 << 18
si[:, 4] = n
si[:, 5] = rng.integers(0, 1 << 31, C)
si[:, 6] = 1 << 12
si[:, 7] = rng.integers(0, 1 << 31, C)
si[:, 8] = rng.integers(0, 7 * TILE, C)
sf[:, 3] = cf_v
si = jnp.asarray(si); sf = jnp.asarray(sf)
MOD = nchunk - (n_tiles + 2) * TILE


@functools.partial(jax.jit, static_argnames=("level",))
def scan_carry(si, sf, xr, xi, code_rows, level):
    def step(carry, _):
        acc, si_c = carry
        out = correlate(si_c, sf, xr, xi, code_rows, level)
        si_n = si_c.at[:, 8].set((si_c[:, 8] + n) % MOD)
        return (acc + out, si_n), None
    (acc, _), _ = jax.lax.scan(
        step, (jnp.zeros((C, 128), jnp.float32), si), None, length=K)
    return acc


for arg in (sys.argv[1:] or ["0", "1", "2", "3", "4", "5"]):
    level = int(arg)
    t0 = time.perf_counter()
    out = np.asarray(scan_carry(si, sf, xr, xi, code_rows, level))
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = np.asarray(scan_carry(si, sf, xr, xi, code_rows, level))
        best = min(best, time.perf_counter() - t0)
    print(f"level {level}: {best / K * 1e6:9.1f} us/call  "
          f"(compile {compile_s:.1f}s)  out={out[0, :2].round(1)}")
