"""Fused wipeoff + early/prompt/late correlator as a Pallas TPU kernel.

The tracking hot loop (reference: per-sample Numba `correlate`,
gps/ca.py:120-128, plus `nco.mix_`) needs, per channel per sub-block,
carrier mixing and three code-phase-indexed multiply-accumulates.  The
straight XLA formulation gathers ~5n table elements per channel-block,
and TPU gathers cost ~10+ cycles/element — they dominate the tracking
engine.

This kernel is gather-free AND glue-free:

  * Sample addressing happens inside the kernel.  The whole device
    chunk is passed once as a shared [1, NCHUNK] plane pair; each
    channel's window is selected with a scalar-prefetch-dependent
    BlockSpec index map (block j of channel c = chunk tile
    ptr[c]//TILE + j), so the per-scan-step XLA glue of C unrolled
    dynamic slices + stacks (the round-1 throughput bound) disappears.
    The sub-tile offset ptr % TILE is folded into the phase/code-phase
    arithmetic and the validity mask — no unaligned slicing anywhere.

  * ONE shared one-hot serves all three lags.  Over a TILE-sample
    stretch the code phase advances at most TILE*cf chips, so the tile
    touches one contiguous <= W-chip window and the prompt chip lookup
    becomes an on-the-fly one-hot MXU matmul.  Early/late differ from
    prompt by a fractional lag, so their chip index is the prompt index
    shifted by s in {-1, 0, +1} per sample; instead of building three
    one-hots (3x the VPU work, the round-1 design), samples are routed
    into MXU ROW GROUPS keyed by (lag, s):

      M[16, TILE]  rows = m * w_group   (m = carrier-wiped samples,
                                         w = subcarrier factor * 1{s})
      seg = M @ onehot                  [16, W2]   <- one MXU pass
      E   = seg_e0.cw + seg_em.cw(-1) + seg_ep.cw(+1)  etc.

    where cw(+-1) are the code window lane-rolled by one chip.  The
    one-hot build — the dominant VPU term — is paid once instead of
    three times.

  * NO 1-D vector math.  Mosaic lays a 1-D [1024] value out as
    sublane-starved (1, 1024) vregs; identical elementwise code measured
    ~16x slower than on dense 2-D tiles (tools/probe_kernel_parts.py).
    So every heavy elementwise stage (NCO phases, trig, masks, per-lag
    code phases, group weights) is computed directly on the [16, TILE]
    matmul-operand shape, with per-row lag/parity parameters selected by
    row-index compares — no stacks, no relayouts.

The carrier NCO is evaluated in-kernel on the same quantized 1024-entry
grid as the engine (ops/nco.py): uint32 DDS phase, top 10 bits ->
cos/sin.  The code row is pre-extended host-side (extend_code) with a
128-lane lead so window slices (including the -1 roll) never wrap and
stay 128-aligned.

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
LEAD = 128              # extend_code lane lead so cw(-1) reads stay in range


def env_interpret() -> bool:
    """CPU test hook: GNSS_DSP_PALLAS_INTERPRET=1 runs every tracking
    kernel in pallas interpret mode so the full engine paths (v1/v2/
    fused) execute on the CPU backend.  Read at trace time."""
    import os

    return bool(os.environ.get("GNSS_DSP_PALLAS_INTERPRET"))


_LUT_SHIFT = np.uint32(22)
_TWO_PI_OVER_NT = np.float32(2.0 * np.pi / 1024.0)
_CBOC_W1 = np.float32(0.953463)
_CBOC_W6 = np.float32(0.301511)


def chip_window(cf_nominal: float, tile: int = TILE) -> int:
    """Static one-hot width: chips one tile can span (with slack for the
    doppler-aided dynamic cf), padded to lanes."""
    w = int(np.ceil(tile * cf_nominal * 1.1)) + 8
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


# row-group layout in the [16, TILE] matmul operand: (lag, chip shift s
# relative to prompt) -> rows 2k (re), 2k+1 (im)
_GROUPS = (
    ("p", 0), ("e", 0), ("e", -1), ("e", 1), ("l", 0), ("l", 1), ("l", -1),
)


def _kernel(si_ref, sf_ref, xr_ref, xi_ref, code_ref, out_ref, acc,
            win_ref=None, dma_sem=None, *, grid_tiles, W, sub, stream):
    c = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[0, :] = jnp.zeros((128,), jnp.float32)

    vints = {"e": si_ref[c, 0], "p": si_ref[c, 1], "l": si_ref[c, 2]}
    dph_a = si_ref[c, 3]
    nvalid = si_ref[c, 4]
    ph0_a = si_ref[c, 5]         # uint32 phase bits carried in int32
    dph_b = si_ref[c, 6]
    ph0_b = si_ref[c, 7]
    ptr = si_ref[c, 8]
    frs = {"e": sf_ref[c, 0], "p": sf_ref[c, 1], "l": sf_ref[c, 2]}
    cf = sf_ref[c, 3]

    off = ptr - (ptr // TILE) * TILE          # sub-tile sample offset
    i0 = j * TILE - off                       # i_rel of this tile's sample 0

    # skip tiles entirely past this channel's block end — blocks average
    # ~2/3 of nmax, so this prunes a third of the grid
    @pl.when(i0 < nvalid)
    def _tile():
        # ALL heavy elementwise math happens directly on the [16, TILE]
        # matmul-operand shape — never on 1-D [TILE] vectors.  Mosaic lays
        # a 1-D 1024-vector out as (1, 1024) sublane-starved vregs, which
        # measured ~16x slower than the same ops on dense 2-D tiles (see
        # tools/probe_kernel_parts.py); the original per-row build of m16
        # from 1-D pieces was a 5 ms/call kernel for that reason alone.
        g1 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)   # row id
        lg = g1 // 2                          # lag-group id 0..7
        par = (g1 - lg * 2).astype(jnp.float32)   # 0 = re row, 1 = im row

        # per-row lag parameters via row-index compares (compare -> cast
        # -> multiply: i1-vector wheres hit Mosaic relayout bugs)
        fr_row = jnp.zeros((16, 1), jnp.float32)
        vint_row = jnp.zeros((16, 1), jnp.int32)
        s_row = jnp.zeros((16, 1), jnp.int32)
        live = jnp.zeros((16, 1), jnp.float32)    # 0 for pad rows 14/15
        for k, (lag, s) in enumerate(_GROUPS):
            mk = (lg == k).astype(jnp.float32)
            mki = (lg == k).astype(jnp.int32)
            fr_row = fr_row + mk * frs[lag]
            vint_row = vint_row + mki * vints[lag]
            s_row = s_row + mki * jnp.int32(s)
            live = live + mk

        t16 = jax.lax.broadcasted_iota(jnp.int32, (16, TILE), 1)
        i_rel = i0 + t16                      # < 0 in the lead of tile 0

        # two separately-quantized DDS phases, indices summed — the exact
        # double-LUT product the reference's two mix_ passes produce
        # (table[i]*table[j] == table[(i+j) mod 1024])
        ph_a = (ph0_a + i_rel * dph_a).astype(jnp.uint32)
        ph_b = (ph0_b + i_rel * dph_b).astype(jnp.uint32)
        idx = (jax.lax.shift_right_logical(ph_a, _LUT_SHIFT).astype(jnp.int32)
               + jax.lax.shift_right_logical(ph_b, _LUT_SHIFT).astype(jnp.int32)
               ) & 1023
        ang = idx.astype(jnp.float32) * _TWO_PI_OVER_NT
        wc = jnp.cos(ang)
        ws = jnp.sin(ang)
        mask = ((i_rel >= 0).astype(jnp.float32)
                * (i_rel < nvalid).astype(jnp.float32))
        # row parity folds the re/im selection into the rotation coeffs:
        # re rows get (wc, -ws), im rows (ws, wc)
        ca = (wc * (1.0 - par) + ws * par) * mask
        cb = (wc * par - ws * (1.0 - par)) * mask

        i_f = i_rel.astype(jnp.float32)
        # per-row code phase / chip index / group weight, all [16, TILE]
        cp_row = fr_row + i_f * cf
        rel_row = jnp.floor(cp_row).astype(jnp.int32)
        cp_p = frs["p"] + i_f * cf
        rel_p = jnp.floor(cp_p).astype(jnp.int32)
        sdiff = (vint_row + rel_row) - (vints["p"] + rel_p)
        # == s automatically holds on prompt rows (sdiff == 0 == s)
        w = ((sdiff - s_row) == 0).astype(jnp.float32) * live
        if sub != "none":
            w = w * _subcarrier_factor(sub, cp_row, rel_row, vint_row)

        xr = xr_ref[0:1, :]                   # (1, TILE), broadcasts over rows
        xi = xi_ref[0:1, :]
        m16 = ((xr * ca + xi * cb) * w).astype(jnp.bfloat16)   # [16, TILE]

        i_start = jnp.maximum(i0, 0).astype(jnp.float32)
        base = jnp.floor(frs["p"] + i_start * cf).astype(jnp.int32)

        # shared prompt one-hot in bf16 (exact for 0/1; the +-1/CBOC
        # factors ride in the row weights' 8-bit-mantissa budget).  col is
        # the transpose of the prompt rows of rel_p: cheap 1-D ops only.
        it = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0).reshape(TILE)
        i_f1 = (i0 + it).astype(jnp.float32)
        rel_p1 = jnp.floor(frs["p"] + i_f1 * cf).astype(jnp.int32)
        W2 = W + 128
        start = vints["p"] + base + 1 + LEAD
        sa = (start // 128) * 128
        delta = start - sa
        col = rel_p1 - base + delta
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, W2), 1)
        oh = (w_iota == col[:, None]).astype(jnp.bfloat16)

        seg = jnp.dot(m16, oh, preferred_element_type=jnp.float32)  # [16, W2]

        # code windows at chip shifts -1/0/+1: one wide aligned read,
        # lane-rolled (the wrapped element falls outside [128, 128+W2)).
        # stream=True keeps the (possibly multi-million-chip) extended row
        # in HBM and DMAs just this tile's [sa-128, sa+W2+128) window into
        # a VMEM scratch — GLONASS P / L2CL rows cannot be VMEM-resident
        # (glonass/p.py:7-20: 5.11M chips -> 20 MB f32 per channel)
        if stream:
            dma = pltpu.make_async_copy(
                code_ref.at[c, :, pl.ds(pl.multiple_of(sa - 128, 128),
                                        W2 + 256)],
                win_ref,
                dma_sem,
            )
            dma.start()
            dma.wait()
            cwbig = win_ref[0:1, :]
        else:
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
        contrib = jnp.zeros((1, 128), jnp.float32)
        for k, lag in enumerate(("e", "p", "l")):
            contrib = contrib + jnp.where(lane == 2 * k, sums[lag][0], 0.0)
            contrib = contrib + jnp.where(lane == 2 * k + 1, sums[lag][1], 0.0)
        acc[0, :] = acc[0, :] + contrib[0, :]

    @pl.when(j == grid_tiles - 1)
    def _():
        out_ref[0, 0, :] = acc[0, :]


@functools.partial(
    jax.jit, static_argnames=("n_tiles", "W", "sub", "stream", "interpret"),
)
def epl_correlate(si, sf, xr, xi, code_rows,
                  n_tiles: int, W: int, sub: str, stream: bool = False,
                  interpret: bool = False):
    """Batched fused correlator over a SHARED sample chunk.

    si [C, 9] int32 : vint_e, vint_p, vint_l, dphase_a, n_valid, phase0_a,
                      dphase_b, phase0_b, ptr
    sf [C, 4] f32   : fr_e, fr_p, fr_l, cf
    xr/xi [1, NCHUNK] f32 : the whole chunk, NCHUNK % TILE == 0 and
                      ptr + (n_tiles+1)*TILE <= NCHUNK for every channel;
                      per-channel tiles are DMA'd via the scalar-prefetch
                      index map (no host-side slicing)
    code_rows [C, LPAD] f32: per-channel code from extend_code()
    stream : keep code_rows in HBM and DMA only each tile's <= W2+256-lane
             window into VMEM scratch — required for multi-million-chip
             codes (GLONASS P, L2CL) whose extended rows exceed VMEM.
    Returns [C, 128] f32; columns 0..5 = E_re, E_im, P_re, P_im, L_re, L_im.
    """
    interpret = interpret or env_interpret()
    C = si.shape[0]
    grid_tiles = n_tiles + 1          # +1: ptr lands mid-tile
    grid = (C, grid_tiles)
    W2 = W + 128
    chunk_spec = pl.BlockSpec((1, TILE),
                              lambda c, j, si, sf: (0, si[c, 8] // TILE + j),
                              memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((1, 128), jnp.float32)]
    if stream:
        code_spec = pl.BlockSpec(memory_space=pl.ANY)
        code_arg = code_rows[:, None, :]
        scratch += [pltpu.VMEM((1, W2 + 256), jnp.float32),
                    pltpu.SemaphoreType.DMA]
    else:
        code_spec = pl.BlockSpec((1, 1, code_rows.shape[1]),
                                 lambda c, j, si, sf: (c, 0, 0),
                                 memory_space=pltpu.VMEM)
        code_arg = code_rows[:, None, :]
    return pl.pallas_call(
        functools.partial(_kernel, grid_tiles=grid_tiles, W=W, sub=sub,
                          stream=stream),
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


def extend_code(code_pm1: np.ndarray, W: int, max_advance_chips: int) -> np.ndarray:
    """[C, L] +-1 -> f32 [C, LEAD + 1 + L + margin] circular extension so
    the kernel's wide window read [sa-128, sa+W2+128) (sa derived from
    vint + base + 1 + LEAD; vint < L, base <= max advance) never leaves
    the row.  ext[LEAD + 1 + k] = code[k mod L] for k >= -1-LEAD."""
    c = np.asarray(code_pm1, np.float32)
    L = c.shape[1]
    # W+128 one-hot columns, +128 roll guard on each side, +8*128 for the
    # streamed kernels' 8-sublane-row DMA size round-up
    margin = int(max_advance_chips) + W + 3 * 128 + 2 + 8 * 128
    lead_reps = -(-(LEAD + 1) // L)
    reps = -(-margin // L) + 1
    ext = np.concatenate([c] * (lead_reps + reps), axis=1)
    # place ext so that column LEAD+1 is code[0]
    shift = (lead_reps * L) - (LEAD + 1)
    ext = ext[:, shift: shift + LEAD + 1 + L + margin]
    pad = (-ext.shape[1]) % 128
    if pad:
        ext = np.pad(ext, ((0, 0), (0, pad)))
    return np.ascontiguousarray(ext)
