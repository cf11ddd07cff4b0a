"""Fused EXTENDED-COHERENT acquisition surface kernel.

The XLA coherent engine (acquire/coherent.py, grid_search_coherent) pays
full-precision forward+inverse XLA FFTs plus [A, P, DC, G, W] einsum
materialization — measured 1.02 Gcells/s on the L5I NH10 grid vs the
non-coherent v2 kernel's 45.8 (BENCH_r04).  This kernel runs the same
coherent math inside the v2 surface kernel's structure
(ops/pallas_acquire2): per (doppler, block-group) grid step it computes
the per-block COMPLEX correlation surfaces by the two-stage Karatsuba
IDFT, then folds them into per-alignment VMEM accumulators instead of a
magnitude sum:

    accC[a] += s[(a + m) mod N] * rot(d, m) * x_m        (complex)

where s is the +-1 secondary overlay, rot(d, m) = exp(-2pi i*n*d/fs*m)
the per-block residual-carrier rotation (the per-block doppler wipe
restarts its phase at every block start, engine.chunk_q semantics), and
m the global block index.  rot is a per-block SCALAR, so the rotation
costs 4 vector ops/cell/block and each alignment adds only 2 sign-folded
accumulate passes (s is +-1): 4 + 2A VPU ops/cell/block total against
the IDFT's ~6(n1+n2) MXU MACs.  At every secondary-period boundary
(m_coh blocks) the accumulators fold non-coherently:

    accQ[a] += |accC[a]|;  accC[a] = 0

and the final grid step reduces max over alignments -> peak / argmax /
winning alignment IN-KERNEL, so no [A, ...] tensor ever reaches HBM.

Geometry is the signal's NON-coherent search geometry (window = n
circular, or 2n zero-padded-code / v2p padded-lag route) — NOT the XLA
coherent engine's always-circular window = n.  For pad2 signals the 2n
linear windows are strictly better: each block's correlation at lag j
covers exactly one full code period starting at sample j, which lies
inside a single overlay chip, so the boundary-straddle loss of the
circular form (acquire/coherent.py module docstring) vanishes.  The
winning alignment then names the overlay chip of capture period 0
unconditionally (CoherentAcqResult.linear).

Block-group lane packing (g = 128/n1 > 1) is supported: the g
lane-packed blocks accumulate side by side and are lane-rolled together
just before each magnitude fold.  Requires bt % g == 0 and
m_coh % bt == 0 so overlay-period boundaries land on grid steps —
plan_coh returns None (XLA fallback) otherwise or when the per-PRN
accumulators don't fit VMEM.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnss_dsp_tpu.ops.pallas_acquire2 import pick_g, plan_aligned


def _divisor_bt(m_coh: int, g: int, cap: int) -> int | None:
    """Largest bt <= cap with bt % g == 0 and m_coh % bt == 0."""
    for bt in range(min(cap, m_coh), 0, -1):
        if bt % g == 0 and m_coh % bt == 0:
            return bt
    return None


def plan_coh(window: int, m_coh: int, A: int, P: int):
    """(n1, n2, bt, pc) for the coherent kernel at FFT length `window`,
    or None when the shape can't ride it (no aligned split, no valid
    block group, or accumulators too big for VMEM)."""
    try:
        n1, n2 = plan_aligned(window)
    except ValueError:
        return None
    g = pick_g(n1)
    if m_coh % g != 0:
        return None
    # ~6 live [bt, W] f32 intermediates inside the PRN loop (same model
    # as pallas_acquire2.pick_bt), under ~3 MB with the accumulators
    # taking the rest of VMEM
    cap = max(1, int(3e6 // (24 * window)))
    bt = _divisor_bt(m_coh, g, cap)
    if bt is None:
        return None
    # accC [pc, 2, A, .] + accQ [pc, A, .] f32 = 12*A*W bytes per PRN,
    # kept well under the scoped-VMEM limit (accumulate temporaries add
    # a per-slot shadow, cf. _vmem_spec's measured 2x)
    pc = int(6e6 // (12 * A * window))
    if pc < 1:
        return None
    return n1, n2, bt, min(pc, P)


def _vmem_spec(window, ac, bt, pc):
    """Measured scoped-VMEM model for the spec kernel: ~8 bytes/cell per
    resident alignment slot (the f32 accQ slot + its accumulate shadow —
    A=20 at W=65536 measured 16.40M, matching 8*A*W + the fixed terms),
    ~6 live [bt, W] f32 stage intermediates, double-buffered bf16 F
    tiles, code bank, DFT mats."""
    return (8 * ac * window * pc + 24 * bt * window
            + 8 * bt * window + 8 * pc * window + 1.5e6)


# calibrated between the measured-fit (L5I A=10 bt=4 pc=1, model 15.65M,
# compiles and runs) and the measured-OOM (A=20 bt=2 pc=1, model 16.67M,
# actual 16.40M vs the 16M scoped limit) points
_VMEM_LIMIT = 15.75e6


def plan_coh_spec(window: int, G: int, A: int, P: int):
    """(n1, n2, bt, pc, ac) for the SPECTRAL-COMBINE coherent kernel
    (corr_surface_coh_spec) — the fast path.  Requires an aligned split
    with g == 1 (n1 >= 128): the per-row alignment-slot accumulation
    doesn't support lane-packed blocks.  ac <= A is the alignment-chunk
    size: when all A alignment surfaces don't fit VMEM (CS25-class),
    the engine runs ceil(A/ac) kernel passes over alignment subsets —
    each pass repeats the IDFT, so passes are minimized first, then
    bt*pc (cells per grid step) maximized.  Returns None when even
    ac = 1 doesn't fit (the block kernel / XLA engine covers it)."""
    try:
        n1, n2 = plan_aligned(window)
    except ValueError:
        return None
    if pick_g(n1) != 1:
        return None
    # measured hard cap on resident accQ bytes (round 5, W=65536 bt=1:
    # A=18 compiles, A=20 OOMs by 1.6M and A=17/bt=2 by 0.4M while the
    # additive model admitted all three — the per-slot cost grows
    # superlinearly near the limit, so large-A chunked plans get a
    # conservative accQ cap AND bt pinned to 1 (measured safe).
    acc_cap = int(8.5e6 // (8 * window))
    ac_max = 0
    for ac in range(min(A, max(acc_cap, 1)), 0, -1):
        if _vmem_spec(window, ac, 1, 1) <= _VMEM_LIMIT:
            ac_max = ac
            break
    if not ac_max:
        return None
    passes = -(-A // ac_max)
    ac = -(-A // passes)            # smallest ac with that pass count
    best = None
    GA = G * ac
    for bt in ([1] if passes > 1 else range(GA, 0, -1)):
        if GA % bt:
            continue
        for pc in range(min(P, 8), 0, -1):
            if _vmem_spec(window, ac, bt, pc) <= _VMEM_LIMIT:
                work = bt * pc
                if best is None or work > best[0]:
                    best = (work, bt, pc)
                break
    if best is None:
        return None
    return n1, n2, best[1], best[2], ac


def _finalize_max(accQ, p, A, n1, n2, g, n_valid, out_ref):
    """Shared finalize: max over alignment slots -> (peak, idx, align)
    lanes of out_ref[0, p].  accQ[p, a] surfaces are [n2, g*n1]."""
    best = accQ[p, 0]
    ab = jnp.zeros((n2, g * n1), jnp.float32)
    for a in range(1, A):
        q_a = accQ[p, a]
        upd = q_a > best
        best = jnp.where(upd, q_a, best)
        ab = jnp.where(upd, jnp.float32(a), ab)
    col = jax.lax.broadcasted_iota(jnp.int32, (n2, g * n1), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (n2, g * n1), 0)
    nat = col * n2 + row_i
    a_m = jnp.where(col < n1, best, -jnp.inf)
    if n_valid:
        jrep = nat - (n1 * n2 - n_valid)
        a_m = jnp.where(jrep >= 0, a_m, -jnp.inf)
        nat = jrep
    mx = jnp.max(a_m)
    idx = jnp.min(jnp.where(a_m >= mx, nat, n1 * n2))
    # alignment at the winning cell (nested wheres — i1-vector `&`
    # miscompiles on this Mosaic toolchain)
    al = jnp.max(jnp.where(a_m >= mx,
                           jnp.where(nat == idx, ab, -1.0),
                           -1.0))
    lr = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    rowv = jnp.where(lr == 0, mx, 0.0)
    rowv = rowv + jnp.where(lr == 1, idx.astype(jnp.float32), 0.0)
    rowv = rowv + jnp.where(lr == 2, al, 0.0)
    out_ref[0, p] = rowv[0]


def _kernel_spec(fr_ref, fi_ref, cr_ref, ci_ref,
                 w1r_ref, w1s_ref, w1d_ref, w2r_ref, w2s_ref, w2d_ref,
                 twr_ref, twi_ref, out_ref, accQ, *,
                 nb, P, A, n1, n2, bt, n_valid):
    """Spectral-combine coherent kernel (g == 1): input rows are the
    per-(group, alignment) COHERENTLY-COMBINED spectra Fa (the overlay /
    rotation contraction ran in XLA spectral space — the IDFT is linear
    in F, so IDFT(C * conj(sum_m w_m F_m)) IS the coherent sum).  Each
    row's magnitude accumulates into its alignment's slot: same MXU work
    per row as the non-coherent v2 kernel."""
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        # per-slot zeroing: a whole-array jnp.zeros_like materializes
        # the full [P, A, n2, n1] constant as a stack temporary and
        # doubles the accumulator's scoped-VMEM footprint (measured:
        # A=25 at W=65536 OOMs by exactly that margin)
        def zp(p, _):
            for a in range(A):
                accQ[p, a] = jnp.zeros((n2, n1), jnp.float32)
            return 0
        jax.lax.fori_loop(0, P, zp, 0)

    fr = fr_ref[0]                   # [bt, n1, n2] bf16
    fi = fi_ref[0]
    twr = twr_ref[...]
    twi = twi_ref[...]

    def prn_body(p, _):
        cr = cr_ref[p]
        ci = ci_ref[p]

        pr = cr[None] * fr + ci[None] * fi
        pi = ci[None] * fr - cr[None] * fi
        pr2 = pr.reshape(bt * n1, n2)
        pi2 = pi.reshape(bt * n1, n2)

        def mm(a, m):
            return jnp.dot(a, m, preferred_element_type=jnp.float32)

        m1 = mm((pr2 + pi2).astype(jnp.bfloat16), w2r_ref[...])
        m2 = mm(pi2, w2s_ref[...])
        m3 = mm(pr2, w2d_ref[...])
        ar = (m1 - m2).reshape(bt, n1, n2)
        ai = (m1 + m3).reshape(bt, n1, n2)

        ar2 = ar * twr[None] - ai * twi[None]
        ai2 = ar * twi[None] + ai * twr[None]

        art = jnp.swapaxes(ar2, 1, 2).reshape(bt * n2, n1)
        ait = jnp.swapaxes(ai2, 1, 2).reshape(bt * n2, n1)
        art = art.astype(jnp.bfloat16)
        ait = ait.astype(jnp.bfloat16)

        k1 = mm((art + ait).astype(jnp.bfloat16), w1r_ref[...])
        k2 = mm(ait, w1s_ref[...])
        k3 = mm(art, w1d_ref[...])
        xr = k1 - k2                 # [bt*n2, n1] f32
        xi = k1 + k3

        for j in range(bt):
            xr_j = xr[j * n2:(j + 1) * n2]
            xi_j = xi[j * n2:(j + 1) * n2]
            mag = jnp.sqrt(xr_j * xr_j + xi_j * xi_j)
            # row (b*bt + j) is (group-major, alignment-minor)
            a_j = (b * bt + j) % A if A > 1 else 0
            accQ[p, a_j] = accQ[p, a_j] + mag
        return 0

    jax.lax.fori_loop(0, P, prn_body, 0)

    @pl.when(b == nb - 1)
    def _finalize():
        def fin(p, _):
            _finalize_max(accQ, p, A, n1, n2, 1, n_valid, out_ref)
            return 0
        jax.lax.fori_loop(0, P, fin, 0)


@functools.partial(jax.jit,
                   static_argnames=("n1", "n2", "bt", "A", "n_valid",
                                    "interpret"))
def corr_surface_coh_spec(f2, code_f, n1: int, n2: int, bt: int, A: int,
                          n_valid: int = 0, interpret: bool = False):
    """Coherent search on pre-combined spectra.

    f2     : split bf16 [DC, G*A, W] — row g*A + a is the coherently
             combined spectrum sum_m conj(w[a, m]) F_m over group g's
             blocks (w = overlay sign x residual rotation), permuted
             order for (n1, n2)
    code_f : split bf16 [P, W]
    Returns (peak [P, DC], code idx [P, DC] i32, align [P, DC] i32).
    """
    from gnss_dsp_tpu.ops.pallas_track import env_interpret

    interpret = interpret or env_interpret()
    fr, fi = f2
    cr, ci = code_f
    P = cr.shape[0]
    DC, GA, W = fr.shape
    assert n1 * n2 == W and GA % bt == 0 and pick_g(n1) == 1
    nb = GA // bt
    from gnss_dsp_tpu.ops.pallas_acquire2 import _mats2

    w1, w2, tw = _mats2(W)
    mats = [jnp.asarray(a) for grp in (w1, w2, tw) for a in grp]

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda d, b: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    def v4(a, lead):
        return a.reshape(lead + (n1, n2))

    out = pl.pallas_call(
        functools.partial(_kernel_spec, nb=nb, P=P, A=A, n1=n1, n2=n2,
                          bt=bt, n_valid=n_valid),
        grid=(DC, nb),
        in_specs=[
            pl.BlockSpec((1, bt, n1, n2), lambda d, b: (d, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, n1, n2), lambda d, b: (d, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, n1, n2), lambda d, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, n1, n2), lambda d, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [const_spec(m) for m in mats],
        out_specs=pl.BlockSpec((1, P, 128), lambda d, b: (d, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((DC, P, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P, A, n2, n1), jnp.float32)],
        interpret=interpret,
    )(v4(fr, (DC, GA)), v4(fi, (DC, GA)), v4(cr, (P,)), v4(ci, (P,)),
      *mats)

    peak = jnp.transpose(out[:, :, 0])
    idx = jnp.transpose(out[:, :, 1]).astype(jnp.int32)
    al = jnp.transpose(out[:, :, 2]).astype(jnp.int32)
    return peak, idx, al


def _kernel(cos_ref, sin_ref, sec_ref, fr_ref, fi_ref, cr_ref, ci_ref,
            w1r_ref, w1s_ref, w1d_ref, w2r_ref, w2s_ref, w2d_ref,
            twr_ref, twi_ref, out_ref, accC, accQ, *,
            nb, P, A, n1, n2, g, bt, m_coh, n_valid):
    d = pl.program_id(0)
    b = pl.program_id(1)
    btg = bt // g
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, g * n1), 1)
    log2n1 = int(np.log2(n1)) if n1 < 128 else 0

    @pl.when(b == 0)
    def _():
        # per-slot zeroing (see _kernel_spec: whole-array zeros_like
        # doubles the scoped-VMEM footprint)
        def zp(p, _):
            for a in range(A):
                accC[p, 0, a] = jnp.zeros((n2, g * n1), jnp.float32)
                accC[p, 1, a] = jnp.zeros((n2, g * n1), jnp.float32)
                accQ[p, a] = jnp.zeros((n2, g * n1), jnp.float32)
            return 0
        jax.lax.fori_loop(0, P, zp, 0)

    fr = fr_ref[0]                   # [bt, n1, n2] bf16
    fi = fi_ref[0]
    twr = twr_ref[...]
    twi = twi_ref[...]

    # per-row-group (cos, sin) lane rows: lane k*n1..(k+1)*n1-1 carries
    # block m = b*bt + jg*g + k's rotation scalar (g SMEM reads + selects
    # on a [1, g*n1] row — negligible next to the per-cell passes)
    def rot_rows(jg):
        m0 = b * bt + jg * g
        if g == 1:
            c = cos_ref[d, m0]
            s = sin_ref[d, m0]
            return c, s
        blk = lane >> log2n1 if n1 < 128 else jnp.zeros_like(lane)
        c = jnp.zeros((1, g * n1), jnp.float32)
        s = jnp.zeros((1, g * n1), jnp.float32)
        for k in range(g):
            sel = (blk == k).astype(jnp.float32)
            c = c + sel * cos_ref[d, m0 + k]
            s = s + sel * sin_ref[d, m0 + k]
        return c, s

    def sec_row(a, jg):
        """Overlay sign(s) of alignment a for the row-group's blocks."""
        m0 = b * bt + jg * g
        if g == 1:
            return sec_ref[a, m0]
        blk = lane >> log2n1
        r = jnp.zeros((1, g * n1), jnp.float32)
        for k in range(g):
            r = r + (blk == k).astype(jnp.float32) * sec_ref[a, m0 + k]
        return r

    def prn_body(p, _):
        cr = cr_ref[p]               # [n1, n2] bf16
        ci = ci_ref[p]

        pr = cr[None] * fr + ci[None] * fi
        pi = ci[None] * fr - cr[None] * fi
        pr2 = pr.reshape(bt * n1, n2)
        pi2 = pi.reshape(bt * n1, n2)

        def mm(a, m):
            return jnp.dot(a, m, preferred_element_type=jnp.float32)

        m1 = mm((pr2 + pi2).astype(jnp.bfloat16), w2r_ref[...])
        m2 = mm(pi2, w2s_ref[...])
        m3 = mm(pr2, w2d_ref[...])
        ar = (m1 - m2).reshape(bt, n1, n2)
        ai = (m1 + m3).reshape(bt, n1, n2)

        ar2 = ar * twr[None] - ai * twi[None]
        ai2 = ar * twi[None] + ai * twr[None]

        art = jnp.swapaxes(ar2.reshape(btg, g * n1, n2), 1, 2)
        ait = jnp.swapaxes(ai2.reshape(btg, g * n1, n2), 1, 2)
        art = art.reshape(btg * n2, g * n1).astype(jnp.bfloat16)
        ait = ait.reshape(btg * n2, g * n1).astype(jnp.bfloat16)

        k1 = mm((art + ait).astype(jnp.bfloat16), w1r_ref[...])
        k2 = mm(ait, w1s_ref[...])
        k3 = mm(art, w1d_ref[...])
        xr = k1 - k2                 # [btg*n2, g*n1] f32
        xi = k1 + k3

        # coherent per-alignment accumulation, one row-group at a time
        for jg in range(btg):
            xr_j = xr[jg * n2:(jg + 1) * n2]
            xi_j = xi[jg * n2:(jg + 1) * n2]
            c, s = rot_rows(jg)
            y_re = c * xr_j - s * xi_j
            y_im = c * xi_j + s * xr_j
            for a in range(A):
                sv = sec_row(a, jg)
                accC[p, 0, a] = accC[p, 0, a] + sv * y_re
                accC[p, 1, a] = accC[p, 1, a] + sv * y_im
        return 0

    jax.lax.fori_loop(0, P, prn_body, 0)

    # overlay-period boundary: fold |accC| into accQ (g lane-packed
    # blocks are first lane-rolled together; lanes >= n1 then carry
    # garbage that the final col < n1 mask discards)
    @pl.when(((b + 1) * bt) % m_coh == 0)
    def _boundary():
        def fold(p, _):
            for a in range(A):
                cre = accC[p, 0, a]
                cim = accC[p, 1, a]
                step = (g * n1) // 2
                while step >= n1:
                    cre = cre + pltpu.roll(cre, shift=step, axis=1)
                    cim = cim + pltpu.roll(cim, shift=step, axis=1)
                    step //= 2
                accQ[p, a] = accQ[p, a] + jnp.sqrt(cre * cre + cim * cim)
                accC[p, 0, a] = jnp.zeros((n2, g * n1), jnp.float32)
                accC[p, 1, a] = jnp.zeros((n2, g * n1), jnp.float32)
            return 0
        jax.lax.fori_loop(0, P, fold, 0)

    @pl.when(b == nb - 1)
    def _finalize():
        def fin(p, _):
            _finalize_max(accQ, p, A, n1, n2, g, n_valid, out_ref)
            return 0
        jax.lax.fori_loop(0, P, fin, 0)


@functools.partial(jax.jit,
                   static_argnames=("n1", "n2", "bt", "m_coh", "n_valid",
                                    "interpret"))
def corr_surface_coh(f, code_f, cosang, sinang, sec_mat,
                     n1: int, n2: int, bt: int, m_coh: int,
                     n_valid: int = 0, interpret: bool = False):
    """Coherent correlation search for one doppler chunk.

    f        : split bf16 [DC, B, W] forward spectra, permuted order for
               (n1, n2) (ops/fft.fft_two_level_perm); B % bt == 0 and
               B % m_coh == 0
    code_f   : split bf16 [P, W] code spectra, same order
    cosang   : f32 [DC, B] per-(doppler, block) residual-rotation cos
    sinang   : f32 [DC, B] ... sin
    sec_mat  : f32 [A, B] overlay sign of alignment a at block m,
               i.e. sec[(a + m) mod N]
    n_valid  : v2p padded-lag masking (pallas_acquire2.plan_padded)
    Returns (peak [P, DC], code idx [P, DC] i32 — natural order, jrep
    space when n_valid — and align [P, DC] i32).
    """
    from gnss_dsp_tpu.ops.pallas_track import env_interpret

    interpret = interpret or env_interpret()
    fr, fi = f
    cr, ci = code_f
    P = cr.shape[0]
    DC, B, W = fr.shape
    A = sec_mat.shape[0]
    g = pick_g(n1)
    assert n1 * n2 == W and B % bt == 0 and bt % g == 0
    assert B % m_coh == 0 and m_coh % bt == 0, (B, m_coh, bt)
    nb = B // bt
    from gnss_dsp_tpu.ops.pallas_acquire2 import _mats2

    w1, w2, tw = _mats2(W)
    mats = [jnp.asarray(a) for grp in (w1, w2, tw) for a in grp]

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda d, b, *_: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    def v4(a, lead):
        return a.reshape(lead + (n1, n2))

    out = pl.pallas_call(
        functools.partial(_kernel, nb=nb, P=P, A=A, n1=n1, n2=n2, g=g,
                          bt=bt, m_coh=m_coh, n_valid=n_valid),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(DC, nb),
            in_specs=[
                pl.BlockSpec((1, bt, n1, n2), lambda d, b, *_: (d, b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bt, n1, n2), lambda d, b, *_: (d, b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, n1, n2), lambda d, b, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, n1, n2), lambda d, b, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [const_spec(m) for m in mats],
            out_specs=pl.BlockSpec((1, P, 128), lambda d, b, *_: (d, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((P, 2, A, n2, g * n1), jnp.float32),
                pltpu.VMEM((P, A, n2, g * n1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((DC, P, 128), jnp.float32),
        interpret=interpret,
    )(cosang, sinang, sec_mat,
      v4(fr, (DC, B)), v4(fi, (DC, B)), v4(cr, (P,)), v4(ci, (P,)), *mats)

    peak = jnp.transpose(out[:, :, 0])                # [P, DC]
    idx = jnp.transpose(out[:, :, 1]).astype(jnp.int32)
    al = jnp.transpose(out[:, :, 2]).astype(jnp.int32)
    return peak, idx, al
