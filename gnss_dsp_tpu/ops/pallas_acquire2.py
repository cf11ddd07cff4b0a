"""Fused acquisition surface kernel, v2: lane-aligned splits, PRN-resident
grid, block-diagonal stage B, optional in-kernel peak reduction.

The v1 kernel (ops/pallas_acquire.py) uses the balanced split n1 ~= n2
~= sqrt(W) padded to 128-lane multiples; for GPS L1 (W = 4096 -> 64 x 64
-> padded 128 x 128) that wastes 75% of every MXU tile.  Measured on the
real chip the deeper problem is structural: a grid point per (PRN,
doppler, block-group) costs ~6-10 us of fixed per-step overhead and the
small stage-B contraction (k1 = 32) lowers to heavily padded matmuls.

This kernel requires n2 % 128 == 0 and n1 a divisor or multiple of 128,
and restructures the whole surface build:

  * grid = (DC, nb) ONLY - the PRN sweep is a fori_loop INSIDE the
    kernel over a VMEM-resident code bank [P, n1, n2], so the per-step
    overhead is paid ~P x less often and the F tile is read from HBM
    exactly once per grid.
  * stage A   a[bt, k1, j2]  = (code * conj(F)) @ W2   (contract k2 =
    lanes, one [bt*n1, n2] x [n2, n2] Karatsuba matmul)
  * twiddle   f32, then an f32 swapaxes to [bt/g, j2, g*k1]: g = 128/n1
    consecutive blocks are packed along lanes so stage B's contraction
    is a full 128 lanes
  * stage B   x = a2 @ blockdiag_g(W1)   ([bt/g*n2, 128] x [128, 128])
  * |x| accumulates into a per-PRN accumulator bank acc[P, n2, g*n1];
    the g block-groups stay separate until the final step folds them.

At the last block step each PRN's surface is finalized once:
  reduce=True  -> out[d, p, 0:3] = (max, natural argmax index, sum) -
                  the full [P, DC, W] surface never touches HBM and the
                  XLA peak/mean/argmax pass disappears.
  reduce=False -> out[d, p] = the [n1, n2] surface in NATURAL order
                  (flat j1*n2 + j2), for the sharded path's cross-shard
                  psum (parallel/acquire.py) and for tests.

Input F/code spectra are in the forward-FFT's permuted order k1*n2 + k2
(ops/fft.fft_two_level_perm(n1=...)).  Total scale is exactly 1/W (true
inverse DFT), matching the XLA ops/fft.ifft path: CLI metrics are
identical between engines up to bf16 rounding.

Replaces the per-sample python loops of the reference's acquisition
searches (acquire-gps-l1.py:26-39) at the correlation-surface level.
"""

from __future__ import annotations

import functools
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_N1 = 512          # largest stage-B DFT matrix
MATS_BUDGET = 4.0e6   # bytes of VMEM for the constant DFT matrices
                      # (4 MB admits gps-l2cm's 163840 = 256 x 640 split;
                      # no smaller window's minimum-cost split changes)


def _n1_ok(n1: int) -> bool:
    return (128 % n1 == 0) if n1 <= 128 else (n1 % 128 == 0)


def plan_aligned(n: int):
    """Pick (n1, n2) with n2 % 128 == 0 and n1 = n/n2 a divisor or
    multiple of 128 (so stage B's packed lanes are exactly full),
    minimizing total MXU work ~ 6*(n1 + n2) per cell within the VMEM
    budget for the constant matrices.  Raises ValueError when no such
    split exists (30690/61380 family -> caller falls back to v1)."""
    best = None
    n2 = 128
    while n2 * 2 <= n:
        if n % n2 == 0:
            n1 = n // n2
            mats = 6 * (n1 * n1 + n2 * n2) + 4 * n1 * n2
            if 2 <= n1 <= MAX_N1 and _n1_ok(n1) and mats <= MATS_BUDGET:
                cost = n1 + n2
                if best is None or cost < best[0]:
                    best = (cost, n1, n2)
        n2 += 128
    if best is None:
        raise ValueError(f"{n} has no 128-aligned two-level split")
    return best[1], best[2]


def plan_padded(window: int, max_pad: int = 16384):
    """Smallest W' >= window with an aligned split, for the zero-padded
    route (30690/61380 family: W = 2^2*3^2*5*11*31 has no 128 factor).

    Valid ONLY for pad2-style searches (code in the first half of the
    window, raw-peak metric).  The kernel's surface is s[j] = sum_m
    code[m] x*[(m-j) mod W']; at j = (W'-jhat) mod W' with jhat < n_code
    the reads cover [jhat, jhat+n_code) - entirely inside the 2n real
    samples, zero wrap - so the cell is the EXACT linear correlation at
    code lag jhat (the lag the reference reports,
    acquire-gps-l5i.py:36-39).  The in-kernel reduction searches only
    those W'-jhat indices and returns argmax directly in jhat space;
    all other lags read the zero padding mid-window and are masked."""
    wf = -(-window // 128) * 128
    while wf <= window + max_pad:
        try:
            n1, n2 = plan_aligned(wf)
            return n1, n2, wf
        except ValueError:
            wf += 128
    raise ValueError(f"no aligned split within {max_pad} of {window}")


def pick_g(n1: int) -> int:
    return 128 // n1 if n1 < 128 else 1


def pick_bt(window: int, blocks: int) -> int:
    """Block-group size: F tiles (double-buffered) + ~6 live [bt, W] f32
    intermediates inside the PRN loop, kept under ~6 MB; among fitting
    sizes, minimize the zero-padded total ceil(B/bt)*bt (padded block
    rows are pure waste), preferring larger groups on ties."""
    g = pick_g(plan_aligned(window)[0])
    cap = max(g, (int(6e6 // (32 * window)) // g) * g)
    if cap >= blocks:
        return -(-blocks // g) * g
    best = None
    for bt in range(cap, 0, -g):
        padded = -(-blocks // bt) * bt
        if best is None or padded < best[0]:
            best = (padded, bt)
    return best[1]


def pick_pc(window: int, P: int) -> int:
    """PRN chunk: accumulator bank [pc, n2, 128] f32 + resident code bank
    [pc, W] bf16 x2 within ~6 MB."""
    n1, n2 = plan_aligned(window)
    return max(1, min(P, int(6e6 // (n2 * 512 + window * 4))))


@lru_cache(maxsize=16)
def _mats2(n: int):
    """Stage constants (numpy bf16): W2 [n2, n2] Karatsuba forms scaled
    1/n2, blockdiag-g W1 [128-lane] forms scaled 1/n1, twiddle [n1, n2]."""
    import ml_dtypes

    bf = ml_dtypes.bfloat16
    n1, n2 = plan_aligned(n)
    g = pick_g(n1)
    j1 = np.arange(n1)
    j2 = np.arange(n2)
    w1 = np.exp(2j * np.pi * np.outer(j1, j1) / n1) / n1
    w2 = np.exp(2j * np.pi * np.outer(j2, j2) / n2) / n2
    tw = np.exp(2j * np.pi * np.outer(j1, j2) / n)
    if g > 1:
        w1 = np.kron(np.eye(g), w1)          # [g*n1, g*n1] block diagonal

    def forms(a):
        return (a.real.astype(bf), (a.real + a.imag).astype(bf),
                (a.imag - a.real).astype(bf))

    return forms(w1), forms(w2), (tw.real.astype(np.float32),
                                  tw.imag.astype(np.float32))


def permute_host2(c: np.ndarray, n1: int, n2: int) -> np.ndarray:
    """Natural spectrum [.., n] -> permuted p = k1*n2 + k2 for this
    kernel's split (k1 in [0, n1))."""
    n = c.shape[-1]
    assert n1 * n2 == n
    return np.ascontiguousarray(
        c.reshape(c.shape[:-1] + (n2, n1)).swapaxes(-1, -2)
    ).reshape(c.shape[:-1] + (n,))


def _kernel(fr_ref, fi_ref, cr_ref, ci_ref,
            w1r_ref, w1s_ref, w1d_ref,
            w2r_ref, w2s_ref, w2d_ref,
            twr_ref, twi_ref,
            out_ref, acc, *, nb, P, n1, n2, g, bt, reduce, n_valid):
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    fr = fr_ref[0]                   # [bt, n1, n2] bf16
    fi = fi_ref[0]
    btg = bt // g
    twr = twr_ref[...]               # [n1, n2] f32
    twi = twi_ref[...]

    def prn_body(p, _):
        cr = cr_ref[p]               # [n1, n2] bf16
        ci = ci_ref[p]

        # prod = C * conj(F)
        pr = cr[None] * fr + ci[None] * fi
        pi = ci[None] * fr - cr[None] * fi

        # stage A: contract k2 (lanes) - one tall Karatsuba matmul
        pr2 = pr.reshape(bt * n1, n2)
        pi2 = pi.reshape(bt * n1, n2)

        def mm(a, m):
            return jnp.dot(a, m, preferred_element_type=jnp.float32)

        m1 = mm((pr2 + pi2).astype(jnp.bfloat16), w2r_ref[...])
        m2 = mm(pi2, w2s_ref[...])
        m3 = mm(pr2, w2d_ref[...])
        ar = (m1 - m2).reshape(bt, n1, n2)   # f32
        ai = (m1 + m3).reshape(bt, n1, n2)

        # twiddle (f32)
        ar2 = ar * twr[None] - ai * twi[None]
        ai2 = ar * twi[None] + ai * twr[None]

        # pack g consecutive blocks along lanes and transpose (f32 -
        # bf16 swapaxes miscompiles on this toolchain), so stage B's
        # contraction k1 is a full 128 lanes
        art = jnp.swapaxes(ar2.reshape(btg, g * n1, n2), 1, 2)
        ait = jnp.swapaxes(ai2.reshape(btg, g * n1, n2), 1, 2)
        art = art.reshape(btg * n2, g * n1).astype(jnp.bfloat16)
        ait = ait.reshape(btg * n2, g * n1).astype(jnp.bfloat16)

        # stage B: block-diagonal W1, [btg*n2, g*n1] @ [g*n1, g*n1]
        k1 = mm((art + ait).astype(jnp.bfloat16), w1r_ref[...])
        k2 = mm(ait, w1s_ref[...])
        k3 = mm(art, w1d_ref[...])
        xr = k1 - k2                         # [btg*n2, g*n1] f32
        xi = k1 + k3

        mag = jnp.sqrt(xr * xr + xi * xi).reshape(btg, n2, g * n1)
        acc[p] = acc[p] + jnp.sum(mag, axis=0)
        return 0

    jax.lax.fori_loop(0, P, prn_body, 0)

    @pl.when(b == nb - 1)
    def _():
        def fin(p, _):
            a = acc[p]                       # [n2, g*n1]
            # fold the g block-groups: binary lane rolls leave the total
            # in lanes [0, n1) (lane-splitting reshapes don't lower)
            step = (g * n1) // 2
            while step >= n1:
                a = a + pltpu.roll(a, shift=step, axis=1)
                step //= 2
            col = jax.lax.broadcasted_iota(jnp.int32, (n2, g * n1), 1)
            # natural flat index j1*n2 + j2 (row = j2, col = j1)
            row_i = jax.lax.broadcasted_iota(jnp.int32, (n2, g * n1), 0)
            nat = col * n2 + row_i
            # masking via NESTED wheres — i1-vector `&` miscompiles on
            # this Mosaic toolchain (measured: all-false -> -inf metrics)
            a_m = jnp.where(col < n1, a, -jnp.inf)
            a_s = jnp.where(col < n1, a, 0.0)
            if n_valid:
                # padded-window route (see plan_padded): surface index
                # nat = W' - jhat reads the pure-data window [jhat,
                # jhat+n) and equals the reference's cell at code lag
                # (n - jhat) mod n; so nat in [W'-n, W') covers every
                # lag exactly once, as jrep = nat - (W'-n).  Everything
                # below W'-n reads the mid-window zero padding - masked.
                jrep = nat - (n1 * n2 - n_valid)
                a_m = jnp.where(jrep >= 0, a_m, -jnp.inf)
                a_s = jnp.where(jrep >= 0, a_s, 0.0)
                nat = jrep
            if reduce:
                mx = jnp.max(a_m)
                sm = jnp.sum(a_s)
                # -inf cells can never reach mx, so no live-mask needed
                idx = jnp.min(jnp.where(a_m >= mx, nat, n1 * n2))
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                row = jnp.where(lane == 0, mx, 0.0)
                row = row + jnp.where(lane == 1, idx.astype(jnp.float32), 0.0)
                row = row + jnp.where(lane == 2, sm, 0.0)
                out_ref[0, p] = row[0]
            else:
                at = jnp.swapaxes(a[None], 1, 2)[0]   # [g*n1, n2]
                out_ref[0, p] = at[:n1]               # natural order
            return 0
        jax.lax.fori_loop(0, P, fin, 0)


@functools.partial(jax.jit,
                   static_argnames=("n1", "n2", "bt", "reduce", "n_valid",
                                    "interpret"))
def corr_surface2(f, code_f, n1: int, n2: int, bt: int,
                  reduce: bool = False, n_valid: int = 0,
                  interpret: bool = False):
    """Non-coherent correlation surfaces for one doppler chunk.

    f      : split bf16 [DC, B, W] forward data spectra, permuted order
             k1*n2 + k2 for THIS (n1, n2) split; B % bt == 0
    code_f : split bf16 [P, W] code spectra, same permuted order
    reduce : False -> q [P, DC, W] surfaces, code axis NATURAL order
             True  -> (peak [P, DC], natural argmax [P, DC] i32,
                       sum [P, DC]) - computed in-kernel
    """
    fr, fi = f
    cr, ci = code_f
    P = cr.shape[0]
    DC, B, W = fr.shape
    g = pick_g(n1)
    assert n1 * n2 == W and n2 % 128 == 0 and _n1_ok(n1)
    assert B % bt == 0 and bt % g == 0, (B, bt, g)
    nb = B // bt
    grid = (DC, nb)
    w1, w2, tw = _mats2(W)
    mats = [jnp.asarray(a) for grp in (w1, w2, tw) for a in grp]

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda d, b: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    def v4(a, lead):
        return a.reshape(lead + (n1, n2))

    if reduce:
        out_spec = pl.BlockSpec((1, P, 128), lambda d, b: (d, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((DC, P, 128), jnp.float32)
    else:
        out_spec = pl.BlockSpec((1, P, n1, n2), lambda d, b: (d, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((DC, P, n1, n2), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, nb=nb, P=P, n1=n1, n2=n2, g=g, bt=bt,
                          reduce=reduce, n_valid=n_valid),
        grid=grid,
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
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((P, n2, g * n1), jnp.float32)],
        interpret=interpret,
    )(v4(fr, (DC, B)), v4(fi, (DC, B)), v4(cr, (P,)), v4(ci, (P,)), *mats)

    if reduce:
        peak = jnp.transpose(out[:, :, 0])            # [P, DC]
        idx = jnp.transpose(out[:, :, 1]).astype(jnp.int32)
        sm = jnp.transpose(out[:, :, 2])
        return peak, idx, sm
    return jnp.transpose(out, (1, 0, 2, 3)).reshape(P, DC, W)
