"""Fused acquisition correlation-surface kernel.

The XLA pipeline materializes the [P, DC, B, W] inverse-transform tensor
(hundreds of MB) several times per doppler chunk — stage copies dominate
the measured cost.  This kernel fuses, per (prn, doppler, block-group):

  prod = codeFFT[p] * conj(F[dc, b])        elementwise, VMEM
  R    = IDFT2(prod)                        two matmul stages + twiddle,
                                            entirely in VMEM
  q[p, dc] += sum_b |R|                     f32 accumulator in VMEM

so the only HBM traffic is reading F (re-read once per PRN) and writing
the final q — roughly an order of magnitude less than the XLA path.

The inverse transform uses the four-step decomposition with the
frequency axis in PERMUTED order p = k1*n2 + k2 (the forward FFT's
natural decimated layout) and emits q with the code-phase axis in order
q_idx = j2*n1 + j1; peak/mean/argmax are permutation-invariant and the
winning index is converted host-side (perm_to_natural_index).  Both
matmul stages contract the LAST axis — zero transposes anywhere.

Stage algebra (j = j1*n2 + j2, k = k1 + n1*k2):
  x[j1 n2 + j2] = 1/n sum_k1 e^{2 pi i j1 k1/n1} t[k1, j2]
                  sum_k2 X[k1, k2] e^{2 pi i j2 k2/n2}
with twiddle t[k1, j2] = e^{2 pi i j2 k1 / n}:
  stage A contracts k2 (last axis of [.., k1, k2]) -> [.., k1, j2]
  stage B contracts k1: realized last-axis too by keeping the data as
  [.., j2-major] via one in-VMEM transpose of the small [k1, j2] tile
  per row-group (register shuffles, not HBM).
"""

from __future__ import annotations

import functools
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnss_dsp_tpu.ops.fft import _best_split


def plan2(n: int):
    n1 = _best_split(n)
    n2 = n // n1
    if n1 < 2:
        raise ValueError(f"{n} not two-level factorable")
    return n1, n2


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


@lru_cache(maxsize=16)
def _mats(n: int):
    """Inverse-DFT stage constants in bf16 (numpy), zero-padded so every
    LANE dimension is a 128 multiple (Mosaic rejects unaligned lane
    shapes — measured on the 165x186 / 220x279 splits).  Padded rows are
    zero, so contractions and outputs outside the true planes vanish.

    W1i [n1, n1p], W2i [n2p, n2p], twiddle [n1, n2p] (split re/im; W2
    also carries the Karatsuba sum/diff forms)."""
    n1, n2 = plan2(n)
    n1p, n2p = _pad128(n1), _pad128(n2)
    j1 = np.arange(n1)
    j2 = np.arange(n2)
    w1 = np.zeros((n1, n1p), complex)
    w1[:, :n1] = np.exp(2j * np.pi * np.outer(j1, j1) / n1) / n1
    w2 = np.zeros((n2p, n2p), complex)
    w2[:n2, :n2] = np.exp(2j * np.pi * np.outer(j2, j2) / n2) / n2
    tw = np.zeros((n1, n2p), complex)
    tw[:, :n2] = np.exp(2j * np.pi * np.outer(j1, j2) / n)

    def sp(a):
        import ml_dtypes

        bf = ml_dtypes.bfloat16
        return (a.real.astype(bf), a.imag.astype(bf),
                (a.real + a.imag).astype(bf), (a.imag - a.real).astype(bf))

    return sp(w1), sp(w2), sp(tw)[:2]


def permute_host(c: np.ndarray) -> np.ndarray:
    """Natural spectrum [.., n] -> permuted p = k1*n2 + k2 (for the
    precomputed code FFTs)."""
    n = c.shape[-1]
    n1, n2 = plan2(n)
    return np.ascontiguousarray(
        c.reshape(c.shape[:-1] + (n2, n1)).swapaxes(-1, -2)
    ).reshape(c.shape[:-1] + (n,))


def perm_to_natural_index(q_idx, n: int):
    """Surface position q = j2*n1 + j1 -> time/code index j = j1*n2 + j2."""
    n1, n2 = plan2(n)
    return (q_idx % n1) * n2 + q_idx // n1


def _cmm(x, m, precision=jax.lax.Precision.DEFAULT):
    """Split complex matmul over the last axis, bf16 in, f32 out
    (3-multiplication Karatsuba form)."""
    xr, xi = x
    mr, mi, m_sum, m_diff = m

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=precision)

    m1 = mm((xr + xi).astype(jnp.bfloat16), mr)
    m2 = mm(xi, m_sum)
    m3 = mm(xr, m_diff)
    return (m1 - m2, m1 + m3)


def _kernel(fr_ref, fi_ref, cr_ref, ci_ref,
            w1r_ref, w1i_ref, w1s_ref, w1d_ref,
            w2r_ref, w2i_ref, w2s_ref, w2d_ref,
            twr_ref, twi_ref,
            out_ref, acc, *, n1, n2, bt, nb):
    # all refs use lane-padded planes: n2p lanes for F/code/twiddle/W2,
    # n1p output lanes for W1/out
    w1r = w1r_ref[:, :]
    w1i = w1i_ref[:, :]
    w2 = (w2r_ref[:, :], w2i_ref[:, :], w2s_ref[:, :], w2d_ref[:, :])
    twr = twr_ref[:, :]
    twi = twi_ref[:, :]
    b = pl.program_id(2)

    n1p, n2p = w1r_ref.shape[1], w2r_ref.shape[0]

    @pl.when(b == 0)
    def _():
        acc[:, :] = jnp.zeros((n2p, n1p), jnp.float32)



    # prod = C * conj(F)  (bf16 elementwise).  F arrives as [bt, n1, n2]
    # — the W->(n1, n2) split happens in the host-side HBM view because
    # Mosaic cannot re-split the lane dimension in-kernel.
    fr = fr_ref[0, :, :, :]
    fi = fi_ref[0, :, :, :]
    cr = cr_ref[0, :, :]
    ci = ci_ref[0, :, :]
    pr = cr[None, :, :] * fr + ci[None, :, :] * fi
    pi = ci[None, :, :] * fr - cr[None, :, :] * fi

    # stage A: contract k2 (last axis) as a 3D x 2D dot — no reshapes
    # (Mosaic rejects merges that touch unaligned lane layouts)
    ar, ai = _cmm((pr, pi), w2)
    # twiddle t[k1, j2]
    twrf = twr.astype(jnp.float32)
    twif = twi.astype(jnp.float32)
    ar2 = (ar * twrf[None, :, :] - ai * twif[None, :, :]).astype(jnp.bfloat16)
    ai2 = (ar * twif[None, :, :] + ai * twrf[None, :, :]).astype(jnp.bfloat16)

    # stage B: contract k1 (middle axis) -> [bt, j2, j1]; a middle-axis
    # dot_general avoids the in-kernel transpose, which Mosaic rejects
    # for non-tile-aligned (n1, n2)
    dn = (((1,), (0,)), ((), ()))

    def dg(a, m):
        return jax.lax.dot_general(a, m, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)

    xr = dg(ar2, w1r) - dg(ai2, w1i)
    xi2 = dg(ar2, w1i) + dg(ai2, w1r)
    mag = jnp.sqrt(xr * xr + xi2 * xi2)           # [bt, j2, j1]
    acc[:, :] = acc[:, :] + jnp.sum(mag, axis=0)

    @pl.when(b == nb - 1)
    def _():
        out_ref[0, 0, :, :] = acc[:, :]


@functools.partial(
    jax.jit, static_argnames=("n1", "n2", "bt", "interpret"),
)
def corr_surface(f, code_f, n1: int, n2: int, bt: int,
                 interpret: bool = False):
    """q [P, DC, W] non-coherent surface (code axis PERMUTED: j2*n1+j1).

    f      : split bf16 [DC, B, W] forward spectra of the data windows,
             PERMUTED order (k1*n2+k2), B % bt == 0
    code_f : split bf16 [P, W] code spectra, PERMUTED order
    """
    fr, fi = f
    cr, ci = code_f
    P = cr.shape[0]
    DC, B, W = fr.shape
    grid = (P, DC, B // bt)
    w1, w2, tw = _mats(W)
    mats = [jnp.asarray(a) for pair in (w1, w2, tw) for a in pair]
    assert len(mats) == 10, len(mats)

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda p, d, b: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    # host-side 4D views (the W -> (n1, n2) lane split is free here),
    # lane-padded to 128 multiples for Mosaic
    n1p = _pad128(n1)
    n2p = _pad128(n2)
    pad_l = n2p - n2

    def v4(a, P0):
        a = a.reshape(P0 + (n1, n2))
        if pad_l:
            a = jnp.pad(a, [(0, 0)] * len(P0) + [(0, 0), (0, pad_l)])
        return a

    fr4 = v4(fr, (DC, B))
    fi4 = v4(fi, (DC, B))
    cr3 = v4(cr, (P,))
    ci3 = v4(ci, (P,))

    q = pl.pallas_call(
        functools.partial(_kernel, n1=n1, n2=n2, bt=bt, nb=B // bt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bt, n1, n2p), lambda p, d, b: (d, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, n1, n2p), lambda p, d, b: (d, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, n2p), lambda p, d, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, n2p), lambda p, d, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [const_spec(m) for m in mats],
        out_specs=pl.BlockSpec((1, 1, n2p, n1p), lambda p, d, b: (p, d, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, DC, n2p, n1p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n2p, n1p), jnp.float32)],
        interpret=interpret,
    )(fr4, fi4, cr3, ci3, *mats)
    return q[:, :, :n2, :n1].reshape(P, DC, W)
