"""Extended-coherent acquisition with secondary-code wipeoff.

The reference carries a secondary (overlay) code for every pilot signal
but never consumes one — its acquisition is always 1-code-period coherent
+ non-coherent magnitude sums (acquire-gps-l1.py:30-39), which hits the
squaring loss well above the pilot signals' design sensitivity.  This
engine coherently integrates M consecutive code periods with the overlay
wiped off, trying every cyclic alignment of the secondary (the alignment
is unknown at acquisition):

    q[p, d, w] = max_a  sum_g | sum_m  s[(a+m) mod N] * R[g*M+m] |

where R are the COMPLEX per-block circular correlations (the same
batched FFT pipeline as engine.chunk_q, magnitude deferred), g indexes
non-coherent groups and s is the +-1 secondary.  ~sqrt(M) sensitivity
gain over M non-coherent sums, minus a boundary-straddle loss: block
windows are not code-aligned, so a block whose overlay chip flips
mid-peak loses part of its energy (up to 2*tau/n at code offset tau).
Acquiring deep below the non-coherent floor is still the point — see
tests/test_coherent.py.

Doppler bins must shrink with the coherent span (~1/(M*T_code)); the
caller passes the finer grid.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from gnss_dsp_tpu.ops import cplx, fft, nco
from gnss_dsp_tpu.acquire import engine as _eng


@partial(jax.jit, static_argnames=("n", "window", "blocks", "m_coh",
                                   "dop_chunk"))
def grid_search_coherent(x, code_ffts, dopp_fixed, dopp_valid, sec,
                         n: int, window: int, blocks: int, m_coh: int,
                         dop_chunk: int):
    """Coherent twin of engine.grid_search.

    x          : split-complex [>= blocks*n]
    code_ffts  : split-complex [P, window]
    dopp_fixed : int32 [Dp], Dp % dop_chunk == 0
    dopp_valid : bool [Dp]
    sec        : f32 [N] +-1 secondary chips (N >= m_coh; alignments = N)
    blocks % m_coh == 0; groups = blocks // m_coh.
    Returns (metric [P], code_idx [P], dop_idx [P], align [P]) —
    metric is the raw coherent peak (the peak/mean normalization is
    meaningless across alignment maxima); align is the winning cyclic
    overlay alignment: block m correlated best with sec[(align+m) mod N].
    """
    P = code_ffts[0].shape[0]
    Dp = dopp_fixed.shape[0]
    n_chunks = Dp // dop_chunk
    G = blocks // m_coh
    N = sec.shape[0]
    zero_p = jnp.zeros((), jnp.uint32)
    xb = _eng.block_windows(x, n, window, blocks)

    # s_mat[a, m] = sec[(a + m) mod N] — all cyclic alignments
    a_i = jnp.arange(N)[:, None]
    m_i = jnp.arange(m_coh)[None, :]
    s_mat = sec[(a_i + m_i) % N]                              # [N, M]
    m_f = jnp.arange(m_coh, dtype=jnp.float32)

    def chunk_body(carry, ci):
        best_metric, best_code, best_dop, best_al = carry
        d0 = ci * dop_chunk
        df = jax.lax.dynamic_slice(dopp_fixed, (d0,), (dop_chunk,))
        valid = jax.lax.dynamic_slice(dopp_valid, (d0,), (dop_chunk,))
        w = jax.vmap(lambda f: nco.nco_split(f, zero_p, window))(df)

        F = fft.fft(cplx.cmul(
            (xb[0][None, :, :], xb[1][None, :, :]),
            (w[0][:, None, :], w[1][:, None, :]),
        ), precision=jax.lax.Precision.HIGHEST)               # [DC, B, W]
        prod = cplx.cmul_conj(
            (code_ffts[0][:, None, None, :], code_ffts[1][:, None, None, :]),
            (F[0][None, :, :, :], F[1][None, :, :, :]),
        )
        R = fft.ifft(prod, precision=jax.lax.Precision.HIGHEST)
        Rg = (R[0].reshape(P, dop_chunk, G, m_coh, window),
              R[1].reshape(P, dop_chunk, G, m_coh, window))
        # the per-block doppler wipe restarts its phase at every block
        # start (engine.chunk_q semantics, acquire-gps-l1.py:28-30), so a
        # signal at this bin's frequency carries a CONSTANT residual
        # rotation of n*d/fs cycles per block — fold its conjugate, per
        # doppler, into the overlay weights to make the cross-block sum
        # truly coherent
        blk_cyc = (df.astype(jnp.uint32) * jnp.uint32(n)).astype(
            jnp.float32) * jnp.float32(1.0 / 2**32)           # [DC] cycles
        ang = (-2.0 * jnp.pi) * blk_cyc[:, None] * m_f[None, :]  # [DC, M]
        wre = s_mat[:, None, :] * jnp.cos(ang)[None, :, :]    # [A, DC, M]
        wim = s_mat[:, None, :] * jnp.sin(ang)[None, :, :]
        # coherent overlay-wiped sum per (alignment, group), then
        # non-coherent over groups, then the best alignment
        cre = (jnp.einsum("adm,pdgmw->apdgw", wre, Rg[0])
               - jnp.einsum("adm,pdgmw->apdgw", wim, Rg[1]))
        cim = (jnp.einsum("adm,pdgmw->apdgw", wre, Rg[1])
               + jnp.einsum("adm,pdgmw->apdgw", wim, Rg[0]))
        qa = jnp.sqrt(cre * cre + cim * cim).sum(axis=3)      # [A, P, DC, W]
        a_idx = jnp.argmax(qa, axis=0).astype(jnp.int32)      # [P, DC, W]
        q = qa.max(axis=0)                                    # [P, DC, W]

        peak = jnp.max(q, axis=-1)
        code_idx = jnp.argmax(q, axis=-1).astype(jnp.int32)
        al = jnp.take_along_axis(a_idx, code_idx[:, :, None], 2)[:, :, 0]
        metric = jnp.where(valid[None, :], peak, -jnp.inf)
        ch_best = jnp.argmax(metric, axis=-1)
        ch_metric = jnp.take_along_axis(metric, ch_best[:, None], 1)[:, 0]
        ch_code = jnp.take_along_axis(code_idx, ch_best[:, None], 1)[:, 0]
        ch_al = jnp.take_along_axis(al, ch_best[:, None], 1)[:, 0]
        upd = ch_metric > best_metric
        return (
            jnp.where(upd, ch_metric, best_metric),
            jnp.where(upd, ch_code, best_code),
            jnp.where(upd, (d0 + ch_best).astype(jnp.int32), best_dop),
            jnp.where(upd, ch_al, best_al),
        ), None

    init = (jnp.full((P,), -jnp.inf, jnp.float32),
            jnp.zeros((P,), jnp.int32), jnp.zeros((P,), jnp.int32),
            jnp.zeros((P,), jnp.int32))
    (metric, code_idx, dop_idx, align), _ = jax.lax.scan(
        chunk_body, init, jnp.arange(n_chunks))
    return metric, code_idx, dop_idx, align


def acquire_signal_coherent(sig, x_int, prns, doppler_search,
                            m_coh: int | None = None, ms: int | None = None,
                            dop_chunk: int | None = None):
    """Secondary-wiped extended-coherent acquisition of `sig`.

    m_coh defaults to the full secondary length (NH10 -> 10 ms, NH20 ->
    20 ms, CS25 -> 25 ms ...); ms defaults to one coherent group.
    Signals without a secondary get an all-ones overlay (plain extended
    coherent, alignment-free).  Returns list[engine.AcqResult].
    """
    n = int(round(sig.acq_fs * sig.acq_coherent_ms / 1000.0))
    window = n           # circular, no pad: one period per block
    sec = (sig.secondary(prns[0]) if sig.secondary is not None
           else np.ones(1, np.int8))
    sec = np.asarray(sec, np.float32)
    if m_coh is None:
        m_coh = len(sec)
    if ms is None:
        ms = int(m_coh * sig.acq_coherent_ms)
    blocks = int(ms / sig.acq_coherent_ms)
    blocks = max(blocks // m_coh, 1) * m_coh

    dops, fixed = _eng.doppler_grid(sig, doppler_search)
    if dop_chunk is None:
        dop_chunk = min(len(dops), max(
            1, 64 * 2**20 // (len(prns) * blocks * window * 8)))
    Dp = -(-len(fixed) // dop_chunk) * dop_chunk
    fixed_p = np.zeros(Dp, np.int32)
    fixed_p[: len(fixed)] = fixed
    valid = np.zeros(Dp, bool)
    valid[: len(fixed)] = True

    cf = cplx.from_numpy(_eng.build_code_ffts(sig, prns, n, window))
    x = cplx.from_numpy(x_int) if not isinstance(x_int, tuple) else x_int
    metric, code_idx, dop_idx, align = grid_search_coherent(
        x, cf, jnp.asarray(fixed_p), jnp.asarray(valid), jnp.asarray(sec),
        n=n, window=window, blocks=blocks, m_coh=int(m_coh),
        dop_chunk=int(dop_chunk))
    metric = np.asarray(metric)
    code_idx = np.asarray(code_idx)
    dop_idx = np.asarray(dop_idx)
    align = np.asarray(align)
    out = []
    for i, prn in enumerate(prns):
        code = (sig.code_length * float(code_idx[i]) / n) % sig.code_length
        out.append(CoherentAcqResult(
            prn=prn, doppler=float(dops[dop_idx[i]]),
            metric=float(metric[i]), code_offset=code,
            align=int(align[i]), n_overlay=len(sec)))
    return out


@dataclass
class CoherentAcqResult(_eng.AcqResult):
    """AcqResult + the winning overlay alignment: acquisition block m
    correlated best with overlay chip (align + m) mod n_overlay."""
    align: int = 0
    n_overlay: int = 1

    def track_overlay_phase(self, code_length: int) -> int:
        """Overlay chip index of the FIRST code period the track driver
        will process (TrackChannel.overlay_phase).  The driver discards
        samples up to the first code boundary (track-gps-l1.py:141-143),
        i.e. starts at capture period 1.  Acquisition block 0 is
        DOMINATED by period 0 when the boundary falls in its second half
        (code_offset <= L/2) — then align names period 0's chip and
        period 1 carries align+1; otherwise block 0 is mostly period 1
        and align already names it."""
        a = self.align + (1 if self.code_offset <= code_length / 2 else 0)
        return a % self.n_overlay


