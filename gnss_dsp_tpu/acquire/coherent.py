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
                                   "dop_chunk", "n1", "n2", "bt", "pc",
                                   "n_valid", "data_window", "mode", "ac"))
def grid_search_coherent_fast(x, code_f_perm, dopp_fixed, dopp_valid,
                              sec_mat, n: int, window: int, blocks: int,
                              m_coh: int, dop_chunk: int,
                              n1: int, n2: int, bt: int, pc: int,
                              n_valid: int = 0, data_window: int = 0,
                              mode: str = "spec", ac: int = 0):
    """Coherent search on the fused surface kernel
    (ops/pallas_acquire_coh) — same per-(alignment, group) math as
    grid_search_coherent but the per-block complex surfaces and the
    alignment accumulators never leave VMEM.  Geometry is the signal's
    non-coherent search geometry (window = n circular or the 2n
    pad2/v2p route), see the kernel module docstring.

    sec_mat: f32 [A, B] = sec[(a + m) mod N] at GLOBAL block index m
    (identical to the XLA engine's per-group pattern when m_coh == N).
    Returns (metric [P], code_idx [P], dop_idx [P], align [P]).
    """
    from gnss_dsp_tpu.acquire.engine import _mix_fft_perm
    from gnss_dsp_tpu.ops.pallas_acquire_coh import (
        corr_surface_coh, corr_surface_coh_spec)

    P = code_f_perm[0].shape[0]
    Dp = dopp_fixed.shape[0]
    n_chunks = Dp // dop_chunk
    G = blocks // m_coh
    A = sec_mat.shape[0]
    zero_p = jnp.zeros((), jnp.uint32)
    dw = data_window or window
    xb = _eng.block_windows(x, n, dw, blocks)
    if dw != window:
        xb = (jnp.pad(xb[0], ((0, 0), (0, window - dw))),
              jnp.pad(xb[1], ((0, 0), (0, window - dw))))
    m_f = jnp.arange(blocks, dtype=jnp.float32)

    def chunk_body(carry, ci):
        best_metric, best_code, best_dop, best_al = carry
        d0 = ci * dop_chunk
        df = jax.lax.dynamic_slice(dopp_fixed, (d0,), (dop_chunk,))
        valid = jax.lax.dynamic_slice(dopp_valid, (d0,), (dop_chunk,))
        w = jax.vmap(lambda f: nco.nco_split(f, zero_p, window))(df)
        F = _mix_fft_perm(xb, w, n1)
        # residual per-block rotation (see grid_search_coherent)
        blk_cyc = (df.astype(jnp.uint32) * jnp.uint32(n)).astype(
            jnp.float32) * jnp.float32(1.0 / 2**32)          # [DC]
        ang = (-2.0 * jnp.pi) * blk_cyc[:, None] * m_f[None, :]
        cosang = jnp.cos(ang)
        sinang = jnp.sin(ang)

        if mode == "spec":
            # coherent combine in SPECTRAL space (the IDFT is linear in
            # F): Fa[d, g, a] = sum_m conj(w[a, m]) F[d, g*M + m] — a
            # small memory-bound einsum, after which the kernel does
            # exactly the non-coherent kernel's per-row work
            bf = jnp.bfloat16
            wre = (sec_mat[None] * cosang[:, None, :]).astype(bf)
            wim = (-sec_mat[None] * sinang[:, None, :]).astype(bf)
            wg = (wre.reshape(dop_chunk, A, G, m_coh),
                  wim.reshape(dop_chunk, A, G, m_coh))
            Fg = (F[0].reshape(dop_chunk, G, m_coh, window),
                  F[1].reshape(dop_chunk, G, m_coh, window))

            def es(a, b):
                return jnp.einsum("dagm,dgmw->dgaw", a, b,
                                  preferred_element_type=jnp.float32)

            Far = (es(wg[0], Fg[0]) - es(wg[1], Fg[1])).astype(bf)
            Fai = (es(wg[0], Fg[1]) + es(wg[1], Fg[0])).astype(bf)
            # alignment chunks (plan_coh_spec.ac): when all A alignment
            # surfaces don't fit VMEM, run ceil(A/ac) passes over
            # (wrapped) alignment subsets and fold the max; wrapped pad
            # ids duplicate early alignments — ties resolve to the
            # first pass, and reported ids stay real
            acs = ac or A
            a_chunks = []
            for a0 in range(0, A, acs):
                ids = [(a0 + r) % A for r in range(acs)]
                a_chunks.append((a0, jnp.asarray(ids, jnp.int32)))

        outs = []
        for i in range(0, P, pc):
            cf = (code_f_perm[0][i:i + pc], code_f_perm[1][i:i + pc])
            if mode == "spec":
                parts = []
                for a0, ids in a_chunks:
                    if len(a_chunks) == 1:
                        # single pass covers all alignments: no gather
                        F2 = (Far.reshape(dop_chunk, G * acs, window),
                              Fai.reshape(dop_chunk, G * acs, window))
                    else:
                        F2 = (jnp.take(Far, ids, axis=2
                                       ).reshape(dop_chunk, G * acs,
                                                 window),
                              jnp.take(Fai, ids, axis=2
                                       ).reshape(dop_chunk, G * acs,
                                                 window))
                    pk, cix, al_r = corr_surface_coh_spec(
                        F2, cf, n1=n1, n2=n2, bt=bt, A=acs,
                        n_valid=n_valid)
                    parts.append((pk, cix, jnp.take(ids, al_r)))
                pk, cix, al_r = parts[0]
                for pk2, ci2, al2 in parts[1:]:
                    upd = pk2 > pk
                    pk = jnp.where(upd, pk2, pk)
                    cix = jnp.where(upd, ci2, cix)
                    al_r = jnp.where(upd, al2, al_r)
                outs.append((pk, cix, al_r))
            else:
                outs.append(corr_surface_coh(
                    F, cf, cosang, sinang, sec_mat,
                    n1=n1, n2=n2, bt=bt, m_coh=m_coh, n_valid=n_valid))
        if len(outs) == 1:
            peak, code_idx, al = outs[0]
        else:
            peak, code_idx, al = (
                jnp.concatenate([o[k] for o in outs], axis=0)
                for k in range(3))

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


def _coh_fast_plan(sig, n: int, m_coh: int, A: int, P: int,
                   blocks: int = 0):
    """Fast-path geometry for acquire_signal_coherent: the signal's
    non-coherent search window (n circular, 2n pad2/sliding, or the v2p
    padded-lag route) with a coherent-kernel plan, or None (XLA path).
    The spectral-combine kernel (mode "spec") is preferred; the
    per-block kernel ("blk") covers lane-packed (g > 1) splits.
    Returns (mode, window_t, data_window, n_valid, n1, n2, bt, pc)."""
    import os

    if os.environ.get("GNSS_DSP_NO_PALLAS"):
        return None
    if jax.default_backend() == "cpu" and not os.environ.get(
            "GNSS_DSP_PALLAS_INTERPRET"):
        return None
    from gnss_dsp_tpu.ops import pallas_acquire_coh as pac
    from gnss_dsp_tpu.ops import pallas_acquire2 as pa2

    G = max(blocks, m_coh) // m_coh
    dw = 2 * n if (sig.acq_pad2 or sig.acq_sliding) else n

    def plan_at(window, n_valid):
        p = pac.plan_coh_spec(window, G, A, P)
        if p is not None:
            return ("spec", window, dw, n_valid) + p
        p = pac.plan_coh(window, m_coh, A, P)
        if p is not None:
            return ("blk", window, dw, n_valid) + p + (0,)
        return None

    r = plan_at(dw, 0)
    if r is not None:
        return r
    if sig.acq_pad2 or sig.acq_sliding:
        try:
            _, _, wf = pa2.plan_padded(dw)
        except ValueError:
            return None
        return plan_at(wf, n)
    return None


def acquire_signal_coherent(sig, x_int, prns, doppler_search,
                            m_coh: int | None = None, ms: int | None = None,
                            dop_chunk: int | None = None,
                            engine: str = "auto", chan: int = 0):
    """Secondary-wiped extended-coherent acquisition of `sig`.

    m_coh defaults to the full secondary length (NH10 -> 10 ms, NH20 ->
    20 ms, CS25 -> 25 ms ...); ms defaults to one coherent group.
    Signals without a secondary get an all-ones overlay (plain extended
    coherent, alignment-free).  Returns list[engine.AcqResult].

    engine: "auto" rides the fused coherent surface kernel
    (ops/pallas_acquire_coh, ~25x the XLA path) when the shape fits —
    pad2/sliding signals then search 2n LINEAR windows, which removes
    the circular form's overlay-straddle loss (each block's correlation
    at lag j covers exactly one full code period = one overlay chip);
    "xla" forces the einsum path (always-circular window = n).
    """
    n = int(round(sig.acq_fs * sig.acq_coherent_ms / 1000.0))
    sec = (sig.secondary(prns[0]) if sig.secondary is not None
           else np.ones(1, np.int8))
    sec = np.asarray(sec, np.float32)
    if m_coh is None:
        m_coh = len(sec)
    if ms is None:
        ms = int(m_coh * sig.acq_coherent_ms)
    blocks = int(ms / sig.acq_coherent_ms)
    blocks = max(blocks // m_coh, 1) * m_coh
    N = len(sec)

    # the fused engine builds sec_mat at GLOBAL block index while the
    # XLA engine applies the overlay per-group with a LOCAL index; the
    # two agree iff m_coh % N == 0 (incl. the default m_coh == N and the
    # overlay-free N == 1 case) — otherwise fall back to XLA
    fast = (_coh_fast_plan(sig, n, int(m_coh), N, len(prns), blocks)
            if engine in ("auto", "fused") and m_coh % N == 0 else None)
    if engine == "fused" and fast is None:
        raise ValueError(
            "no fused coherent plan for this shape" if m_coh % N == 0 else
            f"fused engine needs m_coh % overlay_len == 0 "
            f"(m_coh={m_coh}, overlay={N})")
    window = fast[1] if fast else n     # XLA path: circular, no pad

    dops, fixed = _eng.doppler_grid(sig, doppler_search, chan)
    if dop_chunk is None:
        if fast:
            # fast path materializes [DC, B, W] bf16 spectra, and in
            # spec mode also the Far/Fai intermediates [DC, G, A, W] —
            # budget whichever is larger per doppler cell
            cells = blocks
            if fast[0] == "spec":
                cells = max(blocks, (blocks // int(m_coh)) * N)
            dop_chunk = min(len(dops), max(
                1, 256 * 2**20 // (cells * window * 4)))
        else:
            dop_chunk = min(len(dops), max(
                1, 64 * 2**20 // (len(prns) * blocks * window * 8)))
    Dp = -(-len(fixed) // dop_chunk) * dop_chunk
    fixed_p = np.zeros(Dp, np.int32)
    fixed_p[: len(fixed)] = fixed
    valid = np.zeros(Dp, bool)
    valid[: len(fixed)] = True

    cf_host = _eng.build_code_ffts(sig, prns, n, window)
    x = cplx.from_numpy(x_int) if not isinstance(x_int, tuple) else x_int
    if fast:
        from gnss_dsp_tpu.ops.pallas_acquire2 import permute_host2

        import ml_dtypes

        mode, window_t, dw, n_valid, n1, n2, bt, pc, ac = fast
        cf_host = permute_host2(cf_host, n1, n2)
        # bf16 cast on the HOST: halves the code-spectra upload (the
        # dominant one-shot cost over the ~14 MB/s axon tunnel)
        code_f = (jnp.asarray(cf_host.real.astype(ml_dtypes.bfloat16)),
                  jnp.asarray(cf_host.imag.astype(ml_dtypes.bfloat16)))
        a_i = np.arange(N)[:, None]
        m_i = np.arange(blocks)[None, :]
        sec_mat = sec[(a_i + m_i) % N].astype(np.float32)
        metric, code_idx, dop_idx, align = grid_search_coherent_fast(
            x, code_f, jnp.asarray(fixed_p), jnp.asarray(valid),
            jnp.asarray(sec_mat), n=n, window=window_t, blocks=blocks,
            m_coh=int(m_coh), dop_chunk=int(dop_chunk),
            n1=n1, n2=n2, bt=bt, pc=pc, n_valid=n_valid,
            data_window=(dw if dw != window_t else 0), mode=mode, ac=ac)
        linear = dw == 2 * n
    else:
        cf = cplx.from_numpy(cf_host)
        metric, code_idx, dop_idx, align = grid_search_coherent(
            x, cf, jnp.asarray(fixed_p), jnp.asarray(valid),
            jnp.asarray(sec), n=n, window=window, blocks=blocks,
            m_coh=int(m_coh), dop_chunk=int(dop_chunk))
        linear = False
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
            align=int(align[i]), n_overlay=len(sec), linear=linear))
    return out


@dataclass
class CoherentAcqResult(_eng.AcqResult):
    """AcqResult + the winning overlay alignment: acquisition block m
    correlated best with overlay chip (align + m) mod n_overlay.
    linear=True marks the fused engine's 2n-window route, where block
    m's winning correlation covers exactly the m-th full code period
    after the first code boundary (no straddle): align names the FIRST
    full period — the very period the track driver starts on —
    unconditionally."""
    align: int = 0
    n_overlay: int = 1
    linear: bool = False

    def track_overlay_phase(self, code_length: int) -> int:
        """Overlay chip index of the FIRST code period the track driver
        will process (TrackChannel.overlay_phase).  The driver discards
        samples up to the first code boundary (track-gps-l1.py:141-143),
        i.e. starts at capture period 1.  Linear (2n-window) engine:
        block 0's winning window IS the first full period, so align
        names the tracker's first period directly.  Circular engine:
        acquisition block 0 is DOMINATED by period 0 when the boundary
        falls in its second half (code_offset <= L/2) — then align
        names period 0's chip and period 1 carries align+1; otherwise
        block 0 is mostly period 1 and align already names it."""
        if self.linear:
            a = self.align
        else:
            a = self.align + (
                1 if self.code_offset <= code_length / 2 else 0)
        return a % self.n_overlay


