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

# device-resident permuted bf16 code spectra, LRU-capped (~8 MB per
# 32-PRN W=65536 entry): repeated coherent calls on the same signal
# (multi-epoch receivers, the one-shot CLI's 2nd+ invocation in a
# process, sensitivity sweeps) skip the host-side FFT build AND the
# code upload — the dominant one-shot cost over the ~14 MB/s tunnel.
_CODE_SPECTRA_CACHE: "dict[tuple, tuple]" = {}
_CODE_SPECTRA_CAP = 4


def _device_code_spectra(sig, prns: tuple, n: int, window_t: int,
                         n1: int, n2: int):
    import ml_dtypes

    from gnss_dsp_tpu.ops.pallas_acquire2 import permute_host2

    key = (sig.name, prns, n, window_t, n1, n2)
    hit = _CODE_SPECTRA_CACHE.pop(key, None)
    if hit is None:
        cf_host = permute_host2(
            _eng.build_code_ffts(sig, prns, n, window_t), n1, n2)
        # bf16 cast on the HOST: halves the code-spectra upload
        hit = (jnp.asarray(cf_host.real.astype(ml_dtypes.bfloat16)),
               jnp.asarray(cf_host.imag.astype(ml_dtypes.bfloat16)))
    _CODE_SPECTRA_CACHE[key] = hit              # re-insert = MRU
    while len(_CODE_SPECTRA_CACHE) > _CODE_SPECTRA_CAP:
        _CODE_SPECTRA_CACHE.pop(next(iter(_CODE_SPECTRA_CACHE)))
    return hit


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

    sec_mat: f32 [NS, A, B] = sec[(a + m) mod N] at GLOBAL block index m
    (identical to the XLA engine's per-group pattern when m_coh == N);
    NS == 1 shares one overlay across PRNs, NS == P carries per-PRN
    overlays (spec mode with pc == 1 only).
    Returns (metric [P], code_idx [P], dop_idx [P], align [P]).
    """
    from gnss_dsp_tpu.acquire.engine import _mix_fft_perm
    from gnss_dsp_tpu.ops.pallas_acquire_coh import (
        corr_surface_coh, corr_surface_coh_spec)

    P = code_f_perm[0].shape[0]
    Dp = dopp_fixed.shape[0]
    n_chunks = Dp // dop_chunk
    G = blocks // m_coh
    A = sec_mat.shape[1]
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
            # exactly the non-coherent kernel's per-row work.  sec_mat
            # is [NS, A, B]: NS == 1 shares one overlay across PRNs
            # (NH/CS shared secondaries); NS == P gives each PRN its
            # own (CS100-class per-PRN secondaries, round 5) — the
            # combine then runs per PRN inside the chunk loop (pc == 1)
            # while the shared data FFT above is computed once.
            bf = jnp.bfloat16
            Fg = (F[0].reshape(dop_chunk, G, m_coh, window),
                  F[1].reshape(dop_chunk, G, m_coh, window))

            def es(a, b):
                return jnp.einsum("dagm,dgmw->dgaw", a, b,
                                  preferred_element_type=jnp.float32)

            def combine(sm):
                wre = (sm[None] * cosang[:, None, :]).astype(bf)
                wim = (-sm[None] * sinang[:, None, :]).astype(bf)
                wg = (wre.reshape(dop_chunk, A, G, m_coh),
                      wim.reshape(dop_chunk, A, G, m_coh))
                return ((es(wg[0], Fg[0]) - es(wg[1], Fg[1])).astype(bf),
                        (es(wg[0], Fg[1]) + es(wg[1], Fg[0])).astype(bf))

            # CS100-class combine via FFT over the overlay axis (round
            # 5): when A == m_coh == N, Fa[d,g,a] = sum_m s[(a+m) mod N]
            # * (rot*F)[d,g,m] is a CIRCULAR CORRELATION in the overlay
            # index — IFFT_N(conj(FFT_N(rot*F)) * FFT_N(s)).  The heavy
            # FFT_N(rot*F) is computed ONCE and shared across PRNs
            # (per-PRN secondaries only change the tiny FFT_N(s)),
            # cutting the per-PRN combine from O(A*M) to O(N) MACs per
            # cell — ~10x at N = 100.  Falls back to the einsum for
            # small N where the matmul is cheaper than the FFT plumbing.
            fft_combine = (A == m_coh) and A >= 25
            if fft_combine:
                # sec_mat[ns, a, 0] = s[(a+0) mod N] = the raw chips
                sec_chips = sec_mat[:, :, 0]
                rot = (cosang - 1j * sinang).astype(jnp.complex64)
                y = ((Fg[0].astype(jnp.float32)
                      + 1j * Fg[1].astype(jnp.float32))
                     * rot.reshape(dop_chunk, G, m_coh)[..., None])
                # z[a] = sum_m y[m] s[(m+a) mod N] = IFFT(N*IFFT(y)*S)
                Yc = jnp.fft.ifft(y, axis=2) * np.float32(A)

                def combine_fft(s_chips):
                    S = jnp.fft.fft(s_chips.astype(jnp.complex64))
                    Fa = jnp.fft.ifft(Yc * S[None, None, :, None], axis=2)
                    return (jnp.real(Fa).astype(bf),
                            jnp.imag(Fa).astype(bf))

            if sec_mat.shape[0] == 1:
                Far, Fai = (combine_fft(sec_chips[0]) if fft_combine
                            else combine(sec_mat[0]))
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
                if sec_mat.shape[0] > 1:                  # pc == 1
                    Far, Fai = (combine_fft(sec_chips[i]) if fft_combine
                                else combine(sec_mat[i]))
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
                # blk mode: shared overlay only (per-PRN secondaries
                # take the spec path or the XLA per-PRN loop)
                outs.append(corr_surface_coh(
                    F, cf, cosang, sinang, sec_mat[0],
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
    secs = [np.asarray(sig.secondary(p) if sig.secondary is not None
                       else np.ones(1, np.int8), np.float32)
            for p in prns]
    sec = secs[0]
    # CS100-class signals carry a DIFFERENT secondary per PRN
    # (e5aq.py:13, b2ap Weil-100, e6c ...): each PRN then gets its own
    # overlay in the combine (round 5 — previously prns[0]'s overlay
    # was applied to every searched PRN)
    per_prn = any(s.shape != sec.shape or not np.array_equal(s, sec)
                  for s in secs[1:])
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
    if fast and per_prn and fast[0] != "spec":
        fast = None        # per-PRN overlays need the spec combine
    if engine == "fused" and fast is None:
        raise ValueError(
            "per-PRN overlays need the spec-plan shape" if per_prn else
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

    x = cplx.from_numpy(x_int) if not isinstance(x_int, tuple) else x_int
    if fast:
        mode, window_t, dw, n_valid, n1, n2, bt, pc, ac = fast
        if per_prn:
            pc = 1         # per-PRN combine runs inside the PRN loop
        code_f = _device_code_spectra(sig, tuple(prns), n, window_t,
                                      n1, n2)
        a_i = np.arange(N)[:, None]
        m_i = np.arange(blocks)[None, :]
        pat = (a_i + m_i) % N
        sm = np.stack([s[pat] for s in (secs if per_prn else [sec])]
                      ).astype(np.float32)              # [NS, A, B]
        metric, code_idx, dop_idx, align = grid_search_coherent_fast(
            x, code_f, jnp.asarray(fixed_p), jnp.asarray(valid),
            jnp.asarray(sm), n=n, window=window_t, blocks=blocks,
            m_coh=int(m_coh), dop_chunk=int(dop_chunk),
            n1=n1, n2=n2, bt=bt, pc=pc, n_valid=n_valid,
            data_window=(dw if dw != window_t else 0), mode=mode, ac=ac)
        linear = dw == 2 * n
    else:
        cf_host = _eng.build_code_ffts(sig, prns, n, window)
        cf = cplx.from_numpy(cf_host)
        if per_prn:
            # per-PRN overlays on the XLA path: one call per PRN (the
            # data FFT is re-done per PRN — correctness fallback, the
            # spec fast path is the performant route)
            parts = [grid_search_coherent(
                x, (cf[0][k:k + 1], cf[1][k:k + 1]),
                jnp.asarray(fixed_p), jnp.asarray(valid),
                jnp.asarray(secs[k]), n=n, window=window, blocks=blocks,
                m_coh=int(m_coh), dop_chunk=int(dop_chunk))
                for k in range(len(prns))]
            metric, code_idx, dop_idx, align = (
                jnp.concatenate([p[j] for p in parts]) for j in range(4))
        else:
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


