"""Fused extended-coherent acquisition kernel (ops/pallas_acquire_coh)
vs a numpy oracle of the same per-(alignment, group) math, in pallas
interpret mode on the CPU backend."""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from gnss_dsp_tpu.ops import pallas_acquire2 as pa2


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _oracle(x, c, cosang, sinang, sec_mat, m_coh, n_valid=0):
    """Reference coherent search: per (p, d) the per-block complex
    circular correlations R_m = ifft(C conj(F)), rotated and
    overlay-weighted coherent sums per (alignment, group), non-coherent
    over groups, max over alignments -> (peak, idx, align)."""
    P = c.shape[0]
    DC, B, W = x.shape
    A = sec_mat.shape[0]
    G = B // m_coh
    F = np.fft.fft(x, axis=-1)
    C = np.fft.fft(c, axis=-1)
    R = np.fft.ifft(C[:, None, None, :] * np.conj(F)[None], axis=-1)
    rot = cosang + 1j * sinang                       # [DC, B]
    q = np.zeros((P, DC, A, W))
    for a in range(A):
        wgt = sec_mat[a][None, :] * rot              # [DC, B]
        cs = (R * wgt[None, :, :, None]).reshape(P, DC, G, m_coh, W)
        q[:, :, a] = np.abs(cs.sum(axis=3)).sum(axis=2)
    if n_valid:
        # padded-lag route: only nat in [W - n_valid, W) are exact
        # linear lags; reported in jrep = nat - (W - n_valid) space
        q = q[..., W - n_valid:]
    best = q.max(axis=2)                             # [P, DC, W']
    al_of = q.argmax(axis=2)
    peak = best.max(-1)
    idx = best.argmax(-1)
    al = np.take_along_axis(al_of, idx[..., None], 2)[..., 0]
    return peak, idx, al


def _run_kernel(x, c, cosang, sinang, sec_mat, n1, n2, bt, m_coh,
                n_valid=0):
    from gnss_dsp_tpu.ops import cplx, fft as fftm
    from gnss_dsp_tpu.ops.pallas_acquire_coh import corr_surface_coh

    C = np.fft.fft(c, axis=-1)
    Fp = fftm.fft_two_level_perm(cplx.from_numpy(x), bf16=True, n1=n1)
    F16 = (Fp[0].astype(jnp.bfloat16), Fp[1].astype(jnp.bfloat16))
    Cp = pa2.permute_host2(C, n1, n2)
    code_f = (jnp.asarray(Cp.real.astype(np.float32)).astype(jnp.bfloat16),
              jnp.asarray(Cp.imag.astype(np.float32)).astype(jnp.bfloat16))
    return corr_surface_coh(
        F16, code_f, jnp.asarray(cosang.astype(np.float32)),
        jnp.asarray(sinang.astype(np.float32)),
        jnp.asarray(sec_mat.astype(np.float32)),
        n1=n1, n2=n2, bt=bt, m_coh=m_coh, n_valid=n_valid, interpret=True)


def test_coh_kernel_matches_oracle_circular(rng):
    """Circular window with lane-packed block groups (g = 8): planted
    overlay-modulated peak + noise, 2 groups of 8, 4 alignments."""
    W = 2048
    n1, n2 = pa2.plan_aligned(W)
    g = pa2.pick_g(n1)
    assert g == 8, (n1, n2)
    P, DC, B, m_coh, A = 2, 3, 16, 8, 4
    bt = 8                       # bt % g == 0, m_coh % bt == 0

    sec = np.array([1.0, 1.0, -1.0, 1.0])   # no cyclic self-symmetry
    a_true, cp0, d_true = 2, 613, 1
    sec_mat = sec[(np.arange(A)[:, None] + np.arange(B)[None, :]) % A]

    code = rng.choice([-1.0, 1.0], size=(P, W))
    t = np.arange(W)
    x = 0.05 * (rng.standard_normal((DC, B, W))
                + 1j * rng.standard_normal((DC, B, W)))
    # planted: PRN 0, doppler row d_true, overlay chip (a_true + m)
    # per block.  R = ifft(C conj(F)) CONJUGATES the planted per-block
    # phase, so planting rot makes R carry conj(rot) and the oracle /
    # kernel weight w = sec * rot wipes it (engine sign convention).
    ang = rng.uniform(-np.pi, np.pi, size=(DC, B))
    rot = np.cos(ang) + 1j * np.sin(ang)
    for m in range(B):
        x[d_true, m] += (sec_mat[a_true, m] * rot[d_true, m]
                         * code[0][(t - cp0) % W])

    peak, idx, al = _run_kernel(x, code, np.cos(ang), np.sin(ang),
                                sec_mat, n1, n2, bt, m_coh)
    peak_o, idx_o, al_o = _oracle(x, code, np.cos(ang), np.sin(ang),
                                  sec_mat, m_coh)
    np.testing.assert_allclose(np.asarray(peak), peak_o,
                               rtol=0, atol=2e-2 * peak_o.max())
    np.testing.assert_array_equal(np.asarray(idx), idx_o)
    np.testing.assert_array_equal(np.asarray(al), al_o)
    # and the planted cell wins (a DELAY of cp0 peaks at lag W - cp0
    # in this correlation convention)
    assert idx_o[0, d_true] == (W - cp0) % W
    assert al_o[0, d_true] == a_true


def test_coh_kernel_matches_oracle_padded(rng):
    """v2p padded-lag route: data window 2n zero-padded to W', reduction
    masked to the n pure-linear lags, jrep index space."""
    n = 1000
    dw = 2 * n
    n1, n2, W = pa2.plan_padded(dw)
    g = pa2.pick_g(n1)
    P, DC, m_coh, A = 1, 2, 8, 4
    B = 8
    bt = 8
    assert bt % g == 0 and m_coh % bt == 0

    sec = np.array([1.0, 1.0, -1.0, 1.0])   # no cyclic self-symmetry
    sec_mat = sec[(np.arange(A)[:, None] + np.arange(B)[None, :]) % A]
    a_true, cp0 = 1, 317

    code = rng.choice([-1.0, 1.0], size=(P, n))
    c = np.zeros((P, W), complex)
    c[:, :n] = code
    t = np.arange(dw)
    x = np.zeros((DC, B, W), complex)
    x[:, :, :dw] = 0.05 * (rng.standard_normal((DC, B, dw))
                           + 1j * rng.standard_normal((DC, B, dw)))
    ang = rng.uniform(-np.pi, np.pi, size=(DC, B))
    rot = np.cos(ang) + 1j * np.sin(ang)
    for m in range(B):
        x[0, m, :dw] += (sec_mat[a_true, m] * rot[0, m]
                         * code[0][(t - cp0) % n])

    peak, idx, al = _run_kernel(x, c, np.cos(ang), np.sin(ang),
                                sec_mat, n1, n2, bt, m_coh, n_valid=n)
    peak_o, idx_o, al_o = _oracle(x, c, np.cos(ang), np.sin(ang),
                                  sec_mat, m_coh, n_valid=n)
    np.testing.assert_allclose(np.asarray(peak), peak_o,
                               rtol=0, atol=2e-2 * peak_o.max())
    np.testing.assert_array_equal(np.asarray(idx), idx_o)
    np.testing.assert_array_equal(np.asarray(al), al_o)
    # delayed-by-cp0 plant: winning window starts at jhat = cp0, i.e.
    # jrep = n - cp0 (pallas_acquire2.plan_padded lag mapping)
    assert idx_o[0, 0] == n - cp0 and al_o[0, 0] == a_true


def test_coh_spec_kernel_matches_oracle(rng):
    """Spectral-combine kernel (corr_surface_coh_spec) vs the per-block
    oracle: validates the linearity identity IDFT(C conj(sum w_m F_m))
    == sum w_m IDFT(C conj(F_m))... with the conjugated weights, plus
    the kernel's alignment-slot accumulation and max-finalize.
    g == 1 split (W = 16384), 2 groups x 4 alignments."""
    import jax.numpy as jnp
    from gnss_dsp_tpu.ops import cplx, fft as fftm
    from gnss_dsp_tpu.ops.pallas_acquire_coh import corr_surface_coh_spec

    W = 16384
    n1, n2 = pa2.plan_aligned(W)
    assert pa2.pick_g(n1) == 1
    P, DC, m_coh, A = 2, 2, 4, 4
    B, G = 8, 2

    sec = np.array([1.0, 1.0, -1.0, 1.0])
    sec_mat = sec[(np.arange(A)[:, None] + np.arange(B)[None, :]) % A]
    a_true, cp0, d_true = 3, 4000, 1

    code = rng.choice([-1.0, 1.0], size=(P, W))
    t = np.arange(W)
    x = 0.05 * (rng.standard_normal((DC, B, W))
                + 1j * rng.standard_normal((DC, B, W)))
    ang = rng.uniform(-np.pi, np.pi, size=(DC, B))
    rot = np.cos(ang) + 1j * np.sin(ang)
    for m in range(B):
        x[d_true, m] += (sec_mat[a_true, m] * rot[d_true, m]
                         * code[0][(t - cp0) % W])

    # spectral combine exactly as grid_search_coherent_fast mode="spec"
    C = np.fft.fft(code, axis=-1)
    Fp = fftm.fft_two_level_perm(cplx.from_numpy(x), bf16=True, n1=n1)
    F = (np.asarray(Fp[0], np.float32), np.asarray(Fp[1], np.float32))
    wre = (sec_mat[None] * np.cos(ang)[:, None, :])      # conj(w)
    wim = (-sec_mat[None] * np.sin(ang)[:, None, :])
    wg = (wre.reshape(DC, A, G, m_coh), wim.reshape(DC, A, G, m_coh))
    Fg = (F[0].reshape(DC, G, m_coh, W), F[1].reshape(DC, G, m_coh, W))
    Far = (np.einsum("dagm,dgmw->dgaw", wg[0], Fg[0])
           - np.einsum("dagm,dgmw->dgaw", wg[1], Fg[1]))
    Fai = (np.einsum("dagm,dgmw->dgaw", wg[0], Fg[1])
           + np.einsum("dagm,dgmw->dgaw", wg[1], Fg[0]))
    F2 = (jnp.asarray(Far.reshape(DC, G * A, W)).astype(jnp.bfloat16),
          jnp.asarray(Fai.reshape(DC, G * A, W)).astype(jnp.bfloat16))
    Cp = pa2.permute_host2(C, n1, n2)
    code_f = (jnp.asarray(Cp.real.astype(np.float32)).astype(jnp.bfloat16),
              jnp.asarray(Cp.imag.astype(np.float32)).astype(jnp.bfloat16))

    peak, idx, al = corr_surface_coh_spec(
        F2, code_f, n1=n1, n2=n2, bt=4, A=A, interpret=True)
    peak_o, idx_o, al_o = _oracle(x, code, np.cos(ang), np.sin(ang),
                                  sec_mat, m_coh)
    np.testing.assert_allclose(np.asarray(peak), peak_o,
                               rtol=0, atol=3e-2 * peak_o.max())
    np.testing.assert_array_equal(np.asarray(idx), idx_o)
    np.testing.assert_array_equal(np.asarray(al), al_o)
    assert idx_o[0, d_true] == (W - cp0) % W
    assert al_o[0, d_true] == a_true


def test_coh_engine_fast_matches_planted(rng, monkeypatch):
    """End-to-end acquire_signal_coherent on the fused engine (interpret
    mode): B1I NH20 planted capture, code/doppler/alignment recovered;
    matches the XLA engine's result."""
    monkeypatch.setenv("GNSS_DSP_PALLAS_INTERPRET", "1")
    from gnss_dsp_tpu.models import get_signal
    from gnss_dsp_tpu.utils.synth import synth_iq
    from gnss_dsp_tpu.acquire.coherent import (
        _coh_fast_plan, acquire_signal_coherent)

    sig = dataclasses.replace(get_signal("beidou-b1i"), acq_fs=4.096e6)
    prn, doppler, cp0 = 34, 20.0, 500.0
    sec = sig.secondary(prn)
    n = int(sig.acq_fs * 0.046)
    x = synth_iq(sig.code_table((prn,))[0], sig.chip_rate, sig.acq_fs, n,
                 doppler_hz=doppler, code_phase=cp0, cn0_dbhz=None,
                 carrier_ratio=sig.carrier_ratio,
                 data_bits=np.roll(sec, -3),
                 rng=rng)
    grid = (-40.0, 41.0, 20.0)
    assert _coh_fast_plan(sig, 4096, 20, 20, 1) is not None
    r = acquire_signal_coherent(sig, x, [prn], grid, ms=40,
                                engine="fused")[0]
    err = abs(r.code_offset - cp0)
    assert min(err, sig.code_length - err) < 1.0, r
    assert abs(r.doppler - doppler) <= 20.0, r
    rx = acquire_signal_coherent(sig, x, [prn], grid, ms=40,
                                 engine="xla")[0]
    assert abs(r.code_offset - rx.code_offset) < 1.0
    assert r.doppler == rx.doppler
    # the two engines name alignments differently (linear: the first
    # full period; circular: straddle heuristic) but must hand the SAME
    # overlay phase to the tracker — the hardware-validated circular
    # handoff (test_acquire_to_track_overlay_handoff) is the anchor
    L = sig.code_length
    assert (r.track_overlay_phase(L) == rx.track_overlay_phase(L)
            == (3 + 1) % 20), (r, rx)


def test_coh_engine_fast_low_cn0(rng, monkeypatch):
    """The fused engine keeps the sensitivity win at 27 dB-Hz (the XLA
    engine's hardware-validated case, test_coherent_beats_noncoherent):
    bf16 surfaces and the linear 2n windows don't cost the lock."""
    monkeypatch.setenv("GNSS_DSP_PALLAS_INTERPRET", "1")
    from gnss_dsp_tpu.models import get_signal
    from gnss_dsp_tpu.utils.synth import synth_iq
    from gnss_dsp_tpu.acquire.coherent import acquire_signal_coherent

    sig = dataclasses.replace(get_signal("beidou-b1i"), acq_fs=4.096e6)
    prn, doppler, cp0, cn0, ms = 34, 20.0, 500.0, 27.0, 40
    sec = sig.secondary(prn)
    n = int(sig.acq_fs * (ms + 4) / 1000)
    x = synth_iq(sig.code_table((prn,))[0], sig.chip_rate, sig.acq_fs, n,
                 doppler_hz=doppler, code_phase=cp0, cn0_dbhz=cn0,
                 carrier_ratio=sig.carrier_ratio, data_bits=sec,
                 rng=np.random.default_rng(1))
    r = acquire_signal_coherent(sig, x, [prn], (-100.0, 101.0, 25.0),
                                ms=ms, engine="fused")[0]
    err = abs(r.code_offset - cp0)
    assert min(err, sig.code_length - err) < 1.0, r
    assert abs(r.doppler - doppler) <= 25.0, r


def test_coh_per_prn_overlays(rng, monkeypatch):
    """Per-PRN secondaries (CS100-class, e5aq.py:13): each searched PRN
    gets its OWN overlay in the spectral combine (round 5).  Two planted
    PRNs carrying different overlays must both be found at full metric;
    with the pre-round-5 shared-overlay behavior PRN B's coherent sum
    would collapse.  Fused (interpret) and XLA per-PRN paths agree."""
    monkeypatch.setenv("GNSS_DSP_PALLAS_INTERPRET", "1")
    import dataclasses as _dc

    from gnss_dsp_tpu.models import get_signal
    from gnss_dsp_tpu.utils.synth import synth_iq
    from gnss_dsp_tpu.acquire.coherent import acquire_signal_coherent

    base = get_signal("beidou-b1i")
    rngo = np.random.default_rng(3)
    ovls = {p: rngo.choice([-1, 1], 20).astype(np.int8)
            for p in (5, 34)}
    # default acq_fs (8.192 MHz): dw = 16384 has the g == 1 aligned
    # split the spec combine needs (per-PRN overlays are spec-only)
    sig = _dc.replace(base, secondary=lambda p: ovls[p])
    n = int(sig.acq_fs * 0.046)
    x = np.zeros(n, np.complex64)
    plants = {5: (20.0, 500.0), 34: (-20.0, 1200.0)}
    for prn, (dop, cp) in plants.items():
        x += synth_iq(sig.code_table((prn,))[0], sig.chip_rate,
                      sig.acq_fs, n, doppler_hz=dop, code_phase=cp,
                      cn0_dbhz=None, carrier_ratio=sig.carrier_ratio,
                      data_bits=ovls[prn], rng=rng)
    grid = (-40.0, 41.0, 20.0)
    rf = acquire_signal_coherent(sig, x, [5, 34], grid, ms=40,
                                 engine="fused")
    rx = acquire_signal_coherent(sig, x, [5, 34], grid, ms=40,
                                 engine="xla")
    for r, r2 in zip(rf, rx):
        dop, cp = plants[r.prn]
        err = abs(r.code_offset - cp)
        assert min(err, sig.code_length - err) < 1.0, r
        assert abs(r.doppler - dop) <= 20.0, r
        assert abs(r.code_offset - r2.code_offset) < 1.0, (r, r2)
        assert r.doppler == r2.doppler, (r, r2)
        # both engines hand the tracker the same overlay phase
        assert (r.track_overlay_phase(sig.code_length)
                == r2.track_overlay_phase(sig.code_length)), (r, r2)
    # the two metrics are comparable (each PRN integrated with its own
    # overlay); a shared-overlay regression would collapse one of them
    ms_ = sorted(r.metric for r in rf)
    assert ms_[0] > 0.5 * ms_[1], rf


def test_coh_fft_combine_matches_einsum(rng, monkeypatch):
    """The FFT-over-overlay combine (N >= 25, round 5) must agree with
    the einsum combine and the XLA engine: same winner, code phase and
    tracker handoff, on shared AND per-PRN 25-chip overlays."""
    monkeypatch.setenv("GNSS_DSP_PALLAS_INTERPRET", "1")
    import dataclasses as _dc

    from gnss_dsp_tpu.models import get_signal
    from gnss_dsp_tpu.utils.synth import synth_iq
    from gnss_dsp_tpu.acquire import coherent as coh

    base = get_signal("beidou-b1i")
    rngo = np.random.default_rng(9)
    ovls = {p: rngo.choice([-1, 1], 25).astype(np.int8) for p in (5, 34)}
    sig = _dc.replace(base, secondary=lambda p: ovls[p])
    n = int(sig.acq_fs * 0.054)
    x = np.zeros(n, np.complex64)
    plants = {5: (16.0, 500.0), 34: (-16.0, 1200.0)}
    for prn, (dop, cp) in plants.items():
        x += synth_iq(sig.code_table((prn,))[0], sig.chip_rate,
                      sig.acq_fs, n, doppler_hz=dop, code_phase=cp,
                      cn0_dbhz=None, carrier_ratio=sig.carrier_ratio,
                      data_bits=ovls[prn], rng=rng)
    grid = (-32.0, 33.0, 16.0)
    rf = coh.acquire_signal_coherent(sig, x, [5, 34], grid, ms=50,
                                     engine="fused")
    rx = coh.acquire_signal_coherent(sig, x, [5, 34], grid, ms=50,
                                     engine="xla")
    for r, r2 in zip(rf, rx):
        dop, cp = plants[r.prn]
        err = abs(r.code_offset - cp)
        assert min(err, sig.code_length - err) < 1.0, r
        assert abs(r.doppler - dop) <= 16.0, r
        assert abs(r.code_offset - r2.code_offset) < 1.0, (r, r2)
        assert (r.track_overlay_phase(sig.code_length)
                == r2.track_overlay_phase(sig.code_length)), (r, r2)
