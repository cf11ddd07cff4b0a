"""Pallas fused wipeoff+EPL correlator vs a float64 numpy oracle of the
engine's math (interpret mode; the same kernel compiles natively on TPU)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from gnss_dsp_tpu.ops import pallas_track as ptk


def oracle(x, code, code_p, cf, el, ph0a, dpha, ph0b, dphb, n_valid, sub):
    L = len(code)
    i = np.arange(len(x))
    ia = ((ph0a + i * np.int64(dpha)) % (1 << 32)) >> 22
    ib = ((ph0b + i * np.int64(dphb)) % (1 << 32)) >> 22
    idx = ia + ib
    ang = (idx & 1023) * (2 * np.pi / 1024)
    osc = np.cos(ang) + 1j * np.sin(ang)
    xm = x * osc
    xm[n_valid:] = 0
    out = []
    for lag in (-el, 0.0, el):
        # mirror the kernel's arithmetic: vint/fr split, f32 fractional
        # recurrence (boundary decisions then agree bit-for-bit)
        v = code_p + lag
        vint = np.floor(v)
        fr = np.float32(v - vint)
        cp32 = (fr + i.astype(np.float32) * np.float32(cf)).astype(np.float32)
        cp = vint + cp32.astype(np.float64)
        ci = (vint.astype(np.int64)
              + np.floor(cp32).astype(np.int64)) % L
        chips = code[ci].astype(np.float64)
        if sub != "none":
            bp = np.floor((np.float32(2.0) * cp32).astype(np.float32)
                          ).astype(np.int64) % 2
            boc = 1.0 - 2 * bp
            if sub == "boc11":
                chips = chips * boc
            elif sub == "cboc":
                bp6 = np.floor((np.float32(12.0) * cp32).astype(np.float32)
                               ).astype(np.int64) % 2
                chips = chips * (0.953463 * boc + 0.301511 * (1 - 2 * bp6))
            elif sub == "tmboc":
                bp6 = np.floor((np.float32(12.0) * cp32).astype(np.float32)
                               ).astype(np.int64) % 2
                boc6 = 1.0 - 2 * bp6
                u = (vint.astype(np.int64)
                     + np.floor(cp32).astype(np.int64)) % 33
                slot = np.isin(u, [0, 4, 6, 29]).astype(np.float64)
                chips = chips * (slot * boc6 + (1 - slot) * boc)
            elif sub == "rz_even":
                chips = chips * (1 - bp)
            elif sub == "rz_odd":
                chips = chips * bp
        p = np.sum(xm * chips)
        out.extend([p.real, p.imag])
    return np.array(out)


@pytest.mark.parametrize("sub,stream,v2", [
    ("none", False, False), ("boc11", False, False), ("cboc", False, False),
    ("tmboc", False, False),
    ("rz_even", False, False), ("rz_odd", False, False),
    ("none", True, False), ("boc11", True, False),  # HBM-streamed windows
    ("none", False, True), ("none", True, True),    # v2 factorized kernel
    # v2 16-row per-lag plan (round 4): every subcarrier family
    ("boc11", False, True), ("cboc", False, True), ("tmboc", False, True),
    ("rz_even", False, True), ("rz_odd", False, True), ("boc11", True, True),
])
def test_kernel_matches_oracle(sub, stream, v2, rng):
    fs = 4.096e6
    chip_rate = 1.023e6
    L = 1023
    code = rng.choice([-1, 1], L).astype(np.int8)
    n = 4100
    n_tiles = -(-n // ptk.TILE)
    C = 3
    cf = chip_rate / fs
    W = ptk.chip_window(cf)
    el = 0.25

    # shared chunk; each channel reads at its own (deliberately unaligned)
    # pointer through the kernel's scalar-prefetch block addressing
    nchunk = (n_tiles + 4) * ptk.TILE
    xs = rng.standard_normal(nchunk) + 1j * rng.standard_normal(nchunk)
    code_rows = ptk.extend_code(np.tile(code, (C, 1)), W,
                                int(np.ceil((n_tiles + 1) * ptk.TILE * cf)) + 2)

    si = np.zeros((C, 9), np.int32)
    # 8 lanes: fr_e/p/l, cf, then the runtime subcarrier lanes a0/a1/a6
    # + the round-5 TMBOC slot gate (tm) — the "tmboc" kernel kind reads
    # them (zero coefficients + tm=1 is exactly the static TMBOC blend)
    sf = np.zeros((C, 8), np.float32)
    oracle_out = np.zeros((C, 6))
    for c in range(C):
        code_p = float(rng.uniform(0, L))
        ph0a = int(rng.integers(0, 1 << 32))
        dpha = int(rng.integers(-(1 << 20), 1 << 20))
        ph0b = int(rng.integers(0, 1 << 32))
        dphb = int(rng.integers(-(1 << 20), 1 << 20))
        nv = n - c * 7
        ptr = int(rng.integers(0, 3 * ptk.TILE))

        def as_i32(v):
            return np.int32(v) if v < (1 << 31) else np.int32(v - (1 << 32))

        for k, lag in enumerate((-el, 0.0, el)):
            v = code_p + lag
            si[c, k] = int(np.floor(v))
            sf[c, k] = np.float32(v - np.floor(v))
        si[c, 3] = dpha
        si[c, 4] = nv
        si[c, 5] = as_i32(ph0a)
        si[c, 6] = dphb
        si[c, 7] = as_i32(ph0b)
        si[c, 8] = ptr
        sf[c, 3] = np.float32(cf)
        if sub == "tmboc":
            sf[c, 7] = 1.0
        oracle_out[c] = oracle(xs[ptr:ptr + nv].copy(), code, code_p, cf, el,
                               ph0a, dpha, ph0b, dphb, nv, sub)

    if v2:
        from gnss_dsp_tpu.ops import pallas_track2 as ptk2
        got = np.asarray(ptk2.epl_correlate2(
            jnp.asarray(si), jnp.asarray(sf),
            jnp.asarray(xs.real.astype(np.float32))[None, :],
            jnp.asarray(xs.imag.astype(np.float32))[None, :],
            jnp.asarray(code_rows),
            n_tiles=n_tiles, W=W, sub=sub, stream=stream, interpret=True,
        ))[:, :6]
    else:
        got = np.asarray(ptk.epl_correlate(
            jnp.asarray(si), jnp.asarray(sf),
            jnp.asarray(xs.real.astype(np.float32))[None, :],
            jnp.asarray(xs.imag.astype(np.float32))[None, :],
            jnp.asarray(code_rows),
            n_tiles=n_tiles, W=W, sub=sub, stream=stream,
            interpret=True,
        ))[:, :6]

    scale = np.abs(oracle_out).max()
    np.testing.assert_allclose(got, oracle_out, atol=8e-3 * scale, rtol=2e-2)  # bf16 one-hot/m operands


def test_corr_surface_matches_numpy(rng):
    """Fused acquisition surface kernel (ops/pallas_acquire) vs a numpy
    FFT oracle, interpret mode."""
    import jax.numpy as jnp
    from gnss_dsp_tpu.ops import pallas_acquire as pa
    from gnss_dsp_tpu.ops import fft as fftm, cplx

    W, P, DC, B, bt = 4096, 3, 2, 8, 4
    n1, n2 = pa.plan2(W)
    x = rng.standard_normal((DC, B, W)) + 1j * rng.standard_normal((DC, B, W))
    c = rng.standard_normal((P, W)) + 1j * rng.standard_normal((P, W))

    F_ref = np.fft.fft(x, axis=-1)
    C_ref = np.fft.fft(c, axis=-1)
    R = np.fft.ifft(C_ref[:, None, None, :] * np.conj(F_ref)[None], axis=-1)
    q_want = np.abs(R).sum(axis=2)

    xs = cplx.from_numpy(x)
    Fp = fftm.fft_two_level_perm(xs, bf16=True)
    Cp = pa.permute_host(C_ref)
    code_f = (jnp.asarray(Cp.real.astype(np.float32)).astype(jnp.bfloat16),
              jnp.asarray(Cp.imag.astype(np.float32)).astype(jnp.bfloat16))
    F16 = (Fp[0].astype(jnp.bfloat16), Fp[1].astype(jnp.bfloat16))
    q = np.asarray(pa.corr_surface(F16, code_f, n1=n1, n2=n2, bt=bt,
                                   interpret=True))
    j = pa.perm_to_natural_index(np.arange(W), W)
    q_nat = np.empty_like(q)
    q_nat[..., j] = q
    err = np.abs(q_nat - q_want) / np.abs(q_want).max()
    assert err.max() < 2e-2, err.max()


def test_corr_surface2_matches_numpy(rng):
    """Lane-aligned v2 surface kernel (ops/pallas_acquire2) vs a numpy
    FFT oracle; output is in NATURAL order (no index conversion)."""
    import jax.numpy as jnp
    from gnss_dsp_tpu.ops import pallas_acquire2 as pa2
    from gnss_dsp_tpu.ops import fft as fftm, cplx

    W, P, DC, B, bt = 4096, 3, 2, 8, 4
    n1, n2 = pa2.plan_aligned(W)
    assert n2 % 128 == 0 and n1 * n2 == W
    x = rng.standard_normal((DC, B, W)) + 1j * rng.standard_normal((DC, B, W))
    c = rng.standard_normal((P, W)) + 1j * rng.standard_normal((P, W))

    F_ref = np.fft.fft(x, axis=-1)
    C_ref = np.fft.fft(c, axis=-1)
    R = np.fft.ifft(C_ref[:, None, None, :] * np.conj(F_ref)[None], axis=-1)
    q_want = np.abs(R).sum(axis=2)

    Fp = fftm.fft_two_level_perm(cplx.from_numpy(x), bf16=True, n1=n1)
    F16 = (Fp[0].astype(jnp.bfloat16), Fp[1].astype(jnp.bfloat16))
    Cp = pa2.permute_host2(C_ref, n1, n2)
    code_f = (jnp.asarray(Cp.real.astype(np.float32)).astype(jnp.bfloat16),
              jnp.asarray(Cp.imag.astype(np.float32)).astype(jnp.bfloat16))
    q = np.asarray(pa2.corr_surface2(F16, code_f, n1=n1, n2=n2, bt=bt,
                                     interpret=True))
    err = np.abs(q - q_want) / np.abs(q_want).max()
    assert err.max() < 2e-2, err.max()

    # in-kernel reduction path agrees with the surface
    peak, idx, sm = pa2.corr_surface2(F16, code_f, n1=n1, n2=n2, bt=bt,
                                      reduce=True, interpret=True)
    np.testing.assert_allclose(np.asarray(peak), q.max(-1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), q.argmax(-1))
    np.testing.assert_allclose(np.asarray(sm), q.sum(-1), rtol=1e-4)

    # planted peak lands at the exact natural lag (zero-padded blocks,
    # mirroring the engine's pad-to-bt)
    g = pa2.pick_g(n1)
    shift = 1234
    x2 = np.zeros((1, g, W), complex)
    x2[0, 0] = np.roll(c[0], shift)
    F2 = fftm.fft_two_level_perm(cplx.from_numpy(x2), bf16=True, n1=n1)
    F216 = (F2[0].astype(jnp.bfloat16), F2[1].astype(jnp.bfloat16))
    q2 = np.asarray(pa2.corr_surface2(F216, code_f, n1=n1, n2=n2, bt=g,
                                      interpret=True))
    assert int(np.argmax(q2[0, 0])) == (W - shift) % W


def test_corr_surface2_padded_plan_reduce(rng):
    """v2p route (ops/pallas_acquire2.plan_padded): a pad2-style search
    whose window has no 128-aligned split runs at the padded FFT length
    W' with the in-kernel reduction masked to the n pure-linear lags.
    Asserts (a) the masked reduction equals the numpy circular-W'
    surface restricted to nat in [W'-n, W'), reported in jrep space;
    (b) those cells are EXACT linear correlations; (c) the winning lag
    equals the reference's 2n-circular argmax mod n — the cell
    `acquire-gps-l5i.py:33-37` reports."""
    import jax.numpy as jnp
    from gnss_dsp_tpu.ops import pallas_acquire2 as pa2
    from gnss_dsp_tpu.ops import fft as fftm, cplx

    n = 1000                    # code length in samples (n_valid)
    dw = 2 * n                  # true data extent per block (pad2)
    n1, n2, W = pa2.plan_padded(dw)
    assert W >= dw and n1 * n2 == W and n2 % 128 == 0
    g = pa2.pick_g(n1)
    P, DC, B, bt = 2, 1, 2 * g, g
    cp0 = 317                   # planted code phase (samples)

    code = rng.choice([-1.0, 1.0], size=(P, n))
    c = np.zeros((P, W), complex)
    c[:, :n] = code
    # periodic planted signal (PRN 0 at lag cp0) + noise, 2n real
    # samples per block, zero-padded along lanes to W'
    t = np.arange(dw)
    x = np.zeros((DC, B, W), complex)
    x[0, :, :dw] = (code[0][(t - cp0) % n]
                    + 0.1 * (rng.standard_normal((B, dw))
                             + 1j * rng.standard_normal((B, dw))))

    F_ref = np.fft.fft(x, axis=-1)
    C_ref = np.fft.fft(c, axis=-1)
    R = np.fft.ifft(C_ref[:, None, None, :] * np.conj(F_ref)[None], axis=-1)
    q_full = np.abs(R).sum(axis=2)          # [P, DC, W'] circular oracle
    q_valid = q_full[..., W - n:]           # jrep space: nat = W'-n+jrep

    Fp = fftm.fft_two_level_perm(cplx.from_numpy(x), bf16=True, n1=n1)
    F16 = (Fp[0].astype(jnp.bfloat16), Fp[1].astype(jnp.bfloat16))
    Cp = pa2.permute_host2(C_ref, n1, n2)
    code_f = (jnp.asarray(Cp.real.astype(np.float32)).astype(jnp.bfloat16),
              jnp.asarray(Cp.imag.astype(np.float32)).astype(jnp.bfloat16))
    peak, idx, sm = pa2.corr_surface2(F16, code_f, n1=n1, n2=n2, bt=bt,
                                      reduce=True, n_valid=n,
                                      interpret=True)
    scale = q_valid.max()
    np.testing.assert_allclose(np.asarray(peak), q_valid.max(-1),
                               atol=2e-2 * scale)
    np.testing.assert_array_equal(np.asarray(idx), q_valid.argmax(-1))
    np.testing.assert_allclose(np.asarray(sm), q_valid.sum(-1),
                               rtol=3e-2)

    # (b) cell at jrep IS the linear correlation with data [jhat, jhat+n)
    for jrep in (0, cp0, n - 1):
        jhat = n - jrep
        lin = sum(abs(np.vdot(x[0, b, jhat:jhat + n], code[0]))
                  for b in range(B))
        np.testing.assert_allclose(q_valid[0, 0, jrep], lin, rtol=1e-9)

    # (c) planted peak: a signal delayed by cp0 samples wins at jrep =
    # (n - cp0) mod n, the same lag the reference's 2n-circular argmax
    # reports mod n (acquire-gps-l5i.py:33-37 reports
    # code_length*idx/n mod code_length)
    x2n = x[..., :dw]
    c2n = np.zeros((P, dw), complex)
    c2n[:, :n] = code
    R2 = np.fft.ifft(np.fft.fft(c2n)[:, None, None, :]
                     * np.conj(np.fft.fft(x2n, axis=-1))[None], axis=-1)
    q2 = np.abs(R2).sum(axis=2)
    assert (int(np.asarray(idx)[0, 0]) == (n - cp0)
            == int(q2[0, 0].argmax()) % n)


def test_corr_surface_padded_window(rng):
    """Lane-padded planes (W=30690 -> 165x186 split, padded to x256/x384):
    values match numpy and a planted correlation peak lands exactly."""
    import jax.numpy as jnp
    from gnss_dsp_tpu.ops import pallas_acquire as pa
    from gnss_dsp_tpu.ops import fft as fftm, cplx

    W, P, DC, B, bt = 30690, 2, 1, 4, 2
    n1, n2 = pa.plan2(W)
    x = rng.standard_normal((DC, B, W)) + 1j * rng.standard_normal((DC, B, W))
    c = rng.standard_normal((P, W)) + 1j * rng.standard_normal((P, W))
    F_ref = np.fft.fft(x, axis=-1)
    C_ref = np.fft.fft(c, axis=-1)
    R = np.fft.ifft(C_ref[:, None, None, :] * np.conj(F_ref)[None], axis=-1)
    q_want = np.abs(R).sum(axis=2)

    Fp = fftm.fft_two_level_perm(cplx.from_numpy(x), bf16=True)
    Cp = pa.permute_host(C_ref)
    code_f = (jnp.asarray(Cp.real.astype(np.float32)).astype(jnp.bfloat16),
              jnp.asarray(Cp.imag.astype(np.float32)).astype(jnp.bfloat16))
    F16 = (Fp[0].astype(jnp.bfloat16), Fp[1].astype(jnp.bfloat16))
    q = np.asarray(pa.corr_surface(F16, code_f, n1=n1, n2=n2, bt=bt,
                                   interpret=True))
    j = pa.perm_to_natural_index(np.arange(W), W)
    q_nat = np.empty_like(q)
    q_nat[..., j] = q
    assert (np.abs(q_nat - q_want) / np.abs(q_want).max()).max() < 2e-2

    shift = 12345
    x2 = np.roll(c[0], shift)[None, None, :]
    F2 = fftm.fft_two_level_perm(cplx.from_numpy(x2), bf16=True)
    F216 = (F2[0].astype(jnp.bfloat16), F2[1].astype(jnp.bfloat16))
    q2 = np.asarray(pa.corr_surface(F216, code_f, n1=n1, n2=n2, bt=1,
                                    interpret=True))
    lag = pa.perm_to_natural_index(int(np.argmax(q2[0, 0])), W)
    assert lag == (W - shift) % W
