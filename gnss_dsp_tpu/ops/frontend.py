"""Front-end conditioning: carrier-offset wipeoff, anti-alias lowpass,
zero-phase filtering, fractional resampling to the signal's internal rate.

Behavioral contract (acquire-gps-l1.py:85-96): mix(-coffset/fs) ->
firwin(161, cutoff/(fs/2), hann) -> filtfilt -> linear-interp resample.

TPU-native design: the FIR + zero-phase pass is two FFT convolutions
(one big batched FFT instead of a per-sample loop); the fractional
resampler is a two-point gather with host-f64-exact index/weight tables
(f32 alone cannot address sample 6e6 with sub-sample precision).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from gnss_dsp_tpu.ops import nco


def design_lowpass(fs: float, cutoff_hz: float, ntaps: int = 161) -> np.ndarray:
    """Hann-windowed-sinc lowpass, DC gain 1 — equivalent to
    scipy.signal.firwin(ntaps, cutoff/(fs/2), window='hann')."""
    m = np.arange(ntaps, dtype=np.float64) - (ntaps - 1) / 2.0
    fc = cutoff_hz / (fs / 2.0)
    h = fc * np.sinc(fc * m)
    h *= np.hanning(ntaps)
    return h / np.sum(h)


def _next_pow2(n: int) -> int:
    return 1 << (int(n - 1).bit_length())


@partial(jax.jit, static_argnames=("nfft",))
def _fir_causal(x, h_f, nfft: int):
    X = jnp.fft.fft(x, nfft)
    y = jnp.fft.ifft(X * h_f)
    return y[: x.shape[0]]


def filtfilt_fir(h: np.ndarray, x, padlen: int | None = None):
    """Zero-phase FIR filtering with odd-extension edge padding
    (scipy.signal.filtfilt(h, [1], x) semantics up to edge transients)."""
    ntaps = len(h)
    if padlen is None:
        padlen = 3 * ntaps
    x = jnp.asarray(x)
    left = 2 * x[0] - x[1 : padlen + 1][::-1]
    right = 2 * x[-1] - x[-padlen - 1 : -1][::-1]
    xe = jnp.concatenate([left, x, right])
    nfft = _next_pow2(xe.shape[0] + ntaps - 1)
    h_f = jnp.fft.fft(jnp.asarray(h), nfft)
    y = _fir_causal(xe, h_f, nfft)
    y = _fir_causal(y[::-1], h_f, nfft)[::-1]
    return y[padlen : padlen + x.shape[0]]


def resample_linear(x, fs: float, fs_out: float, n_out: int):
    """Linear-interpolation resampler (np.interp equivalent for a uniform
    time grid t_k = k*fs/fs_out)."""
    ratio = np.float64(fs) / np.float64(fs_out)
    t = np.arange(n_out, dtype=np.float64) * ratio
    i0 = np.minimum(np.floor(t).astype(np.int64), len(x) - 1)
    w = (t - i0).astype(np.float32)
    i0 = jnp.asarray(i0.astype(np.int32))
    w = jnp.asarray(w)
    i1 = jnp.minimum(i0 + 1, x.shape[0] - 1)
    x0 = jnp.take(x, i0, axis=0)
    x1 = jnp.take(x, i1, axis=0)
    return x0 * (1.0 - w) + x1 * w


def mix_long(x, f: float, p: float = 0.0, seg_bits: int = 20):
    """Carrier wipeoff for multi-million-sample blocks with no phase drift:
    segment starts get exact host-computed fixed-point phases (Python-int
    arithmetic), so int32 DDS truncation never accumulates past a segment."""
    n = int(x.shape[0])
    seg = 1 << seg_bits
    nseg = -(-n // seg)
    pad = nseg * seg - n
    f_fix_exact = int(np.floor(np.float64(f) % 1.0 * 2.0**32))  # per-sample incr
    # exact segment-start phases: (p + f*seg*k) * 2^32 mod 2^32
    p_fix = int(np.floor(np.float64(p) % 1.0 * 2.0**32))
    starts = np.array(
        [(p_fix + f_fix_exact * seg * k) % (1 << 32) for k in range(nseg)],
        dtype=np.uint32,
    )
    xp = jnp.pad(x, (0, pad)).reshape(nseg, seg)
    df = jnp.asarray(np.int32(f_fix_exact & 0xFFFFFFFF), dtype=jnp.int32)
    w = jax.vmap(lambda p0: nco.nco_fixed(df, p0, seg))(jnp.asarray(starts))
    return (xp * w).reshape(nseg * seg)[:n]


def prepare_baseband(x_raw, fs: float, coffset: float, acq_fs: float,
                     cutoff_hz: float, ms_total: int, ntaps: int = 161):
    """Full acquisition front-end: wipeoff + zero-phase lowpass + resample.

    x_raw: complex64 raw samples at fs (>= ms_total ms worth).
    Returns complex64 [ms_total * acq_fs / 1000] at the internal rate.
    """
    x = mix_long(jnp.asarray(x_raw), -coffset / fs)
    h = design_lowpass(fs, cutoff_hz, ntaps)
    x = filtfilt_fir(h, x)
    n_out = int(round(ms_total * acq_fs / 1000.0))
    return resample_linear(x, fs, acq_fs, n_out).astype(jnp.complex64)
