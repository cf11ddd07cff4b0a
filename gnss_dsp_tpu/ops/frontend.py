"""Front-end conditioning: carrier-offset wipeoff, anti-alias lowpass,
zero-phase filtering, fractional resampling to the signal's internal rate.

Behavioral contract (acquire-gps-l1.py:85-96): mix(-coffset/fs) ->
firwin(161, cutoff/(fs/2), hann) -> filtfilt -> linear-interp resample.

TPU-native design (split-complex throughout):
  * the wipeoff runs segment-wise with exact host-computed segment phases
    so int32-DDS truncation never accumulates;
  * the 161-tap zero-phase FIR is two causal lax.conv passes (MXU-friendly
    dense convolution) over odd-extension padding, matching
    scipy.signal.filtfilt edge semantics;
  * the fractional resampler is a two-point gather with host-f64-exact
    index/weight tables (f32 cannot address sample 6e6 sub-sample).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from gnss_dsp_tpu.ops import cplx, nco


def design_lowpass(fs: float, cutoff_hz: float, ntaps: int = 161) -> np.ndarray:
    """Hann-windowed-sinc lowpass, DC gain 1 — equivalent to
    scipy.signal.firwin(ntaps, cutoff/(fs/2), window='hann')."""
    m = np.arange(ntaps, dtype=np.float64) - (ntaps - 1) / 2.0
    fc = cutoff_hz / (fs / 2.0)
    h = fc * np.sinc(fc * m)
    h *= np.hanning(ntaps)
    return h / np.sum(h)


@partial(jax.jit, static_argnames=("ntaps",))
def _fir_causal_2ch(xri, h, ntaps: int):
    """Causal FIR (lfilter(h, [1], x)) on [2, n] re/im planes via lax.conv."""
    x = xri[:, None, :]                                   # [N=2, C=1, W]
    k = h[None, None, ::-1].astype(jnp.float32)           # [O=1, I=1, W]
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1,), padding=[(ntaps - 1, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y[:, 0, :]


def filtfilt_fir(h: np.ndarray, x, padlen: int | None = None):
    """Zero-phase FIR filtering of split-complex x with odd-extension edge
    padding (scipy.signal.filtfilt(h, [1], x) semantics)."""
    ntaps = len(h)
    if padlen is None:
        padlen = 3 * ntaps
    xr, xi = x
    n = xr.shape[0]

    def oddext(v):
        left = 2 * v[0] - v[1 : padlen + 1][::-1]
        right = 2 * v[-1] - v[-padlen - 1 : -1][::-1]
        return jnp.concatenate([left, v, right])

    xe = jnp.stack([oddext(xr), oddext(xi)])
    hj = jnp.asarray(h.astype(np.float32))
    y = _fir_causal_2ch(xe, hj, ntaps)
    y = _fir_causal_2ch(y[:, ::-1], hj, ntaps)[:, ::-1]
    return (y[0, padlen : padlen + n], y[1, padlen : padlen + n])


def resample_linear(x, fs: float, fs_out: float, n_out: int):
    """Linear-interpolation resampler (np.interp equivalent for the uniform
    grid t_k = k*fs/fs_out), split-complex."""
    ratio = np.float64(fs) / np.float64(fs_out)
    t = np.arange(n_out, dtype=np.float64) * ratio
    n_in = int(x[0].shape[0])
    i0h = np.minimum(np.floor(t).astype(np.int64), n_in - 1)
    w = jnp.asarray((t - i0h).astype(np.float32))
    i0 = jnp.asarray(i0h.astype(np.int32))
    i1 = jnp.minimum(i0 + 1, n_in - 1)
    x0 = cplx.take(x, i0)
    x1 = cplx.take(x, i1)
    return (
        x0[0] * (1.0 - w) + x1[0] * w,
        x0[1] * (1.0 - w) + x1[1] * w,
    )


def mix_long(x, f: float, p: float = 0.0, seg_bits: int = 20):
    """Carrier wipeoff for multi-million-sample blocks with no phase drift:
    segment-start phases are exact host-side integer arithmetic, so int32
    DDS truncation never accumulates past one segment."""
    n = int(x[0].shape[0])
    seg = 1 << seg_bits
    nseg = -(-n // seg)
    pad = nseg * seg - n
    f_fix = int(np.floor(np.float64(f) % 1.0 * 2.0**32))
    p_fix = int(np.floor(np.float64(p) % 1.0 * 2.0**32))
    starts = np.array(
        [(p_fix + f_fix * seg * k) % (1 << 32) for k in range(nseg)],
        dtype=np.uint32,
    )
    xp = cplx.reshape(
        (jnp.pad(x[0], (0, pad)), jnp.pad(x[1], (0, pad))), (nseg, seg)
    )
    df = jnp.asarray(np.int32(f_fix - (1 << 32) if f_fix >= (1 << 31) else f_fix))
    wc, ws = jax.vmap(lambda p0: nco.nco_split(df, p0, seg))(jnp.asarray(starts))
    y = cplx.cmul(xp, (wc, ws))
    return (y[0].reshape(nseg * seg)[:n], y[1].reshape(nseg * seg)[:n])


def prepare_baseband(x_raw, fs: float, coffset: float, acq_fs: float,
                     cutoff_hz: float, ms_total: int, ntaps: int = 161):
    """Full acquisition front-end: wipeoff + zero-phase lowpass + resample.

    x_raw: host complex array at fs (>= ms_total ms worth) or split pair.
    Returns split-complex [ms_total * acq_fs / 1000] at the internal rate.
    """
    x = cplx.from_numpy(x_raw) if not isinstance(x_raw, tuple) else x_raw
    x = mix_long(x, -coffset / fs)
    h = design_lowpass(fs, cutoff_hz, ntaps)
    x = filtfilt_fir(h, x)
    n_out = int(round(ms_total * acq_fs / 1000.0))
    return resample_linear(x, fs, acq_fs, n_out)
