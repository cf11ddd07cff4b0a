"""Numerically-controlled oscillator (NCO) and carrier mixers.

Behavioral contract (reference: gnsstools/nco.py:3-64): a 1024-entry
complex-exponential lookup table drives every oscillator; phases are
quantized to the table *before* lookup, so two implementations agree
exactly when their phase accumulators agree to better than 1/1024 cycle.

TPU-native design: instead of the reference's per-sample Numba loop with a
50-fractional-bit int64 phase accumulator (nco.py:30-38), we use a
*vectorized int32 DDS*: phase lives in uint32 "turns" (1 cycle = 2^32),
per-sample phase is `p0 + i*df` with natural mod-2^32 wraparound, and the
LUT index is the top 10 bits.  That keeps phase error below 2^-32
cycle/sample with no sequential dependency — the whole oscillator is one
iota, one multiply, one shift, one gather, all fusable by XLA.

All functions are pure (JAX-functional); the reference mutates in place.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

NT = 1024  # LUT size; matches reference quantization (nco.py:3)
_PHASE_BITS = 32
_LUT_SHIFT = _PHASE_BITS - 10  # top 10 bits index the 1024-entry table

# Host-side f64 table; device copies are complex64.
NCO_TABLE = np.exp(2j * np.pi * np.arange(NT) / NT)
_TABLE_C64 = jnp.asarray(NCO_TABLE.astype(np.complex64))


def phase_to_fixed(p) -> np.uint32:
    """Convert a phase in cycles (host float) to uint32 fixed-point turns."""
    return np.uint32(np.mod(np.float64(p), 1.0) * 2.0**32)


def freq_to_fixed(f) -> np.int32:
    """Convert cycles/sample (host float) to int32 fixed-point increment."""
    # wraps mod 2^32 == mod 1 cycle, so only the fractional part matters
    return np.int32(np.round(np.mod(np.float64(f), 1.0) * 2.0**32).astype(np.int64) & 0xFFFFFFFF)


def freq_to_fixed_jnp(f):
    """Device-side cycles/sample -> int32 increment (f32 input, |f| small)."""
    frac = jnp.mod(f.astype(jnp.float32), 1.0)
    return (frac * jnp.float32(2.0**32)).astype(jnp.uint32).astype(jnp.int32)


def nco_fixed(df_fixed, p0_fixed, n: int):
    """Complex exponential e^{2πi(p0 + i·f)} sampled through the 1024 LUT.

    df_fixed, p0_fixed: int32/uint32 scalars (fixed-point turns).
    Returns complex64 [n].
    """
    i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)
    ph = p0_fixed.astype(jnp.int32) + i * df_fixed.astype(jnp.int32)  # wraps mod 2^32
    idx = jax.lax.shift_right_logical(ph.astype(jnp.uint32), np.uint32(_LUT_SHIFT))
    return jnp.take(_TABLE_C64, idx.astype(jnp.int32), axis=0)


def nco(f: float, p: float, n: int):
    """Reference-compatible oscillator (nco.py:6-10): host-float f, p in
    cycles/sample and cycles.  Returns complex64 [n] on device."""
    return nco_fixed(
        jnp.asarray(freq_to_fixed(f)), jnp.asarray(phase_to_fixed(p)), n
    )


def nco_host(f: float, p: float, n: int) -> np.ndarray:
    """Bit-compatible host oracle of the reference nco() (nco.py:6-10)."""
    idx = np.floor((p + f * np.arange(n)) * NT).astype(np.int64) % NT
    return NCO_TABLE[idx]


def mix(x, f, p):
    """Carrier wipeoff: x * e^{2πi(p + i·f)} (reference mix_, nco.py:30-41,
    which mutates x in place; this returns a new array).

    f, p are host floats (known statically, e.g. -coffset/fs)."""
    return x * nco(f, p, x.shape[-1])


def mix_fixed(x, df_fixed, p0_fixed):
    """Carrier wipeoff with device fixed-point frequency/phase scalars."""
    return x * nco_fixed(df_fixed, p0_fixed, x.shape[-1])


def mix_doppler_fixed(x, ddf_fixed, df_fixed, p0_fixed):
    """Wipeoff with a linear frequency ramp (reference mix_doppler_,
    nco.py:43-56): phase(i) = p0 + i·df + i(i-1)/2·ddf."""
    n = x.shape[-1]
    i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)
    tri = (i * (i - 1)) // 2
    ph = (
        p0_fixed.astype(jnp.int32)
        + i * df_fixed.astype(jnp.int32)
        + tri * ddf_fixed.astype(jnp.int32)
    )
    idx = jax.lax.shift_right_logical(ph.astype(jnp.uint32), np.uint32(_LUT_SHIFT))
    return x * jnp.take(_TABLE_C64, idx.astype(jnp.int32), axis=0)


def boc11(chips: float, frac: float, incr: float, n: int):
    """BOC(1,1) square-wave subcarrier sampler (reference nco.py:12-19):
    ±1 square wave at one cycle per chip, sampled at the code-phase rate.
    Host-computed (static args), device array out."""
    return jnp.asarray(boc11_host(chips, frac, incr, n))


def boc11_host(chips: float, frac: float, incr: float, n: int) -> np.ndarray:
    c = np.array([-1.0, 1.0])
    idx = ((chips % 2) + frac + incr * np.arange(n)) * 2
    idx = np.floor(idx).astype(np.int64) % 2
    return c[idx]


def accum_code_bins(x, cp0, incr, code_length: int):
    """Code-phase-binned accumulation (reference nco.accum, nco.py:58-64):
    a[floor(cp_i)] += x[i] with cp_i = (cp0 + i·incr) mod L.  Used for
    unknown-code recovery (track-beidou-b2bi.py:47-53).

    Returns complex64 [code_length]."""
    n = x.shape[-1]
    i = jnp.arange(n, dtype=jnp.float32)
    cp = jnp.mod(cp0 + i * incr, code_length)
    idx = jnp.floor(cp).astype(jnp.int32)
    a = jnp.zeros((code_length,), dtype=x.dtype)
    return a.at[idx].add(x)
