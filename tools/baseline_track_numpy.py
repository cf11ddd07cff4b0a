"""Fair CPU tracking baseline (VERDICT round-1 item 3).

The reference's tracking tier is Numba-JIT per-sample loops
(gnsstools/gps/ca.py:120-128 `correlate`, nco.py:30-38 `mix_`); numba is
not installable here (no network — `pip install numba` fails with
NameResolutionError, recorded in BASELINE.md), so this measures the best
honest CPU stand-in: a fully VECTORIZED numpy implementation of the same
semantics (int64 fixed-point LUT mix, float64 code-phase ramp + gather +
dot for E/P/L).  Vectorized numpy is the same memory-bound ballpark as
scalar Numba for this op mix — every sample is touched a handful of
times either way — so the ratio against it is a fair "vs best CPU core"
number, unlike the reference's pure-Python fallback (~0.3 Msamples/s).

Workload mirrors tools/perf_track.py: 32 channels x 900 blocks x ~4096
samples (GPS L1 C/A at 4.096 MHz), per-block: carrier-offset mix, carrier
NCO mix, three correlations.

Run: python tools/baseline_track_numpy.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np

NT = 1024
TAB = np.exp(2j * np.pi * np.arange(NT) / NT).astype(np.complex128)
FIX = 1 << 50


def mix_vec(x, f, p):
    """Vectorized reference nco.mix_ (int64 fixed-point, 50 frac bits)."""
    n = len(x)
    dp = np.int64(np.floor(p * NT * FIX))
    df = np.int64(np.floor(f * NT * FIX))
    idx = ((dp + np.arange(n, dtype=np.int64) * df) >> 50) & (NT - 1)
    return x * TAB[idx]


def correlate_vec(x, code_pm1, cp0, incr):
    """Vectorized reference correlate: float64 code-phase ramp + gather."""
    L = len(code_pm1)
    ci = (np.floor(cp0 + np.arange(len(x)) * incr) % L).astype(np.int64)
    return np.dot(x, code_pm1[ci])


def main():
    rng = np.random.default_rng(0)
    fs = 4.096e6
    chip_rate = 1.023e6
    L = 1023
    C, NB = 32, 900
    n = int(fs * 0.001)          # ~1 ms block
    code = rng.choice([-1.0, 1.0], L)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex128)

    el = 0.05
    incr = chip_rate / fs
    t0 = time.perf_counter()
    acc = 0.0 + 0.0j
    for c in range(C):
        cp = 0.0
        for b in range(NB):
            xm = mix_vec(x, -1e-3, 0.1)          # coffset wipeoff (:170-172)
            xm = mix_vec(xm, 2.4e-4, 0.3)        # carrier NCO (:37-42)
            for lag in (-el, 0.0, el):
                acc += correlate_vec(xm, code, cp + lag, incr)
            cp = (cp + n * incr) % L
    dt = time.perf_counter() - t0
    samples = C * NB * n
    print(f"baseline[numpy-vectorized]: C={C} blocks={NB} n={n} "
          f"dt={dt:.2f}s -> {samples/dt/1e6:.1f} Msamples/s (1 core) "
          f"[checksum {abs(acc):.3e}]")


if __name__ == "__main__":
    main()
