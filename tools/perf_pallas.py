"""Pallas fused correlator vs XLA gather path: compile + speed on TPU."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gnss_dsp_tpu.ops import pallas_track as ptk


def main():
    rng = np.random.default_rng(0)
    fs = 4.096e6
    chip_rate = 1.023e6
    L = 1023
    C = 32
    n = 6146
    n_tiles = -(-n // ptk.TILE)
    npad = n_tiles * ptk.TILE
    cf = chip_rate / fs
    W = ptk.chip_window(cf)
    code = rng.choice([-1, 1], (C, L)).astype(np.int8)
    code_rows = jnp.asarray(
        ptk.extend_code(code, W, int((npad + ptk.TILE) * cf) + 2))
    nchunk = npad + 8 * ptk.TILE
    xr = jnp.asarray(rng.standard_normal((1, nchunk)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((1, nchunk)).astype(np.float32))
    si = np.zeros((C, 9), np.int32)
    sf = np.zeros((C, 4), np.float32)
    si[:, 0] = 99; si[:, 1] = 100; si[:, 2] = 100
    sf[:, 0] = 0.95; sf[:, 1] = 0.0; sf[:, 2] = 0.05
    si[:, 3] = 1 << 18          # dphase_a
    si[:, 4] = n                # n_valid
    si[:, 5] = rng.integers(0, 1 << 31, C)   # phase0_a
    si[:, 6] = 1 << 12          # dphase_b
    si[:, 7] = rng.integers(0, 1 << 31, C)   # phase0_b
    si[:, 8] = rng.integers(0, 7 * ptk.TILE, C)  # ptr (mid-tile)
    sf[:, 3] = cf
    si = jnp.asarray(si); sf = jnp.asarray(sf)

    for sub in ("none", "cboc"):
        out = np.asarray(ptk.epl_correlate(si, sf, xr, xi, code_rows,
                                           n_tiles=n_tiles, W=W, sub=sub))
        t0 = time.perf_counter()
        reps = 50
        for _ in range(reps):
            out = np.asarray(ptk.epl_correlate(
                si, sf, xr, xi, code_rows, n_tiles=n_tiles, W=W, sub=sub))
        dt = (time.perf_counter() - t0) / reps
        sps = C * n / dt
        print(f"pallas[{sub:5s}]: {dt*1e6:8.1f} us/step -> "
              f"{sps/1e6:8.0f} Msamples/s  out0={out[0,:6].round(2)}")


if __name__ == "__main__":
    main()
