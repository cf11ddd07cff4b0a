"""Kernel-only throughput: scan K fused-correlator calls inside one jit,
read back once (axon block_until_ready is a no-op; per-call np.asarray
would pay ~29 ms readback each).

Usage: python tools/bench_kernel_scan.py [module_path]
(module_path: alternate pallas_track variant to import, for A/B tests)
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

if len(sys.argv) > 1:
    import importlib.util
    spec = importlib.util.spec_from_file_location("ptk_variant", sys.argv[1])
    ptk = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ptk)
else:
    from gnss_dsp_tpu.ops import pallas_track as ptk

rng = np.random.default_rng(0)
fs = 4.096e6
chip_rate = 1.023e6
L = 1023
C = int(os.environ.get('BENCH_C', '32'))
n = 4096
n_tiles = -(-n // ptk.TILE)
cf = chip_rate / fs
W = ptk.chip_window(cf)
code = rng.choice([-1, 1], (C, L)).astype(np.int8)
code_rows = jnp.asarray(
    ptk.extend_code(code, W, int((n_tiles + 2) * ptk.TILE * cf) + 2))
NEW_STYLE = hasattr(ptk, "LEAD")     # shared-chunk signature
if NEW_STYLE:
    nchunk = int(os.environ.get("BENCH_NCHUNK", (n_tiles + 8) * ptk.TILE))
    xr = jnp.asarray(rng.standard_normal((1, nchunk)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((1, nchunk)).astype(np.float32))
else:
    npad = n_tiles * ptk.TILE
    xr = jnp.asarray(rng.standard_normal((C, npad)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((C, npad)).astype(np.float32))
si = np.zeros((C, 9), np.int32)
sf = np.zeros((C, 4), np.float32)
si[:, 0] = 99; si[:, 1] = 100; si[:, 2] = 100
sf[:, 0] = 0.95; sf[:, 1] = 0.0; sf[:, 2] = 0.05
si[:, 3] = 1 << 18
si[:, 4] = n
si[:, 5] = rng.integers(0, 1 << 31, C)
si[:, 6] = 1 << 12
si[:, 7] = rng.integers(0, 1 << 31, C)
si[:, 8] = rng.integers(0, 7 * ptk.TILE, C)
sf[:, 3] = cf
si = jnp.asarray(si); sf = jnp.asarray(sf)

K = int(os.environ.get("BENCH_K", "300"))
SUB = os.environ.get("BENCH_SUB", "none")


CARRY = int(os.environ.get("BENCH_CARRY", "0"))  # 1: si depends on the
                                                 # previous step's out
                                                 # 2: carried, no feedback


@jax.jit
def scan_kernel(si, sf, xr, xi, code_rows):
    def step(acc, _):
        out = ptk.epl_correlate(si, sf, xr, xi, code_rows,
                                n_tiles=n_tiles, W=W, sub=SUB)
        return acc + out, None

    def step_carry(carry, _):
        acc, si_c = carry
        out = ptk.epl_correlate(si_c, sf, xr, xi, code_rows,
                                n_tiles=n_tiles, W=W, sub=SUB)
        if CARRY == 2:           # carried ptr, NO feedback from out
            bump = jnp.int32(1)
        else:                    # data-dependent, like the tracking loop
            bump = (out[:, 0] > -jnp.inf).astype(jnp.int32)  # always 1
        si_n = si_c.at[:, 8].set(
            (si_c[:, 8] + n * bump) % (nchunk - (n_tiles + 2) * ptk.TILE))
        return (acc + out, si_n), None

    if CARRY:
        (acc, _), _ = jax.lax.scan(
            step_carry, (jnp.zeros((C, 128), jnp.float32), si),
            None, length=K)
    else:
        acc, _ = jax.lax.scan(step, jnp.zeros((C, 128), jnp.float32),
                              None, length=K)
    return acc


out = np.asarray(scan_kernel(si, sf, xr, xi, code_rows))   # compile
best = np.inf
for _ in range(5):
    t0 = time.perf_counter()
    out = np.asarray(scan_kernel(si, sf, xr, xi, code_rows))
    best = min(best, time.perf_counter() - t0)
us = best / K * 1e6
print(f"kernel[{SUB}]: {us:8.1f} us/call  -> "
      f"{C * n * K / best / 1e6:7.0f} Msamples/s  out0={out[0, :3].round(1)}")
