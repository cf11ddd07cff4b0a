"""Acquisition micro-benchmark: precision ladder on the real chip.

Times the full 32-PRN sky-search grid at each matmul precision and
reports metric fidelity of the planted PRNs vs the HIGHEST-precision
result, so a faster precision can be validated before bench.py uses it.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gnss_dsp_tpu.models import get_signal
from gnss_dsp_tpu.acquire import engine as eng
from gnss_dsp_tpu.ops import cplx
from bench import synth_sky


def main():
    sig = get_signal("gps-l1")
    ms = 80
    prns = tuple(range(1, 33))
    fs = sig.acq_fs
    n = int(fs // 1000)
    x = synth_sky(sig, fs, (ms + 1) * n)
    dops, fixed = eng.doppler_grid(sig, (-7000.0, 7000.0, 200.0))
    D = len(dops)
    code_ffts = cplx.from_numpy(eng.build_code_ffts(sig, prns, n, n))
    xs = cplx.from_numpy(x)
    fj = jnp.asarray(fixed)
    vj = jnp.ones(D, bool)
    cells = len(prns) * D * n * ms

    ref = None
    for name, prec, dc, b16 in (
        ("HIGHEST dc7", jax.lax.Precision.HIGHEST, 7, False),
        ("DEFAULT dc7", jax.lax.Precision.DEFAULT, 7, False),
        ("bf16 dc7", jax.lax.Precision.DEFAULT, 7, True),
        ("bf16 dc14", jax.lax.Precision.DEFAULT, 14, True),
        ("bf16 dc35", jax.lax.Precision.DEFAULT, 35, True),
    ):
        def run():
            out = eng.grid_search(xs, code_ffts, fj, vj, n=n, window=n,
                                  blocks=ms, peak_mean=True, dop_chunk=dc,
                                  precision=prec, bf16=b16)
            return tuple(np.asarray(o) for o in out)

        out = run()
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = run()
        dt = (time.perf_counter() - t0) / reps
        metric, code_idx, dop_idx = out
        if ref is None:
            ref = out
        same_cells = (np.array_equal(code_idx, ref[1])
                      and np.array_equal(dop_idx, ref[2]))
        merr = float(np.max(np.abs(metric - ref[0]) / ref[0]))
        print(f"{name:14s} {dt*1e3:7.1f} ms  {cells/dt/1e9:8.2f} Gcells/s  "
              f"cells_match={same_cells}  metric_rel_err={merr:.2e}")


if __name__ == "__main__":
    main()
