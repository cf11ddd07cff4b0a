"""Sustained device-side rate of the v2p (padded lane-aligned) route on
the 30.69/15.345 MHz family: one dispatch scans S independent epochs of
the capture, one stacked readback (same methodology as bench.bench_tpu).

Usage: python tools/perf_v2p.py [gps-l5i] [segments] [dop_chunk]
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

name = sys.argv[1] if len(sys.argv) > 1 else "gps-l5i"
S = int(sys.argv[2]) if len(sys.argv) > 2 else 8
dc = int(sys.argv[3]) if len(sys.argv) > 3 else 0

sig = get_signal(name)
ms = 80
prns = tuple(range(1, 33))
fs = sig.acq_fs
n = int(round(fs * sig.acq_coherent_ms / 1000.0))
window = 2 * n if (sig.acq_pad2 or sig.acq_sliding) else n
blocks = eng._block_count(sig, ms)
plan = eng._fused_plan(window, pad2_n=(n if sig.acq_pad2 else None))
window_t = eng._plan_window(plan, window)
print(f"{name}: n={n} window={window} plan={plan} blocks={blocks}")
assert plan and plan[0] == "v2p"

dops, fixed = eng.doppler_grid(sig, sig.doppler_default)
D = len(dops)
if not dc:
    dc = D
Dp = -(-D // dc) * dc
fixed_p = np.zeros(Dp, np.int32)
fixed_p[:D] = fixed
valid = np.zeros(Dp, bool)
valid[:D] = True

cf_host = eng.build_code_ffts(sig, prns, n, window_t)
code_ffts = cplx.from_numpy(eng._prep_fused_codes(cf_host, plan))
bt = eng._fused_bt(plan, window, blocks, len(prns))

seg_len = blocks * n
x = synth_sky(sig, fs, S * seg_len + window)
xs = cplx.from_numpy(x)
fj, vj = jnp.asarray(fixed_p), jnp.asarray(valid)

kw = dict(n=n, window=window_t, blocks=blocks, peak_mean=False,
          dop_chunk=dc, precision=jax.lax.Precision.DEFAULT,
          fused=plan, fused_bt=bt, n_valid=n, data_window=window)


@jax.jit
def run_all(x0, x1, cf0, cf1):
    def seg_body(_, s):
        xseg = (jax.lax.dynamic_slice(x0, (s * seg_len,),
                                      (seg_len + window,)),
                jax.lax.dynamic_slice(x1, (s * seg_len,),
                                      (seg_len + window,)))
        m, ci, di = eng.grid_search(xseg, (cf0, cf1), fj, vj, **kw)
        return 0, jnp.stack([m, ci.astype(jnp.float32),
                             di.astype(jnp.float32)], axis=0)
    _, out = jax.lax.scan(seg_body, 0, jnp.arange(S))
    return out


args = (xs[0], xs[1], code_ffts[0], code_ffts[1])
out = np.asarray(run_all(*args))
# planted PRNs (bench.synth_sky: 5, 12, 21) must win every epoch
for s in range(S):
    top = set(int(p) for p in np.argsort(out[s, 0])[-3:] + 1)
    assert top == {5, 12, 21}, (s, top)
best = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    out = np.asarray(run_all(*args))
    best = min(best, (time.perf_counter() - t0) / S)
cells = len(prns) * D * window * blocks
print(f"dop_chunk={dc} bt={bt}: {best*1e3:.1f} ms/epoch = "
      f"{cells/best/1e9:.1f} Gcells/s sustained "
      f"({len(prns)} x {D} x {window} x {blocks})")
