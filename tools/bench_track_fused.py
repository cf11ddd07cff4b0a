"""Fused tracking-scan throughput on the real chip.

Synthesizes C GPS L1 channels at 4.096 MHz, runs track_scan (fused
whole-loop kernel vs the step-scan engine) for NB blocks, and reports
aggregate Msamples/s.  Correctness cross-check: carrier estimates must
converge to the planted dopplers on both paths.

Usage: [BENCH_C=32] [BENCH_NB=900] [BENCH_PATH=fused|scan|both]
       python tools/bench_track_fused.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from gnss_dsp_tpu.models import get_signal
from gnss_dsp_tpu.track.driver import make_params
from gnss_dsp_tpu.track.engine import init_state, track_scan
from gnss_dsp_tpu.ops import pallas_track as ptk
from gnss_dsp_tpu.utils import synth

C = int(os.environ.get("BENCH_C", "32"))
NB = int(os.environ.get("BENCH_NB", "900"))
PATH = os.environ.get("BENCH_PATH", "both")
fs = 4.096e6
sig = get_signal("gps-l1")

rng = np.random.default_rng(3)
prns = (1 + np.arange(C) % 32).tolist()
dops = rng.uniform(-4000, 4000, C).round(1)
phases = rng.uniform(0, 1023, C).round(2)

n = int(NB * fs * 0.001) + 8192
print(f"synthesizing {C} channels x {n} samples ...", flush=True)
x = np.zeros(n, np.complex64)
code_np = sig.code_table(tuple(prns)).astype(np.int8)
for k in range(min(C, 8)):       # 8 real signals + noise is enough signal
    x += synth.synth_iq(code_np[k].astype(np.float64), sig.chip_rate, fs, n,
                        doppler_hz=float(dops[k]), code_phase=float(phases[k]),
                        cn0_dbhz=None, carrier_ratio=1540.0).astype(np.complex64)
x += (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64) * 0.1

params = make_params(sig, fs, coffset=0.0, loop_dwells=(200, 200),
                     use_pallas=True)
assert params.fused_scan
from gnss_dsp_tpu.track.driver import build_code_rows  # noqa: E402
rows_np, pad = build_code_rows(code_np, params, sig.chip_rate / fs)
rows_ext = jnp.asarray(rows_np)
tail = pad + (-(n + pad)) % 1024
xp = np.concatenate([x, np.zeros(tail, np.complex64)])
xd = (jnp.asarray(np.ascontiguousarray(xp.real.astype(np.float32))),
      jnp.asarray(np.ascontiguousarray(xp.imag.astype(np.float32))))
tab = jnp.asarray(code_np)
ratios = jnp.full((C,), 1540.0, jnp.float32)
cdf = jnp.zeros((C,), jnp.int32)


def run(p, label):
    st = init_state(code_p=phases, code_f_off=np.zeros(C), carrier_p=np.zeros(C),
                    carrier_f=dops, ptr=np.zeros(C, np.int32))
    t0 = time.perf_counter()
    st2, rf, ri = track_scan(xd, jnp.int32(n), tab, st, p, NB,
                             ratios=ratios, code_rows_ext=rows_ext,
                             coffset_df=cdf)
    rf = np.asarray(rf)
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(3):
        st = init_state(code_p=phases, code_f_off=np.zeros(C),
                        carrier_p=np.zeros(C), carrier_f=dops,
                        ptr=np.zeros(C, np.int32))
        t0 = time.perf_counter()
        st2, rf2, ri2 = track_scan(xd, jnp.int32(n), tab, st, p, NB,
                                   ratios=ratios, code_rows_ext=rows_ext,
                                   coffset_df=cdf)
        rf2 = np.asarray(rf2)
        best = min(best, time.perf_counter() - t0)
    samples = float(np.asarray(ri2)[..., 0].sum())
    rate = samples / best / 1e6
    cf_tail = np.nanmedian(rf2[-50:, :8, 3], axis=0)
    err = np.abs(cf_tail - dops[:8]).max()
    print(f"{label}: C={C} NB={NB} {best*1e3:8.1f} ms  {rate:7.0f} Msamples/s"
          f"  (compile+1st {compile_s:.1f}s)  max|cf err| {err:.2f} Hz",
          flush=True)
    if not os.environ.get("BENCH_NOASSERT"):
        assert err < 5.0, cf_tail
    return rate


if PATH in ("fused", "both"):
    run(params, "fused")
if PATH in ("scan", "both"):
    run(params._replace(fused_scan=False), "scan ")
