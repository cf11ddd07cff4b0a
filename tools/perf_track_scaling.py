"""Tracking throughput vs channel count (fused Pallas path).

VERDICT round-1 item #1: prove channel scaling.  Measures aggregate
Msamples/s at C in {32, 64, 128, 256} with honest host-readback timing
(axon's block_until_ready is a no-op), best-of-N on the shared chip.

Usage: python tools/perf_track_scaling.py [C ...]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json, numpy as np, jax, jax.numpy as jnp
from gnss_dsp_tpu.models import get_signal
from gnss_dsp_tpu.track.driver import make_params
from gnss_dsp_tpu.track.engine import init_state, track_scan
from gnss_dsp_tpu.utils.synth import synth_iq
from gnss_dsp_tpu.ops import pallas_track as ptk

sig = get_signal("gps-l1")
fs = 4.096e6
nb = 900
params = make_params(sig, fs, coffset=0.0, use_pallas=True)

x = synth_iq(sig.code_table((1,))[0], sig.chip_rate, fs, int(fs),
             doppler_hz=1000.0, code_phase=0.0, cn0_dbhz=45.0,
             carrier_ratio=1540.0)
cf_nom = sig.chip_rate / fs
pad = (params.pallas_tiles + 1) * ptk.TILE
pad += (-(len(x) + pad)) % ptk.TILE
xp = np.concatenate([x, np.zeros(pad, np.complex64)])
xd = (jnp.asarray(np.ascontiguousarray(xp.real)),
      jnp.asarray(np.ascontiguousarray(xp.imag)))

cs = [int(a) for a in sys.argv[1:]] or [32, 64, 128, 256]
results = []
for C in cs:
    code_np = sig.code_table(tuple([1] * C)).astype(np.int8)
    tab = jnp.asarray(code_np)
    ext = jnp.asarray(ptk.extend_code(
        code_np, params.pallas_w,
        int((params.pallas_tiles + 1) * ptk.TILE * cf_nom * 1.05) + 4))

    def run_once():
        st = init_state(code_p=np.zeros(C), code_f_off=np.zeros(C),
                        carrier_p=np.zeros(C), carrier_f=np.full(C, 1000.0))
        t0 = time.perf_counter()
        out = track_scan(xd, jnp.int32(len(x)), tab, st, params, nb,
                         code_rows_ext=ext)
        rows = np.asarray(out[1])
        dt = time.perf_counter() - t0
        assert np.isfinite(rows[-1, :, 7]).all()
        return dt

    run_once()                       # compile
    best = min(run_once() for _ in range(5))
    samples = C * nb * fs * 0.001
    msps = samples / best / 1e6
    rt = msps * 1e6 / fs / C
    print(f"C={C:4d}  dt={best:.3f}s  {msps:8.1f} Msamples/s aggregate  "
          f"(x{rt:5.2f} real-time/chan)")
    results.append({"C": C, "dt_s": best, "Msamples_s": round(msps, 1),
                    "realtime_per_chan": round(rt, 2)})

print(json.dumps(results))
