import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from gnss_dsp_tpu.models import get_signal
from gnss_dsp_tpu.track.driver import make_params
from gnss_dsp_tpu.track.engine import init_state, track_scan
from gnss_dsp_tpu.utils.synth import synth_iq

sig = get_signal("gps-l1")
fs = 4.096e6
C = 32            # channels batched
ms = 1000
params = make_params(sig, fs, coffset=0.0)
x = synth_iq(sig.code_table((1,))[0], sig.chip_rate, fs, int(fs), doppler_hz=1000.0,
             code_phase=0.0, cn0_dbhz=45.0, carrier_ratio=1540.0)
xd = (jnp.asarray(x.real), jnp.asarray(x.imag))
st = init_state(code_p=np.zeros(C), code_f_off=np.zeros(C),
                carrier_p=np.zeros(C), carrier_f=np.full(C, 1000.0))
tab = jnp.asarray(sig.code_table(tuple([1]*C)).astype(np.int8))
nb = 900
out = track_scan(xd, jnp.int32(len(x)), tab, st, params, nb)
jax.block_until_ready(out)
t0 = time.perf_counter()
out = track_scan(xd, jnp.int32(len(x)), tab, st, params, nb)
jax.block_until_ready(out)
dt = time.perf_counter() - t0
samples = C * nb * fs * 0.001
print(f"track: C={C} blocks={nb} dt={dt:.3f}s -> {samples/dt/1e6:.1f} Msamples/s ({samples/dt/1e6/C:.2f} per-channel real-time x{samples/dt/fs/C:.1f})")
