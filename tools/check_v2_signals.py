"""On-chip cross-engine check: acquire_signal(engine='auto') must find the
same cells as engine='xla' for planted PRNs across window families."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from gnss_dsp_tpu.models import get_signal
from gnss_dsp_tpu.acquire import engine as eng
from gnss_dsp_tpu.utils.synth import synth_iq

CASES = [
    ("gps-l1", (5, 12), 40),       # W=4096, peak_mean
    ("gps-l5i", (3,), 40),          # W=61380 -> v2p (padded 65536)
    ("galileo-e6b", (11,), 40),     # W=30690 -> v2p (padded 32768)
    ("gps-l2cm", (29,), 40),        # W=163840 -> v2 (4 MB mats budget)
    ("beidou-b1i", (34,), 40),      # W=16384
    ("gps-l1cp", (7,), 40),         # 10ms coherent, pad2 family
    ("galileo-e1b", (24,), 40),     # sliding, BOC ref
]
rng = np.random.default_rng(3)
for name, prns, ms in CASES:
    sig = get_signal(name)
    fs = sig.acq_fs
    n = int(round(fs * sig.acq_coherent_ms / 1000.0))
    window = 2 * n if (sig.acq_pad2 or sig.acq_sliding) else n
    plan = eng._fused_plan(window, pad2_n=(n if sig.acq_pad2 else None))
    N = (ms + 1) * int(fs // 1000)
    x = np.zeros(N, np.complex64)
    for i, prn in enumerate(prns):
        code = sig.code_table((prn,))[0]
        x += synth_iq(code, sig.chip_rate, fs, N, doppler_hz=1200.0 + 400*i,
                      code_phase=333.25, cn0_dbhz=None,
                      carrier_ratio=sig.carrier_ratio)
    x += 0.4 * (rng.standard_normal(N) + 1j*rng.standard_normal(N)).astype(np.complex64)
    ra = eng.acquire_signal(sig, x, prns, ms=ms, engine="auto")
    rx = eng.acquire_signal(sig, x, prns, ms=ms, engine="xla")
    ok = all(abs(a.doppler - b.doppler) < 1e-6 and
             abs(a.code_offset - b.code_offset) < 0.51 and
             abs(a.metric - b.metric) / max(b.metric, 1e-9) < 0.05
             for a, b in zip(ra, rx))
    print(f"{name:14s} plan={plan}  auto={[(r.prn, round(r.doppler,1), round(r.code_offset,2)) for r in ra]}"
          f"  match={ok}")
    assert ok, (name, ra, rx)
print("ALL OK")
