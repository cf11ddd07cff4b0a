"""Multi-constellation performance table on the real chip.

Covers the BASELINE.json configs beyond GPS L1: E1B (CBOC sliding,
fused window 65536), L5I (30.69 MHz family, bf16 XLA path), B1I
(fused 16384), GLONASS L1 FDMA, plus the tracking engine summary.
Prints one table row per workload.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gnss_dsp_tpu.models import get_signal
from gnss_dsp_tpu.acquire.engine import acquire_signal, _block_count
from gnss_dsp_tpu.utils.synth import synth_iq

CASES = [
    # name, prn, prns_searched, doppler grid, ms
    ("gps-l1", 21, list(range(1, 33)), (-7000., 7000., 200.), 80),
    ("galileo-e1b", 24, list(range(1, 51)), (-9000., 9000., 50.), 80),
    ("gps-l5i", 25, list(range(1, 33)), (-7000., 7000., 200.), 80),
    ("beidou-b1i", 34, list(range(1, 64)), (-7000., 7000., 200.), 80),
    ("glonass-l1", 0, list(range(-7, 8)), (-7000., 7000., 200.), 80),
]

SUBC = {"galileo-e1b": "cboc"}


def main():
    print(f"{'signal':14s} {'grid':>26s} {'time':>9s} {'Gcells/s':>9s}  found")
    for name, prn, prns, dops, ms in CASES:
        sig = get_signal(name)
        n = int(round(sig.acq_fs * sig.acq_coherent_ms / 1000.0))
        window = 2 * n if (sig.acq_pad2 or sig.acq_sliding) else n
        blocks = _block_count(sig, ms)
        x = synth_iq(sig.code_table((prn,))[0], sig.chip_rate, sig.acq_fs,
                     int(sig.acq_fs * (ms + 4) / 1000), doppler_hz=1500.0,
                     code_phase=100.0, cn0_dbhz=45.0,
                     subcarrier=SUBC.get(name, "none"),
                     carrier_ratio=sig.track_carrier_ratio(0),
                     code_doppler_hz=1500.0)
        fdma = bool(sig.fdma_hz)
        t_run = []
        for rep in range(2):
            t0 = time.perf_counter()
            if fdma:
                from gnss_dsp_tpu.acquire.engine import acquire_signal_fdma

                res = acquire_signal_fdma(sig, x, prns,
                                          doppler_search=dops, ms=ms)
            else:
                res = acquire_signal(sig, x, prns, doppler_search=dops, ms=ms)
            t_run.append(time.perf_counter() - t0)
        dt = t_run[-1]
        D = len(np.arange(*dops))
        cells = len(prns) * D * window * blocks
        hit = [r for r in res if r.prn == prn][0]
        ok = (abs(hit.doppler - 1500.0) <= dops[2]
              and min(abs(hit.code_offset - 100.0),
                      sig.code_length - abs(hit.code_offset - 100.0)) < 2)
        print(f"{name:14s} {len(prns):3d}x{D:3d}x{window:6d}x{blocks:3d} "
              f"{dt*1e3:8.1f}ms {cells/dt/1e9:9.2f}  "
              f"{'OK' if ok else 'MISS ' + str(hit)}")


if __name__ == "__main__":
    main()
