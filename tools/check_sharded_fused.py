"""Sharded fused path vs single-chip engine on the real TPU (1x1 mesh):
same synthetic capture, both engines, results must agree cell-for-cell."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gnss_dsp_tpu.models import get_signal
from gnss_dsp_tpu.acquire.engine import acquire_signal
from gnss_dsp_tpu.parallel.acquire import acquire_signal_sharded
from gnss_dsp_tpu.parallel.mesh import make_mesh
from gnss_dsp_tpu.utils.synth import synth_iq


def main():
    sig = get_signal("gps-l1")
    prns = list(range(1, 33))
    ms = 80
    x = synth_iq(sig.code_table((21,))[0], sig.chip_rate, sig.acq_fs,
                 int(sig.acq_fs * (ms + 4) / 1000), doppler_hz=1500.0,
                 code_phase=100.0, cn0_dbhz=45.0, carrier_ratio=1540.0,
                 code_doppler_hz=1500.0)
    mesh = make_mesh(1)
    engines = (os.environ.get("CHECK_ENGINES") or "xla,fused").split(",")
    for engine in engines:
        t0 = time.perf_counter()
        res_s = acquire_signal_sharded(sig, x, prns, mesh, ms=ms,
                                       engine=engine)
        dt = time.perf_counter() - t0
        res_1 = acquire_signal(sig, x, prns, ms=ms, engine=engine)
        for a, b in zip(res_s, res_1):
            assert a.prn == b.prn and a.doppler == b.doppler, (a, b)
            assert abs(a.code_offset - b.code_offset) < 1e-6, (a, b)
            assert abs(a.metric - b.metric) <= 2e-3 * b.metric, (a, b)
        hit = [r for r in res_s if r.prn == 21][0]
        assert abs(hit.doppler - 1500.0) <= 200.0, hit
        print(f"sharded[{engine:5s}] == single-chip ({dt*1e3:.0f} ms incl "
              f"compile); PRN21 doppler {hit.doppler:+.0f} "
              f"code {hit.code_offset:.2f} metric {hit.metric:.1f}")


if __name__ == "__main__":
    main()
