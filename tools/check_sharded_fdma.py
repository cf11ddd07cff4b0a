"""FDMA mesh twin vs single-chip FDMA engine on the real TPU (1x1 mesh):
same synthetic GLONASS capture, both engines, results must agree.
(Companion to check_sharded_fused.py; guards the sharded doppler-chunk
sizing against HBM OOM at the real 16 GB budget — the virtual-CPU mesh
tests can't see that limit.)"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gnss_dsp_tpu.models import get_signal
from gnss_dsp_tpu.acquire.engine import acquire_signal_fdma
from gnss_dsp_tpu.parallel.acquire import acquire_signal_fdma_sharded
from gnss_dsp_tpu.parallel.mesh import make_mesh
from gnss_dsp_tpu.utils.synth import synth_iq


def main():
    sig = get_signal("glonass-l1")
    chans = list(range(-7, 7))
    ms = 80
    # plant channel -3: its FDMA offset rides on the synth doppler
    fs = sig.acq_fs
    x = synth_iq(sig.code_table((0,))[0], sig.chip_rate, fs,
                 int(fs * (ms + 4) / 1000),
                 doppler_hz=-1200.0 + sig.fdma_hz * -3,
                 code_phase=100.0, cn0_dbhz=45.0,
                 carrier_ratio=sig.track_carrier_ratio(-3),
                 code_doppler_hz=-1200.0)
    mesh = make_mesh(1)
    engines = (os.environ.get("CHECK_ENGINES") or "xla,fused").split(",")
    for engine in engines:
        t0 = time.perf_counter()
        res_s = acquire_signal_fdma_sharded(sig, x, chans, mesh, ms=ms,
                                            engine=engine)
        dt = time.perf_counter() - t0
        res_1 = acquire_signal_fdma(sig, x, chans, ms=ms, engine=engine)
        for a, b in zip(res_s, res_1):
            assert a.prn == b.prn and a.doppler == b.doppler, (a, b)
            assert abs(a.code_offset - b.code_offset) < 1e-6, (a, b)
            assert abs(a.metric - b.metric) <= 2e-3 * b.metric, (a, b)
        hit = max(res_s, key=lambda r: r.metric)
        assert hit.prn == -3 and abs(hit.doppler + 1200.0) <= 200.0, hit
        print(f"fdma sharded[{engine:5s}] == single-chip ({dt*1e3:.0f} ms "
              f"incl compile); chan {hit.prn} doppler {hit.doppler:+.0f} "
              f"code {hit.code_offset:.2f} metric {hit.metric:.1f}")


if __name__ == "__main__":
    main()
