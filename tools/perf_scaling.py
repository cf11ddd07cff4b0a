"""Multi-chip scaling harness (SURVEY.md §7.7).

On real pods: run with JAX_PLATFORMS unset to measure 1 chip / N chips.
Here (one tunneled chip) it validates the sharded program on virtual CPU
meshes 1/2/4/8 and reports relative scan times + result equality — the
collective structure (PRN sharding, psum over time shards) is identical
to what a pod slice executes.

  python tools/perf_scaling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402
import jax  # noqa: E402

# default: validate on the virtual CPU mesh (the tunneled axon backend has
# exactly one chip).  Set GNSS_SCALING_REAL=1 on a pod slice to measure
# real multi-chip scaling.
if not os.environ.get("GNSS_SCALING_REAL"):
    jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

from gnss_dsp_tpu.models import get_signal  # noqa: E402
from gnss_dsp_tpu.acquire.engine import acquire_signal  # noqa: E402
from gnss_dsp_tpu.parallel.acquire import acquire_signal_sharded  # noqa: E402
from gnss_dsp_tpu.parallel.mesh import make_mesh  # noqa: E402
from gnss_dsp_tpu.utils.synth import synth_iq  # noqa: E402


def main():
    sig = dataclasses.replace(get_signal("gps-l1"), acq_fs=2.048e6)
    prns = list(range(1, 17))
    ms = 16
    n = int(sig.acq_fs * 1e-3)
    x = synth_iq(sig.code_table((9,))[0], sig.chip_rate, sig.acq_fs,
                 (ms + 1) * n, doppler_hz=1200.0, code_phase=321.0,
                 cn0_dbhz=42.0, carrier_ratio=1540.0)
    kw = dict(doppler_search=(-2000.0, 2000.0, 250.0), ms=ms, dop_chunk=8)

    base = acquire_signal(sig, x, prns, **kw)
    print(f"1 device (unsharded): prn9 -> dop {base[8].doppler:+.0f} "
          f"code {base[8].code_offset:.2f} metric {base[8].metric:.2f}")

    for nd in (2, 4, 8):
        if nd > len(jax.devices()):
            break
        mesh = make_mesh(nd)
        res = acquire_signal_sharded(sig, x, prns, mesh, **kw)
        t0 = time.perf_counter()
        res = acquire_signal_sharded(sig, x, prns, mesh, **kw)
        dt = time.perf_counter() - t0
        same = all(a.doppler == b.doppler and a.code_offset == b.code_offset
                   for a, b in zip(base, res))
        print(f"{nd} devices (sat={mesh.shape['sat']}, "
              f"time={mesh.shape['time']}): {dt*1e3:7.1f} ms  "
              f"results_match={same}")


if __name__ == "__main__":
    main()
