"""One process of a multi-controller grid search (driven by
tests/test_multihost.py, runnable by hand for N CPU 'hosts'):

    python tools/multihost_worker.py <pid> <nproc> <port> <in.npz> <out.npz>

Each process owns 4 virtual CPU devices; the (sat, time) mesh spans all
nproc*4.  Process 0 writes the gathered results.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
in_npz, out_npz = sys.argv[4], sys.argv[5]

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from gnss_dsp_tpu.models import get_signal  # noqa: E402
from gnss_dsp_tpu.parallel.mesh import init_multihost, make_mesh  # noqa: E402
from gnss_dsp_tpu.parallel.acquire import acquire_signal_sharded  # noqa: E402

init_multihost(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc

import dataclasses  # noqa: E402

data = np.load(in_npz)
sig = dataclasses.replace(get_signal(str(data["sig"])),
                          acq_fs=float(data["acq_fs"]))
x = data["x"]
prns = [int(p) for p in data["prns"]]

mesh = make_mesh()          # all global devices
res = acquire_signal_sharded(
    sig, x, prns, mesh,
    doppler_search=tuple(float(v) for v in data["dop_search"]),
    ms=int(data["ms"]), dop_chunk=int(data["dop_chunk"]),
    multihost=True,
)
if pid == 0:
    np.savez(out_npz,
             prn=[r.prn for r in res],
             doppler=[r.doppler for r in res],
             metric=[r.metric for r in res],
             code_offset=[r.code_offset for r in res])
print(f"proc {pid}/{nproc} done over {len(jax.devices())} devices")
