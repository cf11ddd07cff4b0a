"""Multi-controller (DCN) story, VERDICT round-1 item 7: the sharded grid
search run as TWO separate jax.distributed processes (4 virtual CPU
devices each) must match the single-process engine exactly."""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_grid_search(tmp_path):
    import dataclasses

    from gnss_dsp_tpu.models import get_signal
    from gnss_dsp_tpu.utils.synth import synth_iq
    from gnss_dsp_tpu.acquire.engine import acquire_signal

    sig = dataclasses.replace(get_signal("gps-l1"), acq_fs=1.024e6)
    prns = list(range(1, 9))
    ms, dop_search, dop_chunk = 8, (-2000.0, 2000.0, 250.0), 8
    n = int(sig.acq_fs * 1e-3)
    x = synth_iq(sig.code_table((3,))[0], sig.chip_rate, sig.acq_fs,
                 (ms + 1) * n, doppler_hz=900.0, code_phase=77.0,
                 cn0_dbhz=43.0, rng=np.random.default_rng(3),
                 carrier_ratio=1540.0)
    single = acquire_signal(sig, x, prns, doppler_search=dop_search, ms=ms)

    in_npz = os.path.join(tmp_path, "in.npz")
    out_npz = os.path.join(tmp_path, "out.npz")
    np.savez(in_npz, sig="gps-l1", acq_fs=sig.acq_fs, x=x, prns=prns,
             dop_search=dop_search, ms=ms, dop_chunk=dop_chunk)

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "multihost_worker.py"),
             str(pid), "2", str(port), in_npz, out_npz],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        logs.append(out)
        assert p.returncode == 0, out[-2000:]
    got = np.load(out_npz)

    for i, r in enumerate(single):
        assert int(got["prn"][i]) == r.prn
        assert float(got["doppler"][i]) == r.doppler, (i, logs[0][-500:])
        assert float(got["code_offset"][i]) == r.code_offset
        np.testing.assert_allclose(float(got["metric"][i]), r.metric,
                                   rtol=1e-5)
