"""Unknown-code recovery end to end: synthesize B2bi IQ with random
navigation bits, run the drop-in scripts/track-beidou-b2bi.py, and check
that the per-chip bins in track-chips.dat recover the transmitted code —
the workflow the reference used to capture the B2b memory codes
(track-beidou-b2bi.py:47-53,181-184)."""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

from gnss_dsp_tpu.models import get_signal
from gnss_dsp_tpu.utils.synth import synth_iq, to_int8_iq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_b2bi_file(tmp_path, prn, fs, ms, doppler, rng):
    sig = get_signal("beidou-b2bi")
    code = sig.code_table((prn,))[0].astype(np.float64)
    n = int(fs * ms / 1000)
    bits = rng.choice([-1.0, 1.0], size=ms + 2)
    # the recovery SNR budget is thin in a short test: at fs=22 MHz each
    # chip bin collects ~2.15 samples/block, so (ms-warmup) blocks at
    # cn0 give bin SNR ~ (ms-warmup)*2.15*10^(cn0/10)/fs — 60 dBHz over
    # ~90 blocks is ~9 (power), i.e. ~0.2% chip error.  The reference ran
    # this over seconds of real capture (track-beidou-b2bi.py:47-53).
    x = synth_iq(code, sig.chip_rate, fs, n, doppler_hz=doppler,
                 code_phase=0.0, cn0_dbhz=60.0, amplitude=8.0,
                 carrier_ratio=sig.carrier_ratio, rng=rng, data_bits=bits)
    p = os.path.join(tmp_path, "b2bi.iq")
    with open(p, "wb") as f:
        f.write(to_int8_iq(x, scale=1.0))
    return p, code


def test_b2bi_cli_recovers_code(tmp_path):
    fs = 22.0e6
    prn, doppler = 19, 800.0
    rng = np.random.default_rng(7)
    path, code = _make_b2bi_file(tmp_path, prn, fs, ms=100, doppler=doppler,
                                 rng=rng)
    chips_path = os.path.join(tmp_path, "track-chips.dat")
    env = dict(os.environ, GNSS_DSP_CPU="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "track-beidou-b2bi.py"),
         "--loop-dwells", "10,10", "--recover-warmup", "10",
         "--recover-file", chips_path,
         path, str(fs), "0", str(prn), str(doppler), "0"],
        capture_output=True, text=True, timeout=600, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    rows = out.stdout.strip().splitlines()
    assert len(rows) > 60                      # tracked to EOF

    bins = np.loadtxt(chips_path)
    assert bins.shape == (10230, 2)
    rec = np.where(bins[:, 0] >= 0, 1.0, -1.0)
    hit = bins[:, 0] != 0.0                    # bins never visited stay 0
    assert hit.mean() > 0.95
    agree = (rec[hit] == code[hit]).mean()
    # sign convention: the Costas/FLL loop may lock 180 deg out of phase,
    # recovering the inverted code (the reference has the same ambiguity)
    assert max(agree, 1.0 - agree) > 0.98
