"""Long-code tracking on the real chip: HBM-streamed Pallas correlator vs
the XLA gather path on the same synthetic stream (GLONASS P 5.11M chips,
L2CL 767250 — the codes the round-1 800k VMEM gate excluded).

Run from the repo root on TPU: python tools/check_stream_track.py
"""

import io as _io
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnss_dsp_tpu.models import get_signal
from gnss_dsp_tpu.track.driver import TrackChannel, track_file, make_params
from gnss_dsp_tpu.utils.synth import synth_iq, to_int8_iq


def run(name, prn, fs, ms, max_blocks, chan=0):
    sig = get_signal(name)
    code = sig.code_table((prn,))[0].astype(np.float64)
    # code_offset near the period end: the driver (like the reference,
    # track-gps-l1.py:141-143) discards samples to the first code boundary
    # — for a 1.5 s L2CL / 1 s GLONASS-P period that must stay << ms
    doppler, cp0 = 1200.0, float(int(sig.code_length * 0.97))
    x = synth_iq(code, sig.chip_rate, fs, int(fs * ms / 1000.0),
                 doppler_hz=doppler, code_phase=cp0, cn0_dbhz=55.0,
                 subcarrier=sig.subcarrier,
                 carrier_ratio=sig.track_carrier_ratio(chan))
    raw = to_int8_iq(x, scale=24.0)

    rows = {}
    for label, env in (("pallas", None), ("xla", "1")):
        if env:
            os.environ["GNSS_DSP_NO_PALLAS"] = env
        else:
            os.environ.pop("GNSS_DSP_NO_PALLAS", None)
        p = make_params(sig, fs, 0.0)
        ch = TrackChannel(prn=prn, doppler=doppler + 10.0, code_offset=cp0)
        track_file(sig, _io.BytesIO(raw), fs, 0.0, [ch],
                   loop_dwells=(150, 100), max_blocks=max_blocks)
        rows[label] = ch.rows
        print(f"  {name} [{label}] use_pallas={p.use_pallas} "
              f"stream={p.pallas_stream} rows={len(ch.rows)} "
              f"cf_tail={np.mean([r['carrier_f'] for r in ch.rows[-20:]]):.2f}")
    os.environ.pop("GNSS_DSP_NO_PALLAS", None)

    a, b = rows["pallas"], rows["xla"]
    assert len(a) == len(b), (len(a), len(b))
    # the kernel's bf16 one-hot rounds ~1e-3 differently than the XLA f32
    # gather; fed back through FLL/DLL state for hundreds of blocks the
    # rows diverge chaotically, so row-wise equality only holds early —
    # lock quality is the real contract (both must converge to truth)
    scale = max(abs(r["prompt"]) for r in b)
    worst = 0.0
    for ra, rb in zip(a[:40], b[:40]):
        for k in ("p_re", "p_im", "early", "prompt", "late"):
            worst = max(worst, abs(ra[k] - rb[k]) / scale)
    cfa = np.mean([r["carrier_f"] for r in a[-20:]])
    cfb = np.mean([r["carrier_f"] for r in b[-20:]])
    assert abs(cfa - doppler) < 8.0, cfa
    assert abs(cfb - doppler) < 8.0, cfb
    print(f"  {name}: first-40-row worst correlator diff {worst:.2e} of "
          f"prompt scale; locks {cfa:.2f} / {cfb:.2f} Hz (true {doppler})")
    assert worst < 2e-2, worst


if __name__ == "__main__":
    print("L2CL (767250 chips, 1500 sub-blocks):")
    run("gps-l2cl", 29, 4.096e6, 700, 600)
    print("GLONASS L1 P (5.11M chips, 1000 sub-blocks):")
    run("glonass-l1-p", 0, 8.192e6, 700, 600)
    print("OK")
