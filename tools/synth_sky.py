"""Synthesize the 2017-04-27 3-band sky capture (VERDICT round-1 item 10).

The reference Makefile downloads a 7.9-minute 69.984 MHz 3-band recording
(Makefile:18-20) and demuxes it with the external `packet2wav_3ch` tool
(not shipped there either).  That multi-GB fetch is infeasible here (no
network), so this synthesizes a capture carrying every golden seed from
track-all-gnss-2017-L1L2L5.sh:9-25 — same PRNs, dopplers, code phases and
per-band carrier offsets — in the container format tools/packet2wav_3ch
demuxes (1 ms per-band frames, int8 interleaved I/Q).

    python tools/synth_sky.py out.pcap [ms]        # default 120 ms

The acquire-all.sh / track-all-gnss-2017-L1L2L5.sh workload scripts then
run against it unmodified (put tools/ on PATH for the demuxer).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnss_dsp_tpu.models import get_signal
from gnss_dsp_tpu.utils.synth import synth_iq

FS = 69.984e6
FRAME = int(FS // 1000)          # samples per band per 1 ms frame

# (band, signal, prn/chan, doppler Hz, code phase chips, carrier offset Hz)
# — the golden seeds of track-all-gnss-2017-L1L2L5.sh:9-25 at the
# acquire-all.sh:9-35 band offsets
SEEDS = [
    (1, "gps-l1",         21,  2400.0,  817.50,  -9334875.0),
    (1, "glonass-l1",     -3, -1200.0,  362.82,  17245125.0),
    (1, "galileo-e1b",    24,   250.0, 2838.00,  -9334875.0),
    (1, "beidou-b1i",     34,  -600.0,  562.20, -23656875.0),
    (2, "gps-l2cm",       29,  1120.0, 4208.80,   -127126.0),
    (2, "glonass-l2",     -2, -1800.0,  470.98,  18272874.0),
    (2, "glonass-l3ocd",   9, -1800.0, 9429.00, -25702126.0),
    (2, "galileo-e5bi",   24,   200.0, 7919.00, -20587126.0),
    (2, "beidou-b2i",     14,  -600.0, 1682.90, -20587126.0),
    (3, "gps-l5i",        25, -1600.0, 9696.00, -15191625.0),
    (3, "galileo-e5ai",   24,   200.0, 7919.00, -15191625.0),
]

SUBC = {"galileo-e1b": "cboc", "gps-l2cm": "rz_even"}


def synth_band(band: int, n: int, cn0: float, rng) -> np.ndarray:
    x = np.zeros(n, np.complex64)
    t = np.arange(n, dtype=np.float64)
    for b, name, prn, dop, cp, coff in SEEDS:
        if b != band:
            continue
        sig = get_signal(name)
        chan = prn if name.startswith("glonass-l") and sig.fdma_hz else 0
        s = synth_iq(sig.code_table((prn,))[0], sig.chip_rate, FS, n,
                     doppler_hz=dop + sig.fdma_hz * chan,
                     code_phase=cp, cn0_dbhz=None,
                     subcarrier=SUBC.get(name, "none"),
                     carrier_ratio=sig.track_carrier_ratio(chan),
                     code_doppler_hz=dop)
        x += (s * np.exp(2j * np.pi * coff / FS * t)).astype(np.complex64)
        print(f"  band {band}: {name} prn/chan {prn} dop {dop} "
              f"code {cp} @ {coff/1e6:+.3f} MHz")
    # one shared noise floor giving each unit-amplitude signal ~cn0 dB-Hz
    sigma = np.sqrt(FS / (2.0 * 10 ** (cn0 / 10.0)))
    x += (sigma * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)
    return x


def to_int8(x: np.ndarray, scale: float) -> np.ndarray:
    y = np.empty(2 * len(x), np.int8)
    y[0::2] = np.clip(np.round(x.real * scale), -127, 127).astype(np.int8)
    y[1::2] = np.clip(np.round(x.imag * scale), -127, 127).astype(np.int8)
    return y


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "gnss-sky-synth.pcap"
    ms = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    cn0 = float(sys.argv[3]) if len(sys.argv) > 3 else 50.0
    n = ms * FRAME
    rng = np.random.default_rng(20170427)
    sigma = np.sqrt(FS / (2.0 * 10 ** (cn0 / 10.0)))
    scale = 100.0 / (4.0 * sigma)     # noise 4-sigma at ~int8 100
    bands = [to_int8(synth_band(b, n, cn0, rng), scale) for b in (1, 2, 3)]
    with open(out, "wb") as f:
        for m in range(ms):
            for b in bands:
                f.write(b[2 * m * FRAME: 2 * (m + 1) * FRAME].tobytes())
    print(f"wrote {out}: {ms} ms x 3 bands @ {FS/1e6} MHz "
          f"({os.path.getsize(out)/1e6:.0f} MB), per-signal C/N0 ~{cn0} dB-Hz")


if __name__ == "__main__":
    main()
