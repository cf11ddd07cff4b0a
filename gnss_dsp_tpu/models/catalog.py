"""The signal catalog.  One entry per signal module in the reference
(SURVEY.md §2.3); parameters cite the reference acquire/track scripts.

Grows constellation by constellation; gps-l1 is the canonical exemplar.
"""

from __future__ import annotations

from gnss_dsp_tpu.models.signal import Signal, register
from gnss_dsp_tpu.models.codes import gps_ca


def _gps_ca_table(prns):
    return gps_ca.code_table(prns)


# GPS L1 C/A — acquire-gps-l1.py (fs 4.096 MHz, 1 ms coherent, no pad,
# ±7 kHz/200 doppler, PRN 1-32), track-gps-l1.py (ratio 1540 :44,
# E/L ±0.05 chips :46-48).
register(Signal(
    name="gps-l1",
    constellation="gps",
    chip_rate=gps_ca.chip_rate,
    code_length=gps_ca.code_length,
    code_table=_gps_ca_table,
    prn_all=gps_ca.PRNS,
    prn_default="1-32",
    acq_fs=4.096e6,
    acq_coherent_ms=1.0,
    acq_pad2=False,
    acq_lowpass_hz=1.5e6,
    doppler_default=(-7000.0, 7000.0, 200.0),
    carrier_ratio=1540.0,
    el_spacing=0.05,
))
