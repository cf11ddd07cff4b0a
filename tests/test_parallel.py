"""Mesh twins vs single-device engines on the 8-virtual-device CPU mesh
(VERDICT round-1 item 8: sharded FDMA + serial search)."""

from __future__ import annotations

import numpy as np

from gnss_dsp_tpu.models import get_signal
from gnss_dsp_tpu.utils.synth import synth_iq


def make_iq(sig, prn, fs, ms, doppler, code_phase, cn0=None, chan=0):
    code = sig.code_table((prn,))[0]
    n = int(fs * ms / 1000.0)
    return synth_iq(
        code, sig.chip_rate, fs, n, doppler_hz=doppler + sig.fdma_hz * chan,
        code_phase=code_phase, cn0_dbhz=cn0,
        carrier_ratio=sig.track_carrier_ratio(chan),
        code_doppler_hz=doppler,
    )


def test_fdma_sharded_matches_single():
    """All 15 GLONASS L1 channels: channel-sharded mesh program equals the
    single-device all-channel grid program."""
    from gnss_dsp_tpu.acquire.engine import acquire_signal_fdma
    from gnss_dsp_tpu.parallel.acquire import acquire_signal_fdma_sharded
    from gnss_dsp_tpu.parallel.mesh import make_mesh

    import dataclasses
    sig = dataclasses.replace(get_signal("glonass-l1"), acq_fs=2.048e6)
    chans = list(range(-7, 8))
    ms = 8
    x = make_iq(sig, 0, sig.acq_fs, ms + 4, 1500.0, 100.0, chan=-3,
                cn0=45.0)
    kw = dict(doppler_search=(500.0, 2500.0, 250.0), ms=ms)
    single = acquire_signal_fdma(sig, x, chans, **kw)
    mesh = make_mesh(8)
    sharded = acquire_signal_fdma_sharded(sig, x, chans, mesh, **kw)
    assert len(single) == len(sharded) == 15
    for a, b in zip(single, sharded):
        assert a.prn == b.prn
        assert a.doppler == b.doppler, (a, b)
        assert a.code_offset == b.code_offset, (a, b)
        np.testing.assert_allclose(a.metric, b.metric, rtol=1e-5)
    # the planted channel wins
    best = max(sharded, key=lambda r: r.metric)
    assert best.prn == -3 and abs(best.doppler - 1500.0) <= 250.0


def test_serial_sharded_matches_single():
    """L2CL 75-hypothesis assisted search, hypotheses sharded over all 8
    devices: same winner and per-hypothesis metric as single-device."""
    from gnss_dsp_tpu.acquire.serial import serial_search
    from gnss_dsp_tpu.parallel.acquire import serial_search_sharded
    from gnss_dsp_tpu.parallel.mesh import make_mesh

    sig = get_signal("gps-l2cl")
    fs = 2.048e6
    k_true = 31
    phase = float((k_true * 10230 + 1234.0) % sig.code_length)
    x = make_iq(sig, 5, fs, 44, 250.0, phase)
    single = serial_search(sig, x, 5, 250.0, parent_code_phase=1234.0,
                           fs=fs, ms=40)
    mesh = make_mesh(8)
    sharded = serial_search_sharded(sig, x, 5, 250.0,
                                    parent_code_phase=1234.0, fs=fs,
                                    mesh=mesh, ms=40, k_chunk=5)
    assert sharded.k == single.k == k_true
    assert sharded.code_offset == single.code_offset
    np.testing.assert_allclose(sharded.metric, single.metric, rtol=1e-5)


def test_serial_sharded_glonass_p():
    """GLONASS P 1000 hypotheses sharded; exact-k recovery."""
    from gnss_dsp_tpu.parallel.acquire import serial_search_sharded
    from gnss_dsp_tpu.parallel.mesh import make_mesh

    sig = get_signal("glonass-l1-p")
    fs = 4.096e6
    k_true = 417
    ca_phase = 33.0
    phase = float((k_true * 5110 + 10 * ca_phase) % sig.code_length)
    x = make_iq(sig, 0, fs, 16, -700.0, phase, chan=2)
    r = serial_search_sharded(sig, x, 0, -700.0, parent_code_phase=ca_phase,
                              fs=fs, mesh=make_mesh(8), ms=12, chan=2)
    assert r.k == k_true, (r.k, k_true)
    assert abs(r.code_offset - phase) < 1e-6
