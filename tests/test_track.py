"""Tracking engine: synthetic-signal convergence tests."""

import io

import numpy as np

from gnss_dsp_tpu.models import get_signal
from gnss_dsp_tpu.models.codes import gps_ca
from gnss_dsp_tpu.track import TrackChannel, track_file
from gnss_dsp_tpu.utils import synth


def _make_stream(prn, fs, seconds, doppler, code_phase, cn0=47.0, seed=11):
    x = synth.synth_iq(
        gps_ca.ca_code(prn).astype(np.float64), 1023000.0, fs,
        int(fs * seconds), doppler_hz=doppler, code_phase=code_phase,
        cn0_dbhz=cn0, rng=np.random.default_rng(seed), amplitude=8.0,
        carrier_ratio=1540.0,
    )
    return io.BytesIO(synth.to_int8_iq(x, scale=1.0))


def test_gps_l1_tracking_converges():
    sig = get_signal("gps-l1")
    fs = 4.096e6
    prn, doppler, code_phase = 21, 1200.0, 300.0
    fp = _make_stream(prn, fs, 1.0, doppler, code_phase)

    ch = TrackChannel(prn=prn, doppler=doppler + 40.0, code_offset=code_phase)
    track_file(sig, fp, fs, coffset=0.0, channels=[ch],
               loop_dwells=(100, 100), chunk_ms=500.0)

    rows = ch.rows
    assert len(rows) > 900
    tail = rows[-200:]
    cf = np.array([r["carrier_f"] for r in tail])
    # FLL+PLL pulls the carrier estimate to the true doppler
    assert abs(np.median(cf) - doppler) < 5.0
    # code frequency stays near nominal
    code_f_off = np.array([r["code_f_offset"] for r in tail])
    assert np.all(np.abs(code_f_off) < 50.0)
    # prompt sits on the correlation peak: at 0.05-chip spacing the
    # triangle autocorrelation gives E ~= L ~= 0.95 P, and the DLL nulls
    # the early/late imbalance
    pr = np.median([r["prompt"] for r in tail])
    el = np.median([max(r["early"], r["late"]) for r in tail])
    assert pr > 1.01 * el
    eml = np.median([(r["late"] - r["early"]) / (r["late"] + r["early"])
                     for r in tail])
    assert abs(eml) < 0.05
    # PLL locks: prompt power concentrates in I
    p_re = np.median(np.abs([r["p_re"] for r in tail]))
    p_im = np.median(np.abs([r["p_im"] for r in tail]))
    assert p_re > 3.0 * p_im
    # bookkeeping: samples consumed per block stay near one code period
    ns = np.diff([r["samp"] for r in tail])
    assert np.all((ns > fs * 0.0004) & (ns <= fs * 0.0016))


def test_two_channel_batched_tracking():
    """Two PRNs in one stream, tracked in one batched engine call."""
    sig = get_signal("gps-l1")
    fs = 4.096e6
    n = int(fs * 0.5)
    rng = np.random.default_rng(5)
    x = (
        synth.synth_iq(gps_ca.ca_code(3).astype(np.float64), 1023000.0, fs, n,
                       doppler_hz=800.0, code_phase=100.0, cn0_dbhz=None,
                       amplitude=8.0, carrier_ratio=1540.0)
        + synth.synth_iq(gps_ca.ca_code(17).astype(np.float64), 1023000.0, fs, n,
                         doppler_hz=-2500.0, code_phase=700.0, cn0_dbhz=47.0,
                         rng=rng, amplitude=8.0, carrier_ratio=1540.0)
    )
    fp = io.BytesIO(synth.to_int8_iq(x, scale=1.0))
    chans = [
        TrackChannel(prn=3, doppler=800.0, code_offset=100.0),
        TrackChannel(prn=17, doppler=-2500.0, code_offset=700.0),
    ]
    track_file(sig, fp, fs, 0.0, chans, loop_dwells=(50, 50), chunk_ms=250.0)
    for ch, dop in zip(chans, (800.0, -2500.0)):
        tail = ch.rows[-100:]
        assert len(ch.rows) > 400
        cf = np.median([r["carrier_f"] for r in tail])
        assert abs(cf - dop) < 5.0
