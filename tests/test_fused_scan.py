"""Whole-loop fused tracking kernel (ops/pallas_track_fused) vs the
step-scan engine: same rows, same state, on the CPU backend in pallas
interpret mode (GNSS_DSP_PALLAS_INTERPRET).

Both paths share the v2 correlator math (pallas_track2.tile_contrib) and
the loop-filter formulas, so rows should agree to f32 rounding; the only
divergence source is op-scheduling noise, covered by a tight tolerance.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gnss_dsp_tpu.models import get_signal
from gnss_dsp_tpu.models.codes import gps_ca
from gnss_dsp_tpu.track.driver import make_params
from gnss_dsp_tpu.track.engine import init_state, track_scan
from gnss_dsp_tpu.ops import pallas_track as ptk
from gnss_dsp_tpu.utils import synth


def _setup(fs, prns, dops, phases, seconds=0.06, coffset=1250.0,
           signame="gps-l1", coherent_blocks=1):
    sig = get_signal(signame)
    n = int(fs * seconds)
    code_f64 = sig.code_table(tuple(prns)).astype(np.float64)
    x = sum(
        synth.synth_iq(code_f64[i], sig.chip_rate,
                       fs, n, doppler_hz=d, code_phase=cp, cn0_dbhz=None,
                       carrier_ratio=sig.track_carrier_ratio(p),
                       subcarrier=sig.subcarrier)
        for i, (p, d, cp) in enumerate(zip(prns, dops, phases))
    )
    # place the scene at a nonzero carrier offset so the fused kernel's
    # in-kernel coffset DDS (int32 wraparound path) is exercised
    x = x * np.exp(2j * np.pi * coffset / fs * np.arange(n))
    params = make_params(sig, fs, coffset=coffset, loop_dwells=(8, 8),
                         use_pallas=True, chan=prns[0],
                         coherent_blocks=coherent_blocks)
    assert params.fused_scan and params.pallas_v2
    C = len(prns)
    code_np = sig.code_table(tuple(prns)).astype(np.int8)
    from gnss_dsp_tpu.track.driver import build_code_rows
    rows_np, pad = build_code_rows(code_np, params, sig.chip_rate / fs)
    rows_ext = jnp.asarray(rows_np)
    tail = pad + (-(n + pad)) % 1024
    xp = np.concatenate([x, np.zeros(tail, np.complex64)])
    xd = (jnp.asarray(xp.real.astype(np.float32)),
          jnp.asarray(xp.imag.astype(np.float32)))
    st = init_state(code_p=list(phases), code_f_off=[0.0] * C,
                    carrier_p=[0.0] * C, carrier_f=list(dops))
    tab = jnp.asarray(code_np)
    ratios = jnp.asarray([sig.track_carrier_ratio(p) for p in prns],
                         dtype=jnp.float32)
    from gnss_dsp_tpu.ops import nco as _nco
    cdf = jnp.asarray(
        [_nco.freq_to_fixed(-(coffset + (sig.fdma_hz or 0.0) * p) / fs)
         for p in prns], jnp.int32)
    return params, xd, n, tab, st, rows_ext, ratios, cdf


def _run(params, xd, chunk_len, tab, st, rows_ext, ratios, cdf, nb,
         overlay=None):
    st2, rf, ri = track_scan(xd, jnp.int32(chunk_len), tab, st, params, nb,
                             ratios=ratios, code_rows_ext=rows_ext,
                             coffset_df=cdf, overlay=overlay)
    return st2, np.asarray(rf), np.asarray(ri)


@pytest.mark.parametrize("C", [1, 2, 4])
def test_fused_matches_scan(C, monkeypatch):
    monkeypatch.setenv("GNSS_DSP_PALLAS_INTERPRET", "1")
    fs = 2.048e6
    prns = [7, 13, 21, 30][:C]
    dops = [900.0, -2200.0, 350.0, -40.0][:C]
    phases = [5.0, 417.25, 1010.5, 88.0][:C]
    params, xd, n, tab, st, rows_ext, ratios, cdf = _setup(
        fs, prns, dops, phases)
    nb = 40
    st_a, rf_a, ri_a = _run(params._replace(fused_scan=False), xd, n, tab,
                            st, rows_ext, ratios, cdf, nb)
    st_b, rf_b, ri_b = _run(params, xd, n, tab, st, rows_ext, ratios, cdf,
                            nb)
    np.testing.assert_array_equal(ri_a, ri_b)
    np.testing.assert_allclose(rf_a, rf_b, rtol=2e-5, atol=2e-4)
    for name in ("ptr", "block", "coffset_p", "stalled"):
        np.testing.assert_array_equal(np.asarray(getattr(st_a, name)),
                                      np.asarray(getattr(st_b, name)), name)
    for name in ("code_p_hi", "code_p_lo", "code_f_off", "carrier_p",
                 "carrier_f", "prompt1_re", "prompt1_im", "carrier_e1",
                 "code_e1"):
        np.testing.assert_allclose(np.asarray(getattr(st_a, name)),
                                   np.asarray(getattr(st_b, name)),
                                   rtol=2e-5, atol=2e-4, err_msg=name)


def test_fused_matches_scan_coherent(monkeypatch):
    """Extended-coherent mode (coh_blocks = 4, overlay wipe + gated loop
    filter): the fused kernel's in-kernel cacc accumulator and boundary
    gating must reproduce the scan engine's rows and state exactly —
    including the carried cacc across two chunk launches."""
    monkeypatch.setenv("GNSS_DSP_PALLAS_INTERPRET", "1")
    fs = 2.048e6
    prns = [7, 13]
    dops = [900.0, -2200.0]
    phases = [5.0, 417.25]
    M = 4
    params, xd, n, tab, st, rows_ext, ratios, cdf = _setup(
        fs, prns, dops, phases, coherent_blocks=M)
    assert params.coh_blocks == M and params.fused_scan
    ovl = jnp.asarray(np.stack([
        np.array([1, 1, -1, 1, -1, -1, 1, 1], np.float32),
        np.roll(np.array([1, -1, -1, 1, 1, 1, -1, 1], np.float32), -3),
    ]))
    nb = 22
    st_a, rf_a, ri_a = _run(params._replace(fused_scan=False), xd, n, tab,
                            st, rows_ext, ratios, cdf, nb, overlay=ovl)
    st_b, rf_b, ri_b = _run(params, xd, n, tab, st, rows_ext, ratios, cdf,
                            nb, overlay=ovl)
    np.testing.assert_array_equal(ri_a, ri_b)
    np.testing.assert_allclose(rf_a, rf_b, rtol=2e-5, atol=2e-4)
    for name in ("ptr", "block", "stalled"):
        np.testing.assert_array_equal(np.asarray(getattr(st_a, name)),
                                      np.asarray(getattr(st_b, name)), name)
    for name in ("code_p_hi", "code_f_off", "carrier_f", "carrier_e1",
                 "code_e1", "cacc", "prompt1_re", "prompt1_im"):
        np.testing.assert_allclose(np.asarray(getattr(st_a, name)),
                                   np.asarray(getattr(st_b, name)),
                                   rtol=2e-5, atol=2e-4, err_msg=name)
    # carry the coherent accumulator across a SECOND launch (a mid-
    # period chunk boundary: nb=22 leaves cacc two blocks into period 6)
    assert float(np.abs(np.asarray(st_a.cacc)).max()) > 0.0
    st_a2, rf_a2, _ = _run(params._replace(fused_scan=False), xd, n, tab,
                           st_a, rows_ext, ratios, cdf, 10, overlay=ovl)
    st_b2, rf_b2, _ = _run(params, xd, n, tab, st_b, rows_ext, ratios,
                           cdf, 10, overlay=ovl)
    np.testing.assert_allclose(rf_a2, rf_b2, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(st_a2.cacc),
                               np.asarray(st_b2.cacc),
                               rtol=2e-5, atol=2e-4)


# (signal, fs, prns/chans, dopplers, code phases, n_sub_blocks):
# every engine-shape family the round-4 fused kernel widened into —
# subcarriers (cboc/tmboc/boc11/rz_even/rz_odd), sub-divided periods
# (x4/x10/x20/x1500/x1000, track-galileo-e1b.py:164-170 etc.), and the
# HBM-streamed long codes (L2CL 767250 chips, GLONASS P 5.11M chips)
_FAMILIES = [
    ("galileo-e1b", 2.048e6, [11, 24], [700.0, -1500.0],
     [100.0, 2047.3], 24),
    ("gps-l1cp", 2.048e6, [9], [400.0], [5000.6], 22),
    ("gps-l1cd", 2.048e6, [3], [-250.0], [17.0], 22),
    ("gps-l2cm", 2.048e6, [29], [900.0], [5111.2], 22),
    ("gps-l2cl", 2.048e6, [29], [900.0], [700000.4], 20),
    ("glonass-l1-p", 4.096e6, [0], [1200.0], [2555000.7], 16),
]


@pytest.mark.parametrize("signame,fs,prns,dops,phases,nb", _FAMILIES,
                         ids=[f[0] for f in _FAMILIES])
def test_fused_matches_scan_families(signame, fs, prns, dops, phases, nb,
                                     monkeypatch):
    monkeypatch.setenv("GNSS_DSP_PALLAS_INTERPRET", "1")
    params, xd, n, tab, st, rows_ext, ratios, cdf = _setup(
        fs, prns, dops, phases, signame=signame)
    sig = get_signal(signame)
    assert params.sub == sig.sub_blocks
    assert params.pallas_stream == (sig.code_length > 100_000)
    st_a, rf_a, ri_a = _run(params._replace(fused_scan=False), xd, n, tab,
                            st, rows_ext, ratios, cdf, nb)
    st_b, rf_b, ri_b = _run(params, xd, n, tab, st, rows_ext, ratios, cdf,
                            nb)
    assert (ri_a[:, :, 0] > 0).all()          # no channel stalled mid-test
    np.testing.assert_array_equal(ri_a, ri_b)
    np.testing.assert_allclose(rf_a, rf_b, rtol=2e-5, atol=2e-4)
    for name in ("ptr", "block", "coffset_p", "stalled", "n_full", "sub_j"):
        np.testing.assert_array_equal(np.asarray(getattr(st_a, name)),
                                      np.asarray(getattr(st_b, name)), name)
    for name in ("code_p_hi", "code_p_lo", "code_f_off", "carrier_p",
                 "carrier_f", "prompt1_re", "prompt1_im", "carrier_e1",
                 "code_e1"):
        np.testing.assert_allclose(np.asarray(getattr(st_a, name)),
                                   np.asarray(getattr(st_b, name)),
                                   rtol=2e-5, atol=2e-4, err_msg=name)


def test_fused_stall_refill_matches_scan(monkeypatch):
    """Mid-scan chunk exhaustion: the fused kernel freezes the channel
    (NaN rows, stalled latched) exactly like the scan engine, and the
    refill continues bit-compatibly."""
    monkeypatch.setenv("GNSS_DSP_PALLAS_INTERPRET", "1")
    fs = 2.048e6
    params, xd, n, tab, st, rows_ext, ratios, cdf = _setup(
        fs, [7], [900.0], [5.0])
    nb = 40
    short = int(fs * 0.020)
    # full-run oracle on the scan path
    _, rf_a, ri_a = _run(params._replace(fused_scan=False), xd, n, tab, st,
                         rows_ext, ratios, cdf, nb)
    st1, rf_1, ri_1 = _run(params, xd, short, tab, st, rows_ext, ratios,
                           cdf, nb)
    n1 = int((ri_1[:, 0, 0] > 0).sum())
    assert 15 <= n1 < 25, n1
    assert bool(np.asarray(st1.stalled)[0])
    assert np.isnan(rf_1[n1:, :, 0]).all()
    st1 = st1._replace(stalled=jnp.zeros_like(st1.stalled))
    _, rf_2, ri_2 = _run(params, xd, n, tab, st1, rows_ext, ratios, cdf,
                         nb - n1)
    np.testing.assert_allclose(rf_a[:n1], rf_1[:n1], rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(rf_a[n1:], rf_2, rtol=2e-5, atol=2e-4)
    np.testing.assert_array_equal(ri_a[n1:], ri_2)


def test_fused_coherent_sharded_matches_single(monkeypatch):
    """Extended-coherent tracking under the mesh: overlay rides the
    fused shard_map branch (parallel/track) — rows and state bit-equal
    to the single-device fused coherent run."""
    monkeypatch.setenv("GNSS_DSP_PALLAS_INTERPRET", "1")
    from gnss_dsp_tpu.parallel.mesh import make_mesh
    from gnss_dsp_tpu.parallel.track import track_scan_sharded

    fs = 2.048e6
    prns = [7, 13]
    dops = [900.0, -2200.0]
    phases = [5.0, 417.25]
    M = 4
    params, xd, n, tab, st, rows_ext, ratios, cdf = _setup(
        fs, prns, dops, phases, coherent_blocks=M)
    ovl = jnp.asarray(np.stack([
        np.array([1, 1, -1, 1, -1, -1, 1, 1], np.float32),
        np.roll(np.array([1, -1, -1, 1, 1, 1, -1, 1], np.float32), -3),
    ]))
    st_a, rf_a, ri_a = _run(params, xd, n, tab, st, rows_ext, ratios,
                            cdf, 20, overlay=ovl)
    mesh = make_mesh(2, time_shards=1)
    st_b, rf_b, ri_b = track_scan_sharded(
        mesh, xd, jnp.int32(n), tab, st, params, 20, ratios=ratios,
        coffset_df=cdf, code_rows_ext=rows_ext, overlay=ovl)
    np.testing.assert_array_equal(rf_a, np.asarray(rf_b))
    np.testing.assert_array_equal(ri_a, np.asarray(ri_b))
    for name in st_a._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(st_a, name)),
            np.asarray(getattr(st_b, name)), err_msg=name)
