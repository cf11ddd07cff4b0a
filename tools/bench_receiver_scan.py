"""Device-only A/B of the single-program receiver scan vs per-band
programs (round 5): no file I/O, no tunnel — x is jax-PRNG noise, so
the kernel does identical per-channel work while we time ONLY the scan.

Configs (the 2017 receiver at 69.984 MHz):
  per-band : band1 C=4 (W128 envelope), band2 C=5->pad8 (W512),
             band3 C=2->pad4 (W512)     — three programs, summed
  one-prog : all 11 -> pad12 in one program (W512 envelope)
  one-bpsk : 12 BPSK-only channels (W128) — isolates the W/R effect

Usage: python tools/bench_receiver_scan.py [NB]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from gnss_dsp_tpu.models import get_signal
from gnss_dsp_tpu.ops import nco
from gnss_dsp_tpu.track.driver import build_code_rows, make_params
from gnss_dsp_tpu.track.engine import (
    init_state, sigp_row, subc_kind, track_scan,
)
from gnss_dsp_tpu.utils.twofloat import tf_from_f64

FS = 69.984e6

BANDS = {
    1: [("gps-l1", 21), ("glonass-l1", -3), ("galileo-e1b", 24),
        ("beidou-b1i", 34)],
    2: [("gps-l2cm", 29), ("glonass-l2", -2), ("glonass-l3ocd", 9),
        ("galileo-e5bi", 24), ("beidou-b2i", 14)],
    3: [("gps-l5i", 25), ("galileo-e5ai", 24)],
}


def setup(specs, NB):
    """One scan program for `specs` = [(signal, prn)] (padded to 4)."""
    pad = (-len(specs)) % 4
    specs = specs + [specs[0]] * pad
    sigs = [get_signal(nm) for nm, _ in specs]
    C = len(specs)
    alls = [make_params(s, FS, 0.0, (200, 200), use_pallas=True)
            for s in sigs]
    params = alls[0]._replace(
        nmax=max(q.nmax for q in alls),
        pallas_tiles=max(q.pallas_tiles for q in alls),
        pallas_w=max(q.pallas_w for q in alls),
        pallas_stream=False, fused_scan=True, pallas_v2=True)

    def _row(s):
        hi, lo = tf_from_f64(np.float64(s.chip_rate) / np.float64(FS))
        return sigp_row(hi, lo, s.el_spacing, s.code_length,
                        FS * 0.001 * s.code_period_ms, s.sub_blocks,
                        str(s.subcarrier))

    sigp = jnp.asarray(np.stack([_row(s) for s in sigs]))
    kinds = {subc_kind(str(s.subcarrier)) for s in sigs}
    kind = "subc" if kinds - {"none"} else "none"
    params = params._replace(
        coffset_df_fixed=0, carrier_ratio=1.0, chip_rate=0.0,
        cf_hi=0.0, cf_lo=0.0, code_length=0, el_spacing=0.0,
        code_period_ms=0.0, sub=0, subcarrier=kind)
    tabs = [np.asarray(s.code_table((p,))[0], np.int8)
            for s, (_, p) in zip(sigs, specs)]
    Lmax = max(t.shape[0] for t in tabs)
    code_np = np.zeros((C, Lmax), np.int8)
    for k, t in enumerate(tabs):
        code_np[k, : t.shape[0]] = t
    per = [build_code_rows(tabs[k][None, :], params,
                           sigs[k].chip_rate / FS) for k in range(C)]
    wmax = max(p[0].shape[1] for p in per)
    rows = np.zeros((C, wmax), np.float32)
    for k, (r, _) in enumerate(per):
        rows[k, : r.shape[1]] = r[0]
    pad_extra = max(p[1] for p in per)
    n = int(NB * FS * 0.001) + pad_extra
    n += (-n) % 1024
    key = jax.random.PRNGKey(0)
    xd = (jax.random.normal(key, (n,), jnp.float32),
          jax.random.normal(key, (n,), jnp.float32))
    st = init_state(code_p=np.zeros(C), code_f_off=np.zeros(C),
                    carrier_p=np.zeros(C),
                    carrier_f=np.full(C, 1000.0), ptr=np.zeros(C, np.int32))
    kw = dict(ratios=jnp.asarray(
        [s.track_carrier_ratio(p) for s, (_, p) in zip(sigs, specs)],
        jnp.float32).astype(jnp.float32),
        code_rows_ext=jnp.asarray(rows),
        coffset_df=jnp.asarray(
            [nco.freq_to_fixed(-(s.fdma_hz or 0.0) * p / FS)
             for s, (_, p) in zip(sigs, specs)], jnp.int32),
        sigp=sigp)
    return xd, code_np, st, params, kw, C, params.pallas_w, kind


def run_one(label, specs, NB, reps=3, quiet=False):
    xd, code_np, st, params, kw, C, W, kind = setup(specs, NB)
    tab = jnp.asarray(code_np)
    n_len = jnp.int32(xd[0].shape[0])
    _, rf, ri = track_scan(xd, n_len, tab, st, params, NB, **kw)
    np.asarray(rf)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        _, rf, ri = track_scan(xd, n_len, tab, st, params, NB, **kw)
        rf = np.asarray(rf)
        best = min(best, time.perf_counter() - t0)
    samples = float(np.asarray(ri)[..., 0].sum())
    if not quiet:
        print(f"{label:22s} C={C:2d} W={W:4d} kind={kind:5s} NB={NB} "
              f"{best*1e3:8.1f} ms  {samples/best/1e6:7.0f} Msamples/s",
              flush=True)
    return best


def main():
    NB = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    tot = 0.0
    for b, specs in BANDS.items():
        tot += run_one(f"band{b} ({len(specs)} ch)", list(specs), NB)
    print(f"{'3 programs total':22s} {'':22s} {tot*1e3:8.1f} ms")
    allspecs = [s for b in (1, 2, 3) for s in BANDS[b]]
    run_one("one-program (11->12)", allspecs, NB)
    run_one("one-bpsk x12 (W128)",
            [("gps-l1", 1 + k) for k in range(12)], NB)


if __name__ == "__main__":
    main()
