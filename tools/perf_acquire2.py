"""Compare acquisition engines on the real chip: XLA path, fused v1,
fused v2 (surface out), fused v2 (in-kernel reduction), sweeping the
doppler chunk.

Timing: K async dispatches, one readback at the end (the tunnel charges
a flat ~30 ms per host readback; device execution is in-order, so the
amortized per-search time is the true chip throughput).

Workload = bench.py's GPS L1 sky search (32 PRN x 70 dop x 4096 x 80 blk).
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gnss_dsp_tpu.models import get_signal
from gnss_dsp_tpu.acquire import engine as eng
from gnss_dsp_tpu.ops import cplx
from bench import synth_sky

K = int(os.environ.get("K", "8"))


def run_case(sig_name, prn_count, dop_cfg, ms, dop_chunks, modes):
    sig = get_signal(sig_name)
    prns = tuple(range(1, prn_count + 1))
    fs = sig.acq_fs
    n = int(round(sig.acq_fs * sig.acq_coherent_ms / 1000.0))
    window = 2 * n if (sig.acq_pad2 or sig.acq_sliding) else n
    x = synth_sky(sig, fs, (ms + 1) * n)
    dops, fixed = eng.doppler_grid(sig, dop_cfg)
    D = len(dops)
    cf_nat = eng.build_code_ffts(sig, prns, n, window)
    xs = cplx.from_numpy(x)
    cells = len(prns) * D * window * ms

    print(f"== {sig_name}: W={window} P={len(prns)} D={D} B={ms}  K={K}")
    for mode in modes:
        if mode.startswith("v2"):
            from gnss_dsp_tpu.ops import pallas_acquire2 as pa2
            try:
                n1, n2 = pa2.plan_aligned(window)
            except ValueError:
                print(f"  {mode}: no aligned split for {window}")
                continue
            cf = cplx.from_numpy(pa2.permute_host2(cf_nat, n1, n2))
            plan = ("v2", n1, n2)
            bt = pa2.pick_bt(window, ms)
        elif mode == "v1":
            from gnss_dsp_tpu.ops import pallas_acquire as pa
            n1, n2 = pa.plan2(window)
            cf = cplx.from_numpy(pa.permute_host(cf_nat))
            plan = ("v1", n1, n2)
            bt = max(1, min(ms, 40, (1 << 20) // (window * 4)))
        else:
            cf = cplx.from_numpy(cf_nat)
            plan, bt = None, 0
        for dc in dop_chunks:
            Dp = -(-D // dc) * dc
            fixed_p = np.zeros(Dp, np.int64)
            fixed_p[:D] = fixed
            valid = np.zeros(Dp, bool)
            valid[:D] = True
            fj, vj = jnp.asarray(fixed_p), jnp.asarray(valid)
            try:
                kw = dict(n=n, window=window, blocks=ms, peak_mean=True,
                          dop_chunk=dc, fused=plan, fused_bt=bt,
                          precision=jax.lax.Precision.DEFAULT,
                          bf16=(plan is None))
                out = tuple(np.asarray(o) for o in
                            eng.grid_search(xs, cf, fj, vj, **kw))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(K):
                        o = eng.grid_search(xs, cf, fj, vj, **kw)
                    out = tuple(np.asarray(v) for v in o)
                    best = min(best, (time.perf_counter() - t0) / K)
                top = set(np.argsort(out[0])[-3:] + 1)
                print(f"  {mode:7s} dc={dc:3d} bt={bt:3d}"
                      f"  {best*1e3:8.1f} ms  {cells/best/1e9:7.2f} Gcells/s"
                      f"  top={sorted(top)}")
            except Exception as e:
                msg = str(e).split(chr(10))[0][:100]
                print(f"  {mode:7s} dc={dc:3d} bt={bt:3d}  FAIL {msg}")


if __name__ == "__main__":
    import sys
    print("backend:", jax.default_backend())
    which = sys.argv[1] if len(sys.argv) > 1 else "gps-l1"
    if which == "gps-l1":
        run_case("gps-l1", 32, (-7000.0, 7000.0, 200.0), 80,
                 dop_chunks=(14, 35, 70),
                 modes=("v2", "v1", "xla"))
    elif which == "beidou-b1i":
        run_case("beidou-b1i", 37, (-5000.0, 5000.0, 100.0), 80,
                 dop_chunks=(10, 25, 50),
                 modes=("v2", "v1"))
