"""Bisect the fused acquisition search: time each stage standalone.

Stages (GPS L1 shapes: W=4096, P=32, D=70 in chunks of dc, B=80):
  mixfft : doppler mix + two-level forward FFT (XLA)
  kernel : the fused Pallas surface kernel alone (v1 or v2)
  reduce : peak/mean/argmax reductions on a precomputed q
  full   : grid_search end to end

Each timed with a lax.scan carrying a varying input (no licm), honest
host readback of a small reduced result.
"""

import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gnss_dsp_tpu.ops import cplx, fft, nco

W = 4096
P = 32
B = 80
DC = int(os.environ.get("DC", "14"))
BT = int(os.environ.get("BT", "40"))
K = int(os.environ.get("K", "20"))

rng = np.random.default_rng(0)
xb = cplx.from_numpy(rng.standard_normal((B, W)) + 1j * rng.standard_normal((B, W)))
w = cplx.from_numpy(np.exp(2j * np.pi * rng.standard_normal((DC, W)) * 0.01))
cf_nat = rng.standard_normal((P, W)) + 1j * rng.standard_normal((P, W))


def timeit(name, fn, *args):
    out = np.asarray(fn(*args))          # compile+warm
    best = np.inf
    for _ in range(4):
        t0 = time.perf_counter()
        out = np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / K * 1e3
    print(f"{name:22s} {per:8.3f} ms/iter   ({K} iters, readback {out.shape})")
    return per


def scanner(body):
    @jax.jit
    def run(xb0, xb1, w0, w1):
        def step(c, i):
            xs = (xb0 + c * 0, xb1)
            r = body(xs, (w0, w1))
            return c + 1e-12 * r, None
        c, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(K))
        return c
    return run


def mixfft_v2(n1):
    def body(xb_, w_):
        xw = cplx.cmul((xb_[0][None], xb_[1][None]), (w_[0][:, None], w_[1][:, None]))
        F = fft.fft_two_level_perm(xw, bf16=True, n1=n1)
        return jnp.sum(F[0].astype(jnp.float32)) + jnp.sum(F[1].astype(jnp.float32))
    return scanner(body)


def kernel_only(ver):
    if ver == "v2":
        from gnss_dsp_tpu.ops import pallas_acquire2 as pa
        n1, n2 = pa.plan_aligned(W)
        cfp = pa.permute_host2(cf_nat, n1, n2)
        surf = functools.partial(pa.corr_surface2, n1=n1, n2=n2, bt=BT)
    else:
        from gnss_dsp_tpu.ops import pallas_acquire as pa
        n1, n2 = pa.plan2(W)
        cfp = pa.permute_host(cf_nat)
        surf = functools.partial(pa.corr_surface, n1=n1, n2=n2, bt=BT)
    code_f = tuple(jnp.asarray(a.astype(np.float32)).astype(jnp.bfloat16)
                   for a in (cfp.real, cfp.imag))
    F = fft.fft_two_level_perm(
        cplx.cmul((xb[0][None], xb[1][None]), (w[0][:, None], w[1][:, None])),
        bf16=True, n1=(n1 if ver == "v2" else None))
    F = (F[0].astype(jnp.bfloat16), F[1].astype(jnp.bfloat16))

    @jax.jit
    def run(f0, f1):
        def step(c, i):
            q = surf((f0 + c.astype(jnp.bfloat16) * 0, f1), code_f)
            return c + 1e-12 * jnp.sum(q), None
        c, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(K))
        return c
    return run, (F[0], F[1])


def reduce_only():
    q0 = jnp.asarray(rng.standard_normal((P, DC, W)).astype(np.float32))

    @jax.jit
    def run(q):
        def step(c, i):
            qq = q + c
            peak = jnp.max(qq, axis=-1)
            ci = jnp.argmax(qq, axis=-1).astype(jnp.int32)
            metric = peak / jnp.mean(qq, axis=-1)
            return c + 1e-9 * (jnp.sum(metric) + jnp.sum(ci)), None
        c, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(K))
        return c
    return run, (q0,)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}  DC={DC} BT={BT} K={K}")
    from gnss_dsp_tpu.ops import pallas_acquire2 as pa2
    n1v2, _ = pa2.plan_aligned(W)

    timeit("mixfft (v2 split)", mixfft_v2(n1v2), xb[0], xb[1], w[0], w[1])
    run, a = kernel_only("v1")
    timeit("kernel v1", run, *a)
    run, a = kernel_only("v2")
    timeit("kernel v2", run, *a)
    run, a = reduce_only()
    timeit("reduce", run, *a)
