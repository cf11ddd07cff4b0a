"""Isolate the fixed per-call cost of a Pallas kernel inside lax.scan when
its scalar-prefetch operand is loop-carried (data-dependent on the
previous call's output), vs constant.

Variants:
  const      si constant across steps, dynamic index map
  carry_dyn  si carried + used in the index map  (the tracking-engine case)
  carry_stat si carried but index map ignores it (isolates operand carry)
  carry_noop si carried, but through a cheap XLA op chain only (no kernel
             output feedback) -- isolates "feedback through kernel output"
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
C, NT = int(os.environ.get("PROBE_C", 8)), int(os.environ.get("PROBE_NT", 4))
K = 300


def make_call(dyn_idx: bool):
    def kern(si_ref, x_ref, o_ref):
        c = pl.program_id(0)
        j = pl.program_id(1)
        o_ref[0, 0, :] = jnp.zeros((128,), jnp.float32) + jnp.sum(x_ref[0, :])

    if dyn_idx:
        imap = lambda c, j, si: (0, si[c, 0] // TILE + j)
    else:
        imap = lambda c, j, si: (0, j)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C, NT),
            in_specs=[pl.BlockSpec((1, TILE), imap,
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, 128), lambda c, j, si: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((C, 1, 128), jnp.float32),
    )


x = jnp.asarray(np.random.default_rng(0)
                .standard_normal((1, 64 * TILE)).astype(np.float32))
si0 = jnp.asarray((np.arange(C, dtype=np.int32) * TILE)[:, None])
MOD = 48 * TILE


@jax.jit
def run_const():
    call = make_call(True)
    def step(acc, _):
        return acc + call(si0, x)[:, 0, 0], None
    acc, _ = jax.lax.scan(step, jnp.zeros((C,), jnp.float32), None, length=K)
    return acc


@functools.partial(jax.jit, static_argnames=("dyn",))
def run_carry(dyn: bool):
    call = make_call(dyn)
    def step(carry, _):
        acc, si = carry
        out = call(si, x)[:, 0, 0]
        bump = (out > -jnp.inf).astype(jnp.int32)     # data-dep, always 1
        si2 = (si + 17 * bump[:, None]) % MOD
        return (acc + out, si2), None
    (acc, _), _ = jax.lax.scan(
        step, (jnp.zeros((C,), jnp.float32), si0), None, length=K)
    return acc


@jax.jit
def run_carry_noop():
    call = make_call(True)
    def step(carry, _):
        acc, si = carry
        out = call(si, x)[:, 0, 0]
        si2 = (si + 17) % MOD                          # NOT data-dependent
        return (acc + out, si2), None
    (acc, _), _ = jax.lax.scan(
        step, (jnp.zeros((C,), jnp.float32), si0), None, length=K)
    return acc


def bench(name, fn):
    np.asarray(fn())
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{name:12s} {best / K * 1e6:9.1f} us/call")


which = sys.argv[1:] or ["const", "carry_dyn", "carry_stat", "carry_noop"]
for w in which:
    if w == "const":
        bench(w, run_const)
    elif w == "carry_dyn":
        bench(w, functools.partial(run_carry, True))
    elif w == "carry_stat":
        bench(w, functools.partial(run_carry, False))
    elif w == "carry_noop":
        bench(w, run_carry_noop)
