"""Isolate which new-kernel feature stalls the axon remote compile:
run each probe as  python tools/probe_kernel.py <name>."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024


def probe_idxmap():
    """Scalar-prefetch-dependent BlockSpec index map on a [1, N] input."""
    def kern(si_ref, x_ref, o_ref):
        c = pl.program_id(0)
        j = pl.program_id(1)
        o_ref[0, 0, :] = jnp.zeros((128,), jnp.float32) + jnp.sum(x_ref[0, :])

    C, NT = 4, 3
    x = jnp.asarray(np.arange(16 * TILE, dtype=np.float32))[None, :]
    si = jnp.asarray(np.array([[0], [1024], [2048], [555]], np.int32))
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C, NT),
            in_specs=[pl.BlockSpec((1, TILE),
                                   lambda c, j, si: (0, si[c, 0] // TILE + j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, 128), lambda c, j, si: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((C, 1, 128), jnp.float32),
    )(si, x)
    print("idxmap ok", np.asarray(out)[:, 0, 0])


def probe_roll():
    """pltpu.roll on a [1, W] vmem slice."""
    W = 512

    def kern(x_ref, o_ref):
        big = x_ref[0, :, :]
        a = pltpu.roll(big, shift=1, axis=1)
        b = pltpu.roll(big, shift=big.shape[1] - 1, axis=1)
        o_ref[0, 0, :] = a[0, :128] + b[0, :128]

    x = jnp.asarray(np.arange(W + 256, dtype=np.float32))[None, None, :]
    out = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, 1, W + 256), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 128), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1, 128), jnp.float32),
    )(x)
    print("roll ok", np.asarray(out)[0, 0, :4])


def probe_stack16():
    """jnp.stack of 16 [TILE] vectors -> [16, TILE] bf16 matmul."""
    def kern(x_ref, o_ref):
        v = x_ref[0, :]
        rows = [v * float(k) for k in range(16)]
        m = jnp.stack(rows).astype(jnp.bfloat16)
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, 256), 1)
        col = (jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
               .reshape(TILE)) // 8
        oh = (w_iota == col[:, None]).astype(jnp.bfloat16)
        seg = jnp.dot(m, oh, preferred_element_type=jnp.float32)
        o_ref[0, :] = seg[3, :128]

    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, TILE)).astype(np.float32))
    out = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, TILE), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )(x)
    print("stack16 ok", np.asarray(out)[0, :3])


def probe_full():
    """The real kernel, one call, tiny grid."""
    from gnss_dsp_tpu.ops import pallas_track as ptk
    rng = np.random.default_rng(0)
    L = 1023
    cf = 1.023 / 4.096
    W = ptk.chip_window(cf)
    C, n = 2, 2050
    n_tiles = -(-n // ptk.TILE)
    code = rng.choice([-1, 1], (C, L)).astype(np.int8)
    code_rows = jnp.asarray(
        ptk.extend_code(code, W, int((n_tiles + 1) * ptk.TILE * cf) + 2))
    nchunk = (n_tiles + 3) * ptk.TILE
    xr = jnp.asarray(rng.standard_normal((1, nchunk)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((1, nchunk)).astype(np.float32))
    si = np.zeros((C, 9), np.int32)
    sf = np.zeros((C, 4), np.float32)
    si[:, 1] = 100; si[:, 0] = 99; si[:, 2] = 100
    sf[:, 0] = 0.95; sf[:, 2] = 0.05
    si[:, 3] = 1 << 18; si[:, 4] = n; si[:, 6] = 1 << 12
    si[:, 8] = [0, 777]
    sf[:, 3] = cf
    out = np.asarray(ptk.epl_correlate(
        jnp.asarray(si), jnp.asarray(sf), xr, xi, code_rows,
        n_tiles=n_tiles, W=W, sub="none"))
    print("full ok", out[:, :6].round(2))




def probe_idx_blk():
    """index map uses si already in BLOCK units, no arithmetic but +j."""
    def kern(si_ref, x_ref, o_ref):
        o_ref[0, 0, :] = jnp.zeros((128,), jnp.float32) + jnp.sum(x_ref[0, :])

    C, NT = 4, 3
    x = jnp.asarray(np.arange(16 * TILE, dtype=np.float32))[None, :]
    si = jnp.asarray(np.array([[0], [1], [2], [5]], np.int32))
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C, NT),
            in_specs=[pl.BlockSpec((1, TILE),
                                   lambda c, j, si: (0, si[c, 0] + j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, 128), lambda c, j, si: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((C, 1, 128), jnp.float32),
    )(si, x)
    print("idx_blk ok", np.asarray(out)[:, 0, 0])


def probe_idx_noj():
    """index map si only, 1-D grid, no +j."""
    def kern(si_ref, x_ref, o_ref):
        o_ref[0, 0, :] = jnp.zeros((128,), jnp.float32) + jnp.sum(x_ref[0, :])

    C = 4
    x = jnp.asarray(np.arange(16 * TILE, dtype=np.float32))[None, :]
    si = jnp.asarray(np.array([[0], [1], [2], [5]], np.int32))
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C,),
            in_specs=[pl.BlockSpec((1, TILE),
                                   lambda c, si: (0, si[c, 0]),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, 128), lambda c, si: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((C, 1, 128), jnp.float32),
    )(si, x)
    print("idx_noj ok", np.asarray(out)[:, 0, 0])




def probe_idx_compile():
    """Compile-only: does the hang happen at compile or at runtime?"""
    def kern(si_ref, x_ref, o_ref):
        o_ref[0, 0, :] = jnp.zeros((128,), jnp.float32) + jnp.sum(x_ref[0, :])

    C = 4
    x = jnp.asarray(np.arange(16 * TILE, dtype=np.float32))[None, :]
    si = jnp.asarray(np.array([[0], [1], [2], [5]], np.int32))
    f = jax.jit(lambda si, x: pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C,),
            in_specs=[pl.BlockSpec((1, TILE),
                                   lambda c, si: (0, si[c, 0]),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, 128), lambda c, si: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((C, 1, 128), jnp.float32),
    )(si, x))
    lowered = f.lower(si, x)
    print("lowered ok", time.time())
    compiled = lowered.compile()
    print("compiled ok", time.time())
    out = compiled(si, x)
    print("dispatched ok")
    print("readback:", np.asarray(out)[:, 0, 0])


if __name__ == "__main__":
    t0 = time.time()
    globals()["probe_" + sys.argv[1]]()
    print(f"{sys.argv[1]}: {time.time()-t0:.1f}s")
