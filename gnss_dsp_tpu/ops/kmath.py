"""In-kernel math helpers for Pallas TPU: f32 atan / atan2.

Mosaic's TPU lowering has no `atan` primitive, so the fused tracking
kernel's discriminators (ops/discriminators.py semantics) evaluate a
Cephes-style minimax polynomial with two-stage range reduction
(|t| <= tan(pi/8) after folding), accurate to ~1-2 ulp f32 — close
enough that loop-filter trajectories match the XLA engine within the
equality-test tolerances (tests/test_fused_scan.py).

Works on any jnp array shape (vectors in-kernel) and in interpret mode.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_PI = np.float32(np.pi)
_PI_2 = np.float32(np.pi / 2)
_PI_4 = np.float32(np.pi / 4)
_TAN_3PI_8 = np.float32(2.414213562373095)
_TAN_PI_8 = np.float32(0.4142135623730950)


def atan(z):
    """f32 arctangent (Cephes atanf reduction + degree-9 odd minimax)."""
    sign = jnp.where(z < 0, jnp.float32(-1.0), jnp.float32(1.0))
    a = jnp.abs(z)
    big = a > _TAN_3PI_8
    mid = a > _TAN_PI_8
    x = jnp.where(big, -1.0 / jnp.where(a == 0, 1.0, a),
                  jnp.where(mid, (a - 1.0) / (a + 1.0), a))
    bias = jnp.where(big, _PI_2, jnp.where(mid, _PI_4, jnp.float32(0.0)))
    zz = x * x
    p = ((((jnp.float32(8.05374449538e-2) * zz
            - jnp.float32(1.38776856032e-1)) * zz
           + jnp.float32(1.99777106478e-1)) * zz
          - jnp.float32(3.33329491539e-1)) * zz * x + x)
    return sign * (bias + p)


def atan2(y, x):
    """f32 four-quadrant arctangent; atan2(0, 0) == 0 like XLA."""
    both0 = jnp.logical_and(x == 0, y == 0)
    q = y / jnp.where(both0, jnp.float32(1.0), x)
    a = atan(q)
    return jnp.where(x < 0, jnp.where(y >= 0, a + _PI, a - _PI), a)
