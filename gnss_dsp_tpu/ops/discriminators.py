"""Carrier-loop discriminators, branchless for use inside jit/scan.

Behavioral contract: gnsstools/discriminator.py:3-27.  The reference
versions are scalar Python with data-dependent branches; these are
jnp-vectorized and batched over channels.
"""

from __future__ import annotations

import jax.numpy as jnp


def pll_costas(x):
    """Costas (sign-insensitive) phase discriminator, radians in (-pi/2, pi/2].

    reference: discriminator.py:3-7 — atan2 of x flipped into the right
    half-plane.  Branchless: negate x when Re(x) <= 0.
    """
    flip = jnp.where(jnp.real(x) > 0, 1.0, -1.0).astype(jnp.float32)
    return jnp.arctan2(flip * jnp.imag(x), flip * jnp.real(x))


def fll_atan(x, x1):
    """Single-channel FLL discriminator with half-plane unwrap.

    reference: discriminator.py:9-23 — t = atan(Im/Re) per block (pi/2 when
    Re==0), d = t - t1 folded into [-pi/2, pi/2].
    """
    # NB: reference uses atan(Im/Re), which lands in (-pi/2, pi/2)
    def ref_atan(z):
        re, im = jnp.real(z), jnp.imag(z)
        safe_re = jnp.where(re == 0, 1.0, re)
        t = jnp.arctan(im / safe_re)
        return jnp.where(re == 0, jnp.pi / 2, t)

    d = ref_atan(x) - ref_atan(x1)
    d = jnp.where(d > jnp.pi / 2, jnp.pi - d, d)
    d = jnp.where(d < -jnp.pi / 2, -jnp.pi - d, d)
    return d


def fll_atan2(a, b):
    """Four-quadrant FLL discriminator (reference: discriminator.py:25-27):
    angle of a·conj(b)."""
    cross = jnp.imag(a) * jnp.real(b) - jnp.real(a) * jnp.imag(b)
    dot = jnp.real(a) * jnp.real(b) + jnp.imag(a) * jnp.imag(b)
    return jnp.arctan2(cross, dot)
