"""Carrier-loop discriminators, branchless, split-complex inputs.

Behavioral contract: gnsstools/discriminator.py:3-27.  The reference
versions are scalar Python with data-dependent branches; these are
jnp-vectorized (batched over channels) and take (re, im) pairs.
"""

from __future__ import annotations

import jax.numpy as jnp


def pll_costas(x):
    """Costas (sign-insensitive) phase discriminator, radians in (-pi/2, pi/2].

    reference: discriminator.py:3-7 — atan2 of x flipped into the right
    half-plane.  Branchless: negate x when Re(x) <= 0."""
    re, im = x
    flip = jnp.where(re > 0, 1.0, -1.0).astype(jnp.float32)
    return jnp.arctan2(flip * im, flip * re)


def _ref_atan(x):
    """atan(Im/Re) in (-pi/2, pi/2), pi/2 when Re==0 (discriminator.py:10-18)."""
    re, im = x
    safe_re = jnp.where(re == 0, 1.0, re)
    t = jnp.arctan(im / safe_re)
    return jnp.where(re == 0, jnp.pi / 2, t)


def fll_atan(x, x1):
    """Single-channel FLL discriminator with half-plane unwrap
    (discriminator.py:9-23)."""
    d = _ref_atan(x) - _ref_atan(x1)
    d = jnp.where(d > jnp.pi / 2, jnp.pi - d, d)
    d = jnp.where(d < -jnp.pi / 2, -jnp.pi - d, d)
    return d


def fll_atan2(a, b):
    """Four-quadrant FLL discriminator (discriminator.py:25-27): angle of
    a*conj(b)."""
    ar, ai = a
    br, bi = b
    return jnp.arctan2(ai * br - ar * bi, ar * br + ai * bi)
